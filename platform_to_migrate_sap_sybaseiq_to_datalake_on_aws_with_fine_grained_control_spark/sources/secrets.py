"""Secrets source (SURVEY.md §2.1 S5).

The reference pulls a ``{"user": ..., "password": ...}`` JSON document
from AWS Secrets Manager, handling both the string and base64-binary
payload forms (``sybaseiq_extractor.py:58-95``).  The engine's local
analog resolves a secret reference from, in order:

1. an environment variable named by the reference,
2. a JSON file path (the ``file://`` scheme),
3. an inline JSON document (starts with ``{``),

and applies the same string-vs-base64 tolerance: if the raw payload is
not valid JSON, it is retried base64-decoded (the reference's
``SecretBinary`` branch).
"""

from __future__ import annotations

import base64
import json
import os
from pathlib import Path


class SecretNotFound(KeyError):
    pass


def _parse_payload(raw: str | bytes) -> dict:
    """JSON first; base64-wrapped JSON second (reference
    ``get_secret_value_response['SecretBinary']`` branch)."""
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", errors="strict")
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        decoded = base64.b64decode(raw)
        return json.loads(decoded)


def get_secret(ref: str) -> dict:
    """Resolve ``ref`` to the credential dict.

    ``ref`` may be an env-var name, ``file://path``, or inline JSON.
    Raises :class:`SecretNotFound` when nothing resolves — the same
    fail-the-job behavior the reference has on Secrets Manager errors.
    """
    if ref.startswith("{"):
        return _parse_payload(ref)
    if ref.startswith("file://"):
        p = Path(ref[len("file://") :])
        if not p.exists():
            raise SecretNotFound(ref)
        return _parse_payload(p.read_bytes())
    val = os.environ.get(ref)
    if val is None:
        raise SecretNotFound(ref)
    return _parse_payload(val)


def get_credentials(ref: str) -> tuple[str, str]:
    """``(user, password)`` — the two keys the JDBC scan needs
    (``sybaseiq_extractor.py:276,287-288``)."""
    d = get_secret(ref)
    return d["user"], d["password"]
