"""Notification sink (SURVEY.md §2.5 K4) + count reconciliation (A3).

The reference publishes an SNS email per finished run
(``postprocess/lambda_function.py:101-160``) whose subject encodes
state and warning flag; reconciliation compares the plan's
``ExpectedAmountOfRecords`` with the ledger's measured
``GlueAmountOfRecords`` (``postprocess/lambda_function.py:76-98``) with
tri-state semantics:

* ``skipped``  — expected is blank (``" "``), comparison not performed
* ``ok``       — counts equal
* ``mismatch`` — counts differ → notification subject gains
  `` WITH WARNING`` (not a failure)

Locally the sink is a structured JSONL log with the same subject
format, so tests can assert on the exact strings.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

RECONCILE_SKIPPED = "skipped"
RECONCILE_OK = "ok"
RECONCILE_MISMATCH = "mismatch"


def reconcile_counts(expected: Any, actual: Any) -> str:
    """Tri-state reconciliation (``postprocess/lambda_function.py:76-98``).

    ``actual is None`` means counting was disabled
    (``count_strategy='none'``) — an UNMEASURED count is ``skipped``,
    not a mismatch warning on an otherwise-successful run.
    """
    if expected in (" ", "", None):
        return RECONCILE_SKIPPED
    if actual is None:
        return RECONCILE_SKIPPED
    try:
        exp = int(expected)
        act = int(actual)
    except (TypeError, ValueError):
        return RECONCILE_MISMATCH
    return RECONCILE_OK if exp == act else RECONCILE_MISMATCH


@dataclass
class Notification:
    subject: str
    body: dict[str, Any]


def build_notification(
    state: str,
    source_name: str,
    source_table: str,
    migration_part: Any,
    reconcile_status: str,
    run_details: dict[str, Any],
) -> Notification:
    """Subject format parity:
    ``[Historical Extraction] - {state} WITH WARNING - {src} {tbl}
    Migration Part {p}`` — no brackets around the warning flag, and the
    SNS 100-char subject limit reproduced as ``[:99]``
    (``postprocess/lambda_function.py:104-156``)."""
    warning = " WITH WARNING" if reconcile_status == RECONCILE_MISMATCH else ""
    subject = (
        f"[Historical Extraction] - {state}{warning} - "
        f"{source_name} {source_table} Migration Part {migration_part}"
    )[:99]
    body = {"reconcile_status": reconcile_status, **run_details}
    return Notification(subject=subject, body=body)


class NotificationLog:
    """JSONL notification sink."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        # concurrent plan dispatch publishes from N threads; a body
        # larger than the stdio buffer would otherwise tear across
        # interleaved write() calls and corrupt the JSONL log
        self._lock = threading.Lock()

    def publish(self, notification: Notification) -> None:
        rec = {
            "ts": datetime.now(timezone.utc).isoformat(),
            "subject": notification.subject,
            "body": notification.body,
        }
        with self._lock, self.path.open("a", encoding="utf-8") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def entries(self) -> list[dict[str, Any]]:
        if not self.path.exists():
            return []
        return [json.loads(x) for x in self.path.read_text().splitlines() if x.strip()]
