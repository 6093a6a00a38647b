"""Dependency-free utilities shared across the control plane and the
operators (extracted from ``orchestrator`` so ``operators.maintenance``
no longer needs a function-body import to dodge a module cycle)."""

from __future__ import annotations

__all__ = ["with_retry"]


def with_retry(
    fn,
    attempts: int = 3,
    backoff_s: float = 0.0,
    retryable=(Exception,),
    backoff: str = "exp",
    tolerate: tuple[str, ...] = (),
    on_exhausted: str = "raise",
):
    """Retry policy parity with the reference's two retriers:

    * state-machine Lambda retrier — 2 retries, backoff ×2
      (``this.json:196-207``): the defaults (``backoff="exp"``);
    * partition-index creation — 5 attempts, LINEAR backoff
      (``sleep(attempt*10)``), ``AlreadyExistsException`` tolerated as
      success, exhaustion logged-not-raised
      (``postprocess/lambda_function.py:198-221``): ``backoff="linear"``
      + ``tolerate=("AlreadyExists",)`` + ``on_exhausted="swallow"``.

    ``tolerate`` substrings matched against ``str(e)`` end the retry
    loop immediately and return ``None`` (the operation already
    happened).  Deterministic work only: callers must ensure ``fn`` is
    idempotent (the engine's dedup gate + append-only sink make a
    re-run of a failed job safe).
    """
    import time as _time

    if attempts < 1:
        raise ValueError(f"with_retry: attempts must be >= 1, got {attempts}")
    last = None
    for attempt in range(attempts):
        try:
            return fn()
        except retryable as e:  # noqa: PERF203
            if any(t in str(e) for t in tolerate):
                return None
            last = e
            if attempt < attempts - 1 and backoff_s:
                mult = (attempt + 1) if backoff == "linear" else 2**attempt
                _time.sleep(backoff_s * mult)
    if on_exhausted == "swallow":
        return None
    raise last
