"""Execution ledger (SURVEY.md §2.5 K3) — the DynamoDB
``migration_details`` table re-expressed as a local append-only event
log with last-write-wins materialization.

Keyed ``(ExecutionHashId, SourceTable)`` like the reference
(``template2.yaml:527-544``); attribute names match
``routing/lambda_function.py:129-139`` and the extractor/state-machine
updates (``sybaseiq_extractor.py:264-273,300-309,342-353``,
``this.json:46-68,152-177,261-286``).

Implementation: one JSON line per put/update event (driver-side — ledger
volume is rows-per-run, not rows-per-record, so this never needs to be
distributed even at 100 TB), with ``current_state()`` folding events to
the latest value per key, and ``to_spark_df`` exposing the log as a
queryable DataFrame.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: lifecycle attributes initialized to None at run creation
#: (routing/lambda_function.py:129-139)
LIFECYCLE_FIELDS = [
    "LambdaCallTimestamp",
    "StateMachineExecutionArn",
    "StateMachineStartTimestamp",
    "GlueJobRunId",
    "GlueJobStartTimestamp",
    "GlueAmountOfRecords",
    "GlueFinalTableSchema",
    "GlueJobEndTimestamp",
    "GlueJobFinalStatus",
    "ErrorMessage",
    "ExecutionTime",
]

TERMINAL_STATUSES = {"SUCCEEDED", "FAILED", "ERROR", "TIMEOUT", "STOPPED"}


def utc_now_str() -> str:
    """Timestamp format used throughout the reference ledger
    (``%Y-%m-%d %H:%M:%S``, e.g. routing/lambda_function.py:132)."""
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


class Ledger:
    """Append-only run-metadata ledger."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        # re-entrant: claim_run folds state and appends under ONE
        # critical section, and the append path re-acquires
        self._lock = threading.RLock()

    def _append(self, event: dict[str, Any]) -> None:
        event = dict(event)
        event["_event_ts"] = datetime.now(timezone.utc).isoformat()
        with self._lock, self.path.open("a", encoding="utf-8") as f:
            f.write(json.dumps(event, default=str) + "\n")

    # ---- write API ------------------------------------------------------

    def put_item(self, item: dict[str, Any]) -> None:
        """Full-row put (reference ``table.put_item``)."""
        if "ExecutionHashId" not in item or "SourceTable" not in item:
            raise KeyError("ledger items need ExecutionHashId and SourceTable")
        self._append({"_op": "put", **item})

    def create_run(self, job_meta: dict[str, Any]) -> None:
        """Initial row with null lifecycle fields
        (``routing/lambda_function.py:124-147``)."""
        item = dict(job_meta)
        item.setdefault("LambdaCallTimestamp", utc_now_str())
        for f in LIFECYCLE_FIELDS:
            item.setdefault(f, None)
        self.put_item(item)

    def update_item(self, execution_hash_id: str, source_table: str, **attrs: Any) -> None:
        """Partial update (reference ``table.update_item``)."""
        self._append(
            {
                "_op": "update",
                "ExecutionHashId": execution_hash_id,
                "SourceTable": source_table,
                **attrs,
            }
        )

    def record_iterations(
        self,
        operator: str,
        rounds: int,
        max_rounds: int,
        converged: bool,
        deltas: list[Any],
        run_key: str | None = None,
    ) -> None:
        """Observability row for iterative operators (connected
        components, PageRank): round count + per-round convergence
        deltas, so an unattended run surfaces non-convergence in the
        same ledger the run lifecycle lives in.  ``GlueJobFinalStatus``
        carries the verdict so :meth:`final_status` monitoring works
        unchanged (VERDICT r4 watch-item)."""
        self.put_item(
            {
                "ExecutionHashId": run_key or f"iterative-{operator}",
                "SourceTable": "_iterative_ops",
                "Operator": operator,
                "Rounds": rounds,
                "MaxRounds": max_rounds,
                "Converged": converged,
                "ConvergenceDeltas": [str(d) for d in deltas],
                "GlueJobFinalStatus": "SUCCEEDED" if converged else "FAILED",
            }
        )

    def claim_run(self, job_meta: dict[str, Any]) -> bool:
        """Atomic dedup-gate + :meth:`create_run` — the reference's
        DynamoDB conditional-put analog (``routing/lambda_function.py:
        78-147`` checks then writes; DynamoDB's single-writer key makes
        that safe, so a concurrent dispatcher here needs the check and
        the create under ONE lock or two threads both pass the gate).

        Returns ``True`` and writes the initial row iff the
        ``(ExecutionHashId, SourceTable)`` key is absent or in a
        retryable state; ``False`` when a prior run is still running
        (status unset) or SUCCEEDED — same skip rule as the gate.
        The lock is in-process: the queue/ledger tier is one
        orchestrator process by design (one routing Lambda per plan in
        the reference); cross-process data-plane writers arbitrate at
        the lakehouse OCC layer instead."""
        hash_id = job_meta["ExecutionHashId"]
        table = job_meta["SourceTable"]
        with self._lock:
            item = self.get(hash_id, table)
            if item is not None and item.get("GlueJobFinalStatus") in (
                None,
                "",
                "SUCCEEDED",
            ):
                return False
            self.create_run(job_meta)
            return True

    def record_skip(self, source_table: str, hash_id: str, job: dict[str, Any]) -> None:
        """Dedup-gate marker row
        (``routing/lambda_function.py:93-99``)."""
        self.put_item(
            {
                "ExecutionHashId": f"JobHasRunOrIsRunning-{source_table}-{hash_id}",
                "SourceTable": source_table,
                "TriedToRunJob": job,
            }
        )

    # ---- read API -------------------------------------------------------

    def events(self) -> list[dict[str, Any]]:
        if not self.path.exists():
            return []
        out = []
        with self.path.open(encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def current_state(self) -> dict[tuple[str, str], dict[str, Any]]:
        """Fold the event log: put replaces, update merges."""
        state: dict[tuple[str, str], dict[str, Any]] = {}
        for ev in self.events():
            key = (ev.get("ExecutionHashId"), ev.get("SourceTable"))
            op = ev.pop("_op", "put")
            ev.pop("_event_ts", None)
            if op == "put" or key not in state:
                state[key] = ev
            else:
                state[key].update(ev)
        return state

    def get(self, execution_hash_id: str, source_table: str) -> dict[str, Any] | None:
        return self.current_state().get((execution_hash_id, source_table))

    def final_status(self, execution_hash_id: str, source_table: str) -> str | None:
        item = self.get(execution_hash_id, source_table)
        return item.get("GlueJobFinalStatus") if item else None

    def to_spark_df(self, spark: SparkSession) -> DataFrame:
        """Expose the raw event log to Spark (schema inferred; metadata
        scale only)."""
        return spark.read.json(str(self.path))
