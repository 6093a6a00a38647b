"""Plan orchestration (SURVEY.md §2.6 C1-C5, §7 M3).

The reference spreads control flow across a routing Lambda, a Step
Functions state machine, and a postprocess Lambda; in one process it
collapses to plain Python around DataFrame actions (SURVEY.md §3,
"idiomatic collapse"):

* **queue dirs** — ``run_now/``, ``run_on_schedule_{N}/``,
  ``succeeded/``, ``failed/`` local directories mirroring the S3
  prefix-per-state workflow (reference
  ``MigrationPlans/sybaseiq/migrationplans/*``, ``README.md:10``).
* **dispatch router (C1)** — classify an invocation: explicit plan
  payload vs queue-file event vs schedule scan (reference
  ``routing/lambda_function.py:150-213``).
* **dedup gate (C2)** — md5 ``ExecutionHashId`` checked against the
  ledger; skipped attempts recorded as ``JobHasRunOrIsRunning-…`` rows
  (reference ``routing/lambda_function.py:78-111``).
* **sequential chains (C3)** — the reference's recursive Jobs[0]
  hoisting becomes a ``for`` loop; a failed part still lets the chain
  continue (reference ``this.json:287-319``).
* **run-state machine (C4)** — ledger status transitions + failure
  routing are inside ``Engine.run_job``; the orchestrator adds the
  plan-file lifecycle move (K5, reference
  ``postprocess/lambda_function.py:21-72``).
* **scheduler (C5)** — ``run_schedule(n)`` scans
  ``run_on_schedule_{n}/`` exactly like the EventBridge-triggered
  prefix scan (reference ``routing/lambda_function.py:176-189``,
  skipping keys containing ``done`` / non-``.json`` — the documented
  behavior, not the buggy prefix constant at ``:178``).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from .engine import Engine, RunResult
from .plans.model import ExtractionPlan
from .util import with_retry  # noqa: F401 -- re-exported; historical home

QUEUE_RUN_NOW = "run_now"
QUEUE_SUCCEEDED = "succeeded"
QUEUE_FAILED = "failed"


@dataclass
class PlanOutcome:
    plan_file: str | None
    results: list[RunResult] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)  # hash ids skipped by dedup gate
    moved_to: str | None = None
    parse_error: str | None = None  # set when the plan file itself was malformed

    @property
    def succeeded(self) -> bool:
        if self.parse_error is not None:
            return False
        return all(r.status == "SUCCEEDED" for r in self.results) and bool(
            self.results or self.skipped
        )


class Orchestrator:
    """Queue-directory driven plan runner around an :class:`Engine`.

    ``max_concurrent_runs`` (C7 at the orchestrator level): the
    reference's Glue job allows up to 50 concurrent extractions
    (``template2.yaml:641`` MaxConcurrentRuns); here a queue scan
    dispatches plan files over a bounded thread pool, each plan under
    its own FAIR scheduler pool (``spark.scheduler.pool`` is an
    inheritable thread-local, so every job a plan submits lands in its
    pool; set ``spark.scheduler.mode=FAIR`` on the session for true
    fair sharing — under default FIFO the property is inert but
    harmless).  Safety under concurrency: the dedup gate is the
    ledger's atomic :meth:`~..sinks.ledger.Ledger.claim_run`
    (check+create in one critical section), ledger/notification
    appends are lock-serialized, per-file lifecycle moves are
    idempotent, ACID-mode writes arbitrate at the lakehouse OCC
    layer, and non-ACID writes to the SAME target table serialize on
    the ENGINE's per-table sink lock (concurrent Spark jobs appending
    one parquet dir share a FileOutputCommitter staging dir — unsafe
    by construction; the lock wraps only the write, so reads and
    transforms — and different tables — run fully parallel)."""

    def __init__(
        self,
        engine: Engine,
        queue_root: str | Path,
        max_concurrent_runs: int = 1,
    ):
        self.engine = engine
        self.queue_root = Path(queue_root)
        self.max_concurrent_runs = max(1, int(max_concurrent_runs))
        for d in (QUEUE_RUN_NOW, QUEUE_SUCCEEDED, QUEUE_FAILED):
            (self.queue_root / d).mkdir(parents=True, exist_ok=True)

    # ---- C2: dedup gate — Ledger.claim_run (atomic check+create):
    # skip on SUCCEEDED or a row whose status is unset (still
    # running); FAILED runs are retryable
    # (``routing/lambda_function.py:84-92``).

    # ---- C3/C4: plan execution ------------------------------------------

    def run_plan(self, plan: ExtractionPlan) -> PlanOutcome:
        """Run every job of a plan in order (sequential chain = loop).

        Parity points: inactive plans are dropped at intake; each part
        passes the dedup gate independently (skips recorded in the
        ledger); a failed part does NOT stop later parts (reference
        chains continue past failures, ``this.json:287-319``).
        """
        outcome = PlanOutcome(plan_file=plan.origin_file)
        if not plan.active:
            return outcome
        problems = plan.validate()
        if problems:
            # fail fast with the curated messages instead of letting an
            # empty Query / missing JDBC bounds surface as an opaque
            # engine error three layers down (the validate() layer was
            # otherwise dead code — r5 review finding)
            outcome.parse_error = "; ".join(problems)
            return outcome
        for job in plan.jobs:
            hash_id = job.execution_hash_id
            ledger = self.engine.ledger
            if ledger:
                # atomic check+create: under concurrent dispatch two
                # copies of a plan must not both pass the gate (the
                # separate _already_run + create_run pair has a window)
                claimed = ledger.claim_run(
                    {
                        "ExecutionHashId": hash_id,
                        "SourceTable": job.source_table,
                        "MigrationPart": job.migration_part,
                        "Query": job.query,
                        "ExpectedAmountOfRecords": job.expected_amount_of_records,
                    }
                )
                if not claimed:
                    outcome.skipped.append(hash_id)
                    ledger.record_skip(
                        job.source_table, hash_id, {"Query": job.query}
                    )
                    continue
            # concurrent same-table safety lives in the ENGINE: ACID
            # writes arbitrate at the lakehouse OCC layer; non-ACID
            # writes serialize on Engine._sink_lock around the write
            # only — so direct run_job callers are protected too
            outcome.results.append(self.engine.run_job(job))
        return outcome

    # ---- K5: plan-file lifecycle ----------------------------------------

    def _move_plan_file(self, path: Path, dest_dir: str) -> str | None:
        """Move a finished plan file to ``succeeded/``/``failed/``
        (idempotent: a file already moved is tolerated — reference
        swallows the repeat-copy error, ``postprocess:45-57``)."""
        dest = self.queue_root / dest_dir / path.name
        try:
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(path), str(dest))
            return str(dest)
        except FileNotFoundError:
            return str(dest) if dest.exists() else None

    def run_plan_file(self, path: str | Path) -> PlanOutcome:
        path = Path(path)
        try:
            plan = ExtractionPlan.from_file(path)
        except Exception as e:
            # A malformed plan file (invalid JSON, missing/garbage
            # fields) must not wedge the queue: route it to failed/
            # like the reference routes bad plans to the failed state,
            # and let the scan continue with the remaining files.
            outcome = PlanOutcome(plan_file=str(path))
            outcome.moved_to = self._move_plan_file(path, QUEUE_FAILED)
            outcome.parse_error = f"{type(e).__name__}: {e}"
            return outcome
        outcome = self.run_plan(plan)
        if plan.active:
            dest = QUEUE_SUCCEEDED if outcome.succeeded else QUEUE_FAILED
            outcome.moved_to = self._move_plan_file(path, dest)
        return outcome

    # ---- C1: dispatch router --------------------------------------------

    def dispatch(self, event: dict[str, Any]) -> list[PlanOutcome]:
        """Classify and route an invocation (reference
        ``routing/lambda_function.py:150-213``):

        * ``{"plan": {...}}``      — inline plan payload (SFN-callback analog)
        * ``{"plan_file": "..."}`` — queue-file event (S3 ObjectCreated analog)
        * ``{"schedule_number": N}`` — schedule scan (EventBridge analog)
        * anything else            — drain ``run_now/``
        """
        if "plan" in event:
            return [self.run_plan(ExtractionPlan.from_dict(event["plan"]))]
        if "plan_file" in event:
            return [self.run_plan_file(event["plan_file"])]
        if "schedule_number" in event:
            return self.run_schedule(int(event["schedule_number"]))
        return self.run_now()

    # ---- C5: queue scans -------------------------------------------------

    def _scan_queue(self, subdir: str) -> list[PlanOutcome]:
        """Scan a queue dir for pending ``.json`` plans, skipping names
        containing ``done`` (reference ``routing:183-188``).  With
        ``max_concurrent_runs > 1`` the pending files dispatch over a
        bounded thread pool (outcome order still follows file order);
        each plan's Spark jobs run under a per-plan FAIR pool."""
        d = self.queue_root / subdir
        if not d.exists():
            return []
        files = [
            p for p in sorted(d.glob("*.json")) if "done" not in p.name
        ]
        return self.run_pooled(
            [(p.stem, lambda p=p: self.run_plan_file(p)) for p in files]
        )

    def run_pooled(self, tasks) -> list[PlanOutcome]:
        """Dispatch ``(label, thunk)`` pairs over the bounded pool —
        the ONE concurrency surface shared by every intake path (queue
        scans, the streaming ``run_now`` watcher), so
        ``max_concurrent_runs`` and the per-plan FAIR scheduler pool
        apply uniformly.  Outcome order follows task order.  Safety is
        the same stack as :meth:`run_plan` documents: ``claim_run``
        dedup, lock-serialized ledger appends, engine sink locks /
        lakehouse OCC."""
        if self.max_concurrent_runs <= 1 or len(tasks) <= 1:
            return [fn() for _, fn in tasks]
        from concurrent.futures import ThreadPoolExecutor

        sc = self.engine.spark.sparkContext

        def run_one(task) -> PlanOutcome:
            label, fn = task
            # inheritable thread-local: every action this plan runs
            # schedules in its own pool until cleared
            sc.setLocalProperty("spark.scheduler.pool", f"plan-{label}")
            try:
                return fn()
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)

        with ThreadPoolExecutor(
            max_workers=self.max_concurrent_runs,
            thread_name_prefix="plan-dispatch",
        ) as ex:
            return list(ex.map(run_one, tasks))

    def run_now(self) -> list[PlanOutcome]:
        return self._scan_queue(QUEUE_RUN_NOW)

    def run_schedule(self, n: int) -> list[PlanOutcome]:
        return self._scan_queue(f"run_on_schedule_{n}")


