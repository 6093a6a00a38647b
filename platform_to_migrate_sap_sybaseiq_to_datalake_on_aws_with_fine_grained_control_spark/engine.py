"""End-to-end plan execution (SURVEY.md §3 "idiomatic collapse").

One ``run_job`` call performs what the reference spreads across
Lambda → Step Functions → Glue → Lambda:

    resolve sources → rewrite + run Query (Spark SQL) → count →
    cleaning pipeline → partitioned parquet + catalog sink →
    ledger updates → reconciliation → notification.

Scale notes (100 TB):

* ``count_strategy="cache"`` reproduces the reference's
  ``cache(); count()`` (``sybaseiq_extractor.py:295-297``) — fine when
  the extract fits the cluster's storage memory.
  ``count_strategy="observe"`` (default) attaches a Spark ``observe``
  metric to the write so the row count is collected as a side effect of
  the single write pass — no second scan, no cache pressure; this is
  the write-then-count variant SURVEY.md §4 recommends at scale.
* The plan's ``NumPartitions``/bounds become a ranged, range-
  partitioned scan only when requested; otherwise parallelism is left
  to the file scan + AQE.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .operators.cleaning import clean_pipeline, schema_tree_string
from .operators.layout import apply_output_sizing
from .plans.dialect import to_spark_sql
from .plans.model import ExtractionJob
from .sinks.ledger import Ledger, utc_now_str
from .sinks.notify import (
    NotificationLog,
    build_notification,
    reconcile_counts,
)
from .sinks.parquet_sink import SinkResult, write_partitioned_parquet
from .sources.registry import SourceRegistry


@dataclass
class RunResult:
    execution_hash_id: str
    source_table: str
    status: str
    row_count: int | None
    reconcile_status: str | None
    sink: SinkResult | None
    final_schema: str | None
    execution_time_s: float
    error: str | None = None
    details: dict[str, Any] = field(default_factory=dict)


@dataclass
class EngineConfig:
    target_root: str
    target_database: str = "datalake"
    count_strategy: str = "observe"  # "observe" | "cache" | "none"
    # "tiered" (reference-parity 8/16/24 file counts) needs the PRE-write
    # row count, so it only takes effect with count_strategy="cache";
    # under "observe" the sizing is always adaptive (AQE coalesce).
    output_sizing: str = "adaptive"  # "adaptive" | "tiered"
    sink_mode: str = "append"
    register_catalog: bool = True
    # K6 post-write maintenance (ANALYZE with the reference's
    # partition-index retry semantics); off by default — stats refresh
    # is a policy choice, not part of the write path.
    post_write_analyze: bool = False
    # drift-tolerant appends: align each batch to the widened merge of
    # the dataset's schema (operators/schema_evolution.py) before the
    # write; off by default to preserve the reference's strict contract.
    evolve_schema: bool = False
    # ACID sink: route the K1 write through the manifest-commit
    # transaction log (lakehouse.py) — atomic visibility, snapshot
    # isolation, time travel, O(delta) change feeds.  Reads go through
    # lakehouse.snapshot(); Hive-metastore registration is skipped in
    # this mode (a path-registered metastore table would list the
    # directory and see unreferenced pre-vacuum files — correct shared-
    # metastore reads need a reader-integrated table format, which is
    # exactly what the log implements for lakehouse.snapshot readers).
    acid: bool = False
    # acid-mode small-file policy: after each append, partition dirs
    # holding MORE than this many live files are compacted in one
    # scoped dataChange=false commit (0/None = no auto-OPTIMIZE).
    acid_autocompact_files: int | None = None


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        registry: SourceRegistry,
        config: EngineConfig,
        ledger: Ledger | None = None,
        notifications: NotificationLog | None = None,
    ):
        self.spark = spark
        self.registry = registry
        self.config = config
        self.ledger = ledger
        self.notifications = notifications
        # per-target serialization for the NON-ACID sink: two threads
        # appending the same parquet dir share one FileOutputCommitter
        # _temporary/ staging dir — the first commit deletes it under
        # the second job (silent row loss).  Held only around the
        # write (reads/transforms stay parallel); ACID writes skip it
        # — the transaction log's OCC is the arbitration.  Lives HERE,
        # not in the orchestrator, so every direct run_job caller is
        # protected too.
        import threading as _threading

        self._sink_locks: dict[str, _threading.Lock] = {}
        self._sink_locks_guard = _threading.Lock()

    def _sink_lock(self, path_suffix: str):
        import posixpath
        import threading as _threading

        # normalize before keying: 'a/b', 'a/b/' and './a/b' address
        # the same physical directory and must share ONE lock — two
        # differently-spelled suffixes with distinct locks would bypass
        # the FileOutputCommitter serialization this exists to provide
        key = posixpath.normpath(path_suffix.strip()) if path_suffix else ""
        with self._sink_locks_guard:
            return self._sink_locks.setdefault(key, _threading.Lock())

    # ------------------------------------------------------------------

    def build_query_df(self, job: ExtractionJob) -> DataFrame:
        """S1/S2/P1 — resolve sources, rewrite dialect, run the Query.

        JDBC path (S1/S2): when the job carries a connection string and
        the registry has JDBC enabled, the Query ships verbatim to the
        source engine (source dialect, exactly like the reference) as a
        partitioned or single-connection read.  Parquet path otherwise:
        register views, rewrite the dialect, run natively.
        """
        if job.jdbc_connection_string and self.registry.jdbc_enabled:
            from .sources.secrets import get_credentials

            user, password = (
                get_credentials(job.credentials_secret_arn)
                if job.credentials_secret_arn
                else ("", "")
            )
            return self.registry.jdbc_scan(
                url=job.jdbc_connection_string,
                query=job.query,
                user=user,
                password=password,
                partition_column=job.column_for_partitioning_on_spark,
                lower_bound=job.lower_bound,
                upper_bound=job.upper_bound,
                num_partitions=job.num_partitions,
            )
        table_map = self.registry.register_views_for_query()
        if job.source_table not in table_map and self.registry.resolve_path(job.source_table):
            table_map.update(self.registry.register_views_for_query([job.source_table]))
        sql = to_spark_sql(
            job.query,
            table_map,
            known_prefixes={(job.source_database, job.source_schema)},
        )
        df = self.spark.sql(sql)
        if job.partitioned_scan and job.num_partitions > 1:
            # Reproduce the compute-partition spec natively only when the
            # partition column survived the projection; the range filter
            # semantics already live inside the Query's WHERE clause.
            col = job.column_for_partitioning_on_spark
            norm = {c.lower(): c for c in df.columns}
            actual = norm.get(str(col).strip().lower())
            if actual:
                df = df.repartitionByRange(job.num_partitions, F.col(actual))
        return df

    def validate_job(self, job: ExtractionJob) -> dict[str, Any]:
        """Dry-run / EXPLAIN mode: resolve sources, rewrite the dialect,
        build the FULL cleaned plan, and report schema + physical plan +
        partitioning facts without executing a write, count, or cache —
        Catalyst plans (and therefore validates) the query, but no job
        runs. The pre-flight check a plan author runs before queueing
        an extraction against a 100 TB source: catches unresolved
        tables/columns, dialect rewrite failures, and a partition
        column that did not survive the Query's projection, at
        planning cost only.
        """
        import io
        from contextlib import redirect_stdout

        out: dict[str, Any] = {
            "execution_hash_id": job.execution_hash_id,
            "source_table": job.source_table,
            "status": "VALID",
            "issues": [],
        }
        try:
            df = self.build_query_df(job)
            cleaned, partition_keys = clean_pipeline(
                df,
                execution_hash_id=job.execution_hash_id,
                load_timestamp=datetime.now(timezone.utc).replace(tzinfo=None),
                partition_column=(
                    job.column_for_partitioning_on_s3
                    if job.partitioned_sink
                    else None
                ),
            )
            buf = io.StringIO()
            with redirect_stdout(buf):
                cleaned.explain("formatted")
            out["schema"] = schema_tree_string(cleaned)
            out["partition_keys"] = partition_keys
            out["physical_plan"] = buf.getvalue()
            out["source_path"] = (
                "jdbc"
                if job.jdbc_connection_string and self.registry.jdbc_enabled
                else "files"
            )
            if job.partitioned_scan and job.num_partitions > 1:
                col = str(job.column_for_partitioning_on_spark or "").strip()
                if col.lower() not in {c.lower() for c in df.columns}:
                    out["issues"].append(
                        f"scan partition column {col!r} not in the projected "
                        "columns — repartitionByRange would be skipped"
                    )
            if not job.reconciliation_enabled:
                out["issues"].append(
                    "no ExpectedAmountOfRecords — reconciliation will be "
                    "'skipped'"
                )
        except Exception as e:  # noqa: BLE001 — validator reports, not raises
            out["status"] = "INVALID"
            out["error"] = str(e)
        return out

    def _write_sink(
        self,
        cleaned,
        job: ExtractionJob,
        partition_keys: list[str],
        mode: str,
        max_records_per_file: int | None = None,
    ) -> SinkResult:
        """K1 dispatch: raw parquet + metastore (reference parity) or,
        under ``config.acid``, one atomic transaction-log commit
        (lakehouse.py) — readers see the whole batch or none of it."""
        if self.config.acid:
            from pathlib import Path as _Path

            from .lakehouse import ConcurrentCommitError, TransactionLog

            path = str(_Path(self.config.target_root) / job.target_path_suffix)
            t = TransactionLog(path)
            if mode == "overwrite":
                version = t.overwrite(cleaned, partition_keys)
            else:
                version = t.append(
                    cleaned,
                    partition_keys,
                    evolve_schema=self.config.evolve_schema,
                    max_records_per_file=max_records_per_file,
                )
            if self.config.acid_autocompact_files:
                # small-file policy: rewrite ONLY partition dirs the
                # appends have fragmented past the threshold — one
                # dataChange=false commit, incremental readers see
                # nothing, a racing reader replays old or new state
                try:
                    t.compact(
                        self.spark,
                        min_files=self.config.acid_autocompact_files,
                    )
                except ValueError:
                    pass  # nothing over threshold — the common case
                except ConcurrentCommitError:
                    pass  # lost the race to a writer; next run retries
            return SinkResult(
                path=path,
                table=None,  # see EngineConfig.acid: metastore skipped
                partition_keys=partition_keys,
                mode=f"acid-{mode}@v{version}",
            )
        with self._sink_lock(job.target_path_suffix):
            return write_partitioned_parquet(
                cleaned,
                root=self.config.target_root,
                path_suffix=job.target_path_suffix,
                partition_keys=partition_keys,
                target_database=self.config.target_database
                if self.config.register_catalog
                else None,
                table_name=job.target_table_name
                if self.config.register_catalog
                else None,
                mode=mode,
                evolve_schema=self.config.evolve_schema,
                max_records_per_file=max_records_per_file,
            )

    def run_job(self, job: ExtractionJob) -> RunResult:
        hash_id = job.execution_hash_id
        t0 = time.time()
        if self.ledger:
            self.ledger.update_item(hash_id, job.source_table, GlueJobStartTimestamp=utc_now_str())
        load_ts = datetime.now(timezone.utc).replace(tzinfo=None)

        try:
            df = self.build_query_df(job)
            cleaned, partition_keys = clean_pipeline(
                df,
                execution_hash_id=hash_id,
                load_timestamp=load_ts,
                partition_column=(
                    job.column_for_partitioning_on_s3 if job.partitioned_sink else None
                ),
            )
            final_schema = schema_tree_string(cleaned)

            observation: Observation | None = None
            row_count: int | None = None
            cached: DataFrame | None = None
            # adaptive sizing bounds file size per WRITE (never via a
            # session conf — it would leak into later tiered jobs);
            # tiered mode must not set it or the coalesce(n) file
            # counts would be re-split past the tier boundary.
            max_rpf: int | None = 5_000_000
            if self.config.count_strategy == "cache":
                # reference parity: cache + count before the write
                # (sybaseiq_extractor.py:295-297)
                cached = cleaned.cache()
                row_count = cached.count()
                cleaned = apply_output_sizing(cached, row_count, mode=self.config.output_sizing)
                if self.config.output_sizing == "tiered":
                    max_rpf = None
            elif self.config.count_strategy == "observe":
                observation = Observation(f"rows_{hash_id[:8]}")
                cleaned = cleaned.observe(observation, F.count(F.lit(1)).alias("n"))
                # DOCUMENTED fallback, not an oversight: tiered sizing
                # needs the pre-write row count, which observe learns
                # only AFTER the write — so under observe the sizing is
                # always adaptive (AQE coalesce), whatever
                # output_sizing says.  Exact reference-parity file
                # counts require count_strategy='cache' (see
                # EngineConfig docstring).
                cleaned = apply_output_sizing(cleaned, 0, mode="adaptive")

            try:
                sink = self._write_sink(
                    cleaned,
                    job,
                    partition_keys,
                    mode=self.config.sink_mode,
                    max_records_per_file=max_rpf,
                )
                if observation is not None:
                    row_count = int(observation.get["n"])
            finally:
                if cached is not None:
                    # unpersist the exact DataFrame that was cached —
                    # `cleaned` may have been rebound to the coalesced
                    # plan by sizing.  In a finally: a failed write must
                    # not leave the multi-TB extract pinned in storage
                    # memory for the rest of a sequential chain (the
                    # orchestrator deliberately continues past failures).
                    cached.unpersist()

            if sink.table and self.config.post_write_analyze:
                from .operators.maintenance import post_write_maintenance

                post_write_maintenance(self.spark, sink.table)

            if self.ledger:
                self.ledger.update_item(
                    hash_id,
                    job.source_table,
                    GlueAmountOfRecords=row_count,
                    GlueJobEndTimestamp=utc_now_str(),
                    GlueFinalTableSchema=final_schema,
                    GlueJobFinalStatus="SUCCEEDED",
                    ExecutionTime=int(time.time() - t0),
                )

            reconcile = reconcile_counts(job.expected_amount_of_records, row_count)
            result = RunResult(
                execution_hash_id=hash_id,
                source_table=job.source_table,
                status="SUCCEEDED",
                row_count=row_count,
                reconcile_status=reconcile,
                sink=sink,
                final_schema=final_schema,
                execution_time_s=time.time() - t0,
            )
        except Exception as e:  # noqa: BLE001 — C4 failure routing
            if self.ledger:
                self.ledger.update_item(
                    hash_id,
                    job.source_table,
                    GlueJobFinalStatus="FAILED",
                    ErrorMessage=str(e)[:2000],
                    GlueJobEndTimestamp=utc_now_str(),
                    ExecutionTime=int(time.time() - t0),
                )
            result = RunResult(
                execution_hash_id=hash_id,
                source_table=job.source_table,
                status="FAILED",
                row_count=None,
                reconcile_status=None,
                sink=None,
                final_schema=None,
                execution_time_s=time.time() - t0,
                error=str(e),
            )

        if self.notifications:
            self.notifications.publish(
                build_notification(
                    state=result.status,
                    source_name=job.source_name,
                    source_table=job.source_table,
                    migration_part=job.migration_part,
                    reconcile_status=result.reconcile_status or "skipped",
                    run_details={
                        "ExecutionHashId": hash_id,
                        "GlueAmountOfRecords": result.row_count,
                        "ExpectedAmountOfRecords": job.expected_amount_of_records,
                        "ExecutionTime": int(result.execution_time_s),
                        "Query": job.query,
                        "Error": result.error,
                    },
                )
            )
        return result


# ---------------------------------------------------------------------
# Incremental extraction (extension beyond the reference's append-only
# full-slice model): extract only rows past the last high watermark.
# ---------------------------------------------------------------------


def _wm_key(job: ExtractionJob) -> str:
    return f"IncrementalWatermark-{job.source_name}-{job.source_table}"


class IncrementalMixin:
    """Watermark-column incremental runs, ledger-backed.

    The high watermark for ``(source, table)`` lives in the ledger as a
    dedicated row; each run filters ``watermark_column > last`` and
    advances the stored watermark to the batch max — collected via the
    same single-pass ``observe`` used for row counts, so incremental
    costs one scan exactly like a full run.
    """

    def last_watermark(self, job: ExtractionJob) -> str | None:
        if self.ledger is None:
            return None
        item = self.ledger.get(_wm_key(job), job.source_table)
        return item.get("HighWatermark") if item else None

    def run_incremental(self, job: ExtractionJob, watermark_column: str) -> RunResult:
        last = self.last_watermark(job)
        base_df = self.build_query_df(job)
        wm_type = base_df.schema[watermark_column].dataType
        if last is not None:
            # The ledger stores the watermark as a string; compare in the
            # column's NATIVE type (a lexicographic compare would regress
            # numeric watermarks: '9' > '10').
            base_df = base_df.filter(
                F.col(watermark_column) > F.lit(last).cast(wm_type)
            )

        obs = Observation(f"inc_{job.execution_hash_id[:8]}")
        observed = base_df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # max in the native type; stringified only at ledger-store time
            F.max(F.col(watermark_column)).alias("wm"),
        )

        cleaned, partition_keys = clean_pipeline(
            observed,
            execution_hash_id=job.execution_hash_id,
            partition_column=(
                job.column_for_partitioning_on_s3 if job.partitioned_sink else None
            ),
        )
        sink = self._write_sink(cleaned, job, partition_keys, mode="append")
        row_count = int(obs.get["n"])
        new_wm = obs.get["wm"]
        if self.ledger is not None and row_count > 0 and new_wm is not None:
            self.ledger.put_item(
                {
                    "ExecutionHashId": _wm_key(job),
                    "SourceTable": job.source_table,
                    "HighWatermark": str(new_wm),
                }
            )
        return RunResult(
            execution_hash_id=job.execution_hash_id,
            source_table=job.source_table,
            status="SUCCEEDED",
            row_count=row_count,
            reconcile_status=None,
            sink=sink,
            final_schema=None,
            execution_time_s=0.0,
            details={"last_watermark": last, "new_watermark": str(new_wm) if new_wm is not None else last},
        )


# graft the mixin methods onto Engine (single public class)
Engine.last_watermark = IncrementalMixin.last_watermark
Engine.run_incremental = IncrementalMixin.run_incremental
