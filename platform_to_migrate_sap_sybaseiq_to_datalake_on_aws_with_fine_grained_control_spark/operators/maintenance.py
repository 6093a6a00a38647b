"""Post-write table maintenance (SURVEY.md §2.5 K6, §2.6 C7 analogs).

K6 — the reference creates a Glue *partition index* after each
successful run (``postprocess/lambda_function.py:164-221``) purely to
speed catalog ``GetPartitions`` calls.  Spark's catalog prunes
partitions natively, so the meaningful analogs are:

* ``analyze_table`` — table/column statistics for Catalyst's CBO
  (join reordering, broadcast decisions at real scale);
* ``compact_partitions`` — rewrite small files per partition
  (the OPTIMIZE analog; the reference's coalesce tiers are the
  write-time version, this is the read-repair version).

C7 — the per-plan ``WorkerType``/``NumberOfWorkers`` knobs become
session-level resource confs; :func:`plan_session_confs` maps them the
way Glue's worker catalog would.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Glue worker catalog (vCPU, memory GiB) — G.1X/G.2X per AWS docs;
#: used only to derive equivalent Spark parallelism hints.
WORKER_SPECS = {
    "G.1X": (4, 16),
    "G.2X": (8, 32),
    "Standard": (4, 16),
}


def plan_session_confs(worker_type: str, number_of_workers: int) -> dict[str, str]:
    """Map plan resource fields to Spark confs (C7).

    ``shuffle.partitions`` sized at 2× total cores (the standard
    starting point; AQE coalesces down), executor memory from the
    worker spec.  On a managed cluster these become cluster-level
    settings; locally they are hints.
    """
    vcpu, mem = WORKER_SPECS.get(worker_type, WORKER_SPECS["G.1X"])
    total_cores = max(1, vcpu * max(1, number_of_workers))
    return {
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.executor.memory": f"{mem}g",
        "spark.executor.cores": str(vcpu),
    }


#: post-shuffle partition target — the classic 128 MiB rule: big enough
#: to amortize task overhead, small enough to sort/aggregate in memory
#: on a 4 GiB-per-core executor.
SHUFFLE_PARTITION_TARGET_BYTES = 128 * 1024 * 1024


def cluster_profile(
    worker_type: str = "G.1X",
    number_of_workers: int = 10,
    target_input_tb: float | None = None,
    dynamic_allocation: bool = True,
) -> dict[str, str]:
    """The full large-cluster conf surface (VERDICT r8 item 6) — the
    settings every bench/test session in this repo runs under
    (``session.py::get_spark``), sized for a real multi-executor
    deployment instead of ``local[N]``.  Feed the result to
    ``get_spark(extra_conf=cluster_profile(...))`` or to
    ``spark-submit --conf`` lines; a plan's ``WorkerType`` /
    ``NumberOfWorkers`` fields map straight onto the first two
    arguments (C7, like :func:`plan_session_confs`).

    Sizing rules, all derived — nothing here is a magic constant to
    re-tune per job:

    * **Executors**: one per worker, one worker reserved for the
      driver (the Glue convention the reference's NumberOfWorkers
      follows).  Heap = 75 % of worker memory, the rest declared as
      ``memoryOverhead`` — Arrow batches (our Pandas-UDF kernels) and
      shuffle netty buffers live off-heap, and an undeclared overhead
      is how executors get OOM-killed by the resource manager.
    * **``spark.sql.shuffle.partitions``**: ``input_bytes / 128 MiB``
      when the job's input size is known (``target_input_tb``),
      floored at 2 × total cores.  Err HIGH: AQE coalesces small
      post-shuffle partitions at runtime for free, but too-few
      partitions spill and cannot be split (except by the skew-join
      splitter).  At 100 TB this rule gives ~800k partitions — far
      beyond any static default.
    * **AQE on, all three features**: runtime coalescing (fixes
      over-partitioning), skew-join splitting (fixes hot keys —
      measured on the salted-join A/B in ``tests/test_plans.py``),
      local shuffle reader (fixes broadcast-after-shuffle plans).
    * **Broadcast threshold 64 MiB**: the bench-proven dimension
      tables (nation/region/supplier at any SF, bench shingle sets,
      centroid tables) broadcast; 4 GiB/core executors hold a 64 MiB
      table ~60× over.  Catalyst still decides per-plan — this is a
      ceiling, not a force.
    * **``maxPartitionBytes`` 128 MiB** — scan-side splits match the
      shuffle target so map tasks are uniform.
    * **``maxRecordsPerFile`` 5M** — bounds output files on wide rows
      (the K1 sink's coalesce tiers control file COUNT; this bounds
      file SIZE drift at 1000× row counts).
    * **Dynamic allocation + shuffle tracking** (no external shuffle
      service needed on K8s/YARN-less deployments): executors scale
      between half and the full fleet, so a mostly-idle schedule slot
      releases capacity without losing shuffle files.
    """
    vcpu, mem_gib = WORKER_SPECS.get(worker_type, WORKER_SPECS["G.1X"])
    executors = max(1, number_of_workers - 1)
    total_cores = vcpu * executors
    heap_gib = max(1, int(mem_gib * 0.75))
    overhead_gib = max(1, mem_gib - heap_gib)

    if target_input_tb is not None:
        input_bytes = int(target_input_tb * 1024**4)
        parts = max(
            total_cores * 2, input_bytes // SHUFFLE_PARTITION_TARGET_BYTES
        )
    else:
        parts = total_cores * 2

    conf = {
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(vcpu),
        "spark.executor.memory": f"{heap_gib}g",
        "spark.executor.memoryOverhead": f"{overhead_gib}g",
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.localShuffleReader.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            SHUFFLE_PARTITION_TARGET_BYTES
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(
            SHUFFLE_PARTITION_TARGET_BYTES
        ),
        "spark.sql.files.maxRecordsPerFile": "5000000",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.parquet.compression.codec": "snappy",
    }
    if dynamic_allocation:
        conf.update(
            {
                "spark.dynamicAllocation.enabled": "true",
                "spark.dynamicAllocation.shuffleTracking.enabled": "true",
                "spark.dynamicAllocation.minExecutors": str(
                    max(1, executors // 2)
                ),
                "spark.dynamicAllocation.maxExecutors": str(executors),
            }
        )
    return conf


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """Table + optional column statistics (K6's useful analog: feeds
    Catalyst CBO instead of a catalog-API latency fix)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def post_write_maintenance(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
    attempts: int = 5,
    backoff_s: float = 0.0,
    compact_path: str | None = None,
    partition_keys: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
    target_files_per_partition: int = 1,
) -> None:
    """K6 post-write step with the reference's partition-index retry
    semantics (``postprocess/lambda_function.py:198-221``): 5 attempts,
    linear backoff (``sleep(attempt*10)`` there, ``backoff_s``-scaled
    here), "already exists" tolerated as success, and exhaustion
    swallowed — maintenance must never fail a run that already wrote
    its data, exactly like the reference's Lambda returning 0.

    ``compact_path`` turns this into the full OPTIMIZE-equivalent for
    the K1 parquet sink (the Delta-less analog of ``OPTIMIZE [table]
    ZORDER BY (x, y)`` + ``ANALYZE``): small-file compaction via
    stage-and-swap :func:`compact_partitions`, optional 2-D z-order
    clustering, then a stats refresh so Catalyst's CBO sees the new
    layout.  Compaction runs under the same tolerate/swallow envelope —
    it is maintenance, and must never fail a run whose data landed.
    Reference analog: the Glue partition-index postprocess Lambda
    (``postprocess/lambda_function.py:164-221``) — same
    "optimize the just-written table, never break the run" contract.
    """
    from ..util import with_retry

    # Compaction runs ONCE in its own swallow envelope: coupling it
    # with ANALYZE inside the retry loop would re-execute the full
    # stage-and-swap dataset rewrite on every transient ANALYZE
    # failure (r5 review finding) — the reference's retried step is
    # the stats/index refresh, not the data rewrite.
    if compact_path is not None:
        with_retry(
            lambda: compact_partitions(
                spark,
                compact_path,
                partition_keys or [],
                target_files_per_partition=target_files_per_partition,
                zorder_by=zorder_by,
            ),
            attempts=1,
            backoff_s=backoff_s,
            tolerate=("AlreadyExists", "already exists"),
            on_exhausted="swallow",
        )
    with_retry(
        lambda: analyze_table(spark, table, columns),
        attempts=attempts,
        backoff_s=backoff_s,
        backoff="linear",
        tolerate=("AlreadyExists", "already exists"),
        on_exhausted="swallow",
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_keys: list[str],
    target_files_per_partition: int = 1,
    zorder_by: tuple[str, str] | None = None,
    zorder_bits: int = 16,
) -> None:
    """Rewrite a partitioned parquet dir with ``target_files_per_
    partition`` files per Hive partition (small-file compaction).

    Stage-and-swap: the compacted copy is written to a sibling temp dir
    and swapped in with two directory renames — never an in-place
    overwrite of the path being read (Spark rejects self-overwrite,
    and a bypassed check could delete input mid-read).  The swap is
    atomic per rename on a local/HDFS filesystem; on an object store
    (no atomic rename) use a table format (Delta/Iceberg) instead —
    this operator is the raw-parquet analog.

    Crash recovery: the displaced original uses the DETERMINISTIC name
    ``.{name}.old`` so a process death between the two renames (dataset
    momentarily lives only under ``.old``) is self-healing — the next
    call finds the orphan and renames it back before compacting.
    Orphaned ``.{name}.compact-*`` staging dirs from crashed runs are
    swept at the same point (after ``.old`` recovery, so a staging dir
    is only ever deleted once the dataset has a live home at ``path``).
    Readers racing the swap window still see FileNotFound (documented);
    the data itself is never without a recoverable home.

    Schema fidelity: when the dataset carries a ``_schema.json``
    sidecar (written by the K1 sink's evolving appends — the source of
    truth that a single-footer read cannot reconstruct for
    int→long-widened files), the source is READ under that schema and
    the sidecar is staged into the temp dir BEFORE the swap, so
    compaction neither mis-types widened files nor silently deletes the
    schema source-of-truth (r5 advice).  Post-compaction the sidecar
    still describes the data exactly: every rewritten file now carries
    the widened type.

    Layout: ``repartition(*keys)`` puts each Hive partition's rows in
    one task → one file per partition; for N>1 a deterministic salt
    column (hash of all columns, retry-safe, no rand()) splits each
    partition into N tasks/files.

    ``zorder_by=(x_col, y_col)`` additionally clusters each rewritten
    partition on the Morton key of the two (non-negative integer)
    dimensions — the raw-parquet analog of Delta's ``OPTIMIZE ...
    ZORDER BY``: range-partitioning on (keys..., zkey) gives each
    output file a contiguous z-range, and the within-partition sort
    keeps row groups clustered, so per-file/row-group min-max stats
    prune scans filtered on EITHER dimension.  The z-key is pure
    codegen bit arithmetic (``layout.zorder_key``) and is never
    materialized into the written schema.
    """
    import json
    import shutil
    import uuid
    from pathlib import Path

    from pyspark.sql import functions as F

    from ..sinks.parquet_sink import _SCHEMA_SIDECAR

    p = Path(path)
    old = p.parent / f".{p.name}.old"
    if old.exists():
        if p.exists():  # prior run died after writing tmp→p: old is stale
            shutil.rmtree(old)
        else:  # prior run died between the two renames: recover
            old.rename(p)
    # sweep staging dirs orphaned by crashed runs (post-recovery, so
    # the dataset is guaranteed live at `path` before anything is
    # deleted); each run below creates its own uuid-fresh dir
    for stale in p.parent.glob(f".{p.name}.compact-*"):
        shutil.rmtree(stale)

    sidecar = p / _SCHEMA_SIDECAR
    sidecar_schema = None
    if sidecar.exists():
        from pyspark.sql.types import StructType

        sidecar_schema = StructType.fromJson(json.loads(sidecar.read_text()))
        df = spark.read.schema(sidecar_schema).parquet(path)
    else:
        df = spark.read.parquet(path)
    if zorder_by is not None:
        from .layout import zorder_key

        zkey = zorder_key(
            F.col(zorder_by[0]).cast("long"),
            F.col(zorder_by[1]).cast("long"),
            bits=zorder_bits,
        )
        # one range slice per target output file: |hive partitions| ×
        # files-per-partition tasks, lexicographic (keys..., zkey)
        # ranges keep every file inside one hive partition AND one
        # contiguous z-range.  The distinct() is over partition VALUES
        # — bounded by partition count, not data size.
        n_parts = (
            max(1, df.select(*partition_keys).distinct().count())
            if partition_keys
            else 1
        )
        laid_out = df.repartitionByRange(
            n_parts * max(1, target_files_per_partition),
            *[F.col(k) for k in partition_keys],
            zkey,
        ).sortWithinPartitions(*[F.col(k) for k in partition_keys], zkey)
    elif not partition_keys:
        laid_out = df.coalesce(max(1, target_files_per_partition))
    elif target_files_per_partition <= 1:
        laid_out = df.repartition(*[df[k] for k in partition_keys])
    else:
        salt = F.pmod(F.hash(*[df[c] for c in df.columns]), F.lit(target_files_per_partition))
        laid_out = df.withColumn("_salt", salt).repartition(
            *[df[k] for k in partition_keys], F.col("_salt")
        ).drop("_salt")

    tmp = p.parent / f".{p.name}.compact-{uuid.uuid4().hex[:8]}"
    laid_out.write.partitionBy(*partition_keys).parquet(str(tmp))
    if sidecar_schema is not None:
        # stage the schema source-of-truth INTO the swap: the sidecar
        # must land atomically with the data or later evolving appends
        # fall back to a single-footer read that cannot reconcile
        # widened files
        (tmp / _SCHEMA_SIDECAR).write_text(json.dumps(sidecar_schema.jsonValue()))
    p.rename(old)
    tmp.rename(p)
    shutil.rmtree(old)
