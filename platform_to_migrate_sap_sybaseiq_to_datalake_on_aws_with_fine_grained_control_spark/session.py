"""SparkSession factory.

Single place where execution-relevant config lives so that tests, bench
and the driver entry all run with the same tuned session.  The settings
are chosen for a large cluster but validated on ``local[N]``:

* AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's hand-tuned ``NumPartitions``/worker sizing formula
  (reference README.md:103-110).
* ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster this is overridden (AQE coalesces down anyway).
* Session timezone pinned to UTC — the reference stamps
  ``migration_tp_utc`` in UTC (sybaseiq_extractor.py:42) and the DuckDB
  oracle compares timestamps as UTC-naive.
* Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "sybaseiq-datalake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Shuffle/broadcast codec (guide §2.3: "There is no universal
        # answer — measure both").  r11 shipped zstd unconditionally on
        # an sf10-only measurement and regressed the sf0.1 headline 25%
        # (PERF_r11: geomean 0.79, 14/19 slower — zstd's CPU-per-block
        # cost dominates at sub-MB shuffle sizes).  r12 A/B under the
        # driver protocol (bench.py, sf0.1, cold JVM, idle host):
        # numbers in OPTIMIZATION_r12.md — the default below ships the
        # measured winner; SPARK_GRAFT_IO_CODEC overrides for scale
        # deployments (zstd stays right for the multi-GB token shuffles
        # measured at sf10).  Parquet file codec stays snappy — data
        # file bytes are part of committed artifacts.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.io.compression.zstd.level",
            os.environ.get("SPARK_GRAFT_ZSTD_LEVEL", "1"),
        )
        # spark.sql.optimizer.canChangeCachedPlanOutputPartitioning is
        # deliberately LEFT AT ITS false DEFAULT (r12, measured twice):
        # true lets AQE coalesce a persisted frame's output to 1-2
        # partitions, starving every downstream consumer of the cache
        # of parallelism — fresh-session A/B on persist-heavy entries
        # at sf0.1: mm_video 2.29 -> 3.24 s, sketch_hll 1.15 -> 1.56,
        # streaming_hll 2.79 -> 3.62 under the true setting.  The sf10
        # case it would have helped (AQE under the ordered-scan input
        # pin) is moot because the "double execution" it was paired
        # with reuses shuffle outputs across passes anyway — see
        # OPTIMIZATION_r12.md change 3 for the full evidence chain.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
