"""Hypertable-style continuous-aggregate cascade.

Time-series stores (hypertables) maintain multi-granularity rollups by
re-aggregating each coarser grain FROM the next finer grain's
materialization — a day bucket reads 24 hourly rows, not 100 TB of raw
events.  That works because the aggregates are decomposable:
``count → sum of counts``, ``sum → sum of sums``, ``min → min of
mins``, ``max → max of maxes`` (avg is carried as sum+count and
finalized at read time).

:func:`cascade_rollup` builds the chain; correctness is the cascade
invariant — the coarse grain equals aggregating raw directly — which
the catalog entry's oracle checks by computing the daily grain straight
from the events table.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cascade_rollup", "refresh_rollup_incremental"]


def _is_path_not_found(exc: AnalysisException) -> bool:
    """True only for the missing-root-path error class.

    Any other analysis failure (corrupt footer, permission, schema) must
    propagate: treating it as "first refresh" would let the dynamic
    partition overwrite below replace dirty-day partitions with
    delta-only aggregates, silently discarding accumulated history.
    """
    get = getattr(exc, "getCondition", None) or getattr(exc, "getErrorClass", None)
    cls = (get() if get else None) or ""
    return cls == "PATH_NOT_FOUND"


def refresh_rollup_incremental(
    spark,
    hourly_path: str,
    new_events: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    grain: str = "hour",
) -> DataFrame:
    """Merge a batch of new events into an existing ``grain``-level
    materialization, touching ONLY the dirty buckets.

    The continuous-aggregate refresh: aggregate the delta, read back
    just the existing rows for the affected day partitions (partition
    pruning — the materialization is day-partitioned), merge with the
    decomposable re-aggregation (sum+sum / min-of-mins), and rewrite
    only those day partitions via dynamic partition overwrite.  Cost is
    O(delta + dirty buckets), never O(history) — the reason hypertable
    rollups stay cheap on append-mostly streams.

    Returns the merged dirty-bucket rows (what was just written).
    """
    delta = (
        new_events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"), *keys
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    ).withColumn("day", F.date_format("bucket", "yyyy-MM-dd"))
    delta = delta.cache()
    # broadcast semi-join on the tiny dirty-day frame: dynamic partition
    # pruning reads only the dirty day dirs — no driver-side collect.
    # localCheckpoint materializes the frame (it outlives delta's cache).
    dirty = delta.select("day").distinct().localCheckpoint()

    try:
        existing = spark.read.parquet(hourly_path).join(
            F.broadcast(dirty), "day", "semi"
        )
        merged_src = existing.unionByName(delta)
    except AnalysisException as exc:
        if not _is_path_not_found(exc):
            raise
        merged_src = delta  # first refresh: nothing materialized yet

    merged = (
        merged_src.groupBy("bucket", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("day", F.date_format("bucket", "yyyy-MM-dd"))
    )
    # materialize before writing: `merged` reads the same path it is
    # about to overwrite (localCheckpoint cuts the file-source lineage,
    # so this is not a read-while-overwrite)
    merged = merged.localCheckpoint()
    # dynamic partition overwrite replaces ONLY the day partitions
    # present in `merged`.  Set as a WRITER option, not inherited from
    # the session: on a session with the Spark-default static mode this
    # write would silently delete every non-dirty day of history.
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(hourly_path)
    )
    delta.unpersist()
    # `merged` IS what was just written (already localCheckpointed) —
    # returning it directly saves a full re-read of the rewritten day
    # partitions on every refresh (a per-micro-batch cost on streams).
    return merged


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Multi-granularity rollup chain over ``grains`` (finest first,
    each a ``date_trunc`` unit).  Returns ``{grain: DataFrame}`` with
    columns ``(bucket, *keys, n_events, total_value, min_value,
    max_value)``; every grain after the first aggregates the PREVIOUS
    grain's output (decomposable re-aggregation), so refreshing a
    coarse grain never touches raw data.
    """
    out: dict[str, DataFrame] = {}
    finest = grains[0]
    cur = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *keys
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    out[finest] = cur
    for g in grains[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(g, F.col("bucket")).alias("bucket"), *keys
            ).agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out[g] = cur
    return out
