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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cascade_rollup"]


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
