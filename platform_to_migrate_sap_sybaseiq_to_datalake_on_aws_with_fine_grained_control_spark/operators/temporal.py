"""Temporal join operators (as-of / point-in-time).

Spark has no native as-of join (pandas ``merge_asof`` is single-node);
the distributed form here is the union-marker pattern:

1. dedupe the right side to one row per ``(key, ts)`` (deterministic
   tiebreak — without it the matched row is arbitrary under retries);
2. union both sides with a source marker, right rows sorting BEFORE
   left rows at equal timestamps (inclusive ``s <= t`` semantics);
3. one window per key ordered by ``(ts, marker)`` forward-fills the
   right columns with ``last(..., ignorenulls=True)``;
4. keep only left rows.

Cost: one hash shuffle per side on the key + a per-key sort — the same
shape as a sort-merge join, with NO range-explosion (a naive
``l.ts >= r.ts`` range join is quadratic per key).  Skewed keys are
split by AQE; salting does not apply (the fill is order-dependent
within a key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.temporal import epoch_us

__all__ = ["asof_join_backward", "range_join_bucketed"]


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_s: int,
    max_buckets_per_interval: int = 100_000,
    on_overflow: str = "error",
) -> DataFrame:
    """Interval (range) join without the quadratic blow-up: each point
    matched to every interval of the same key containing it.

    A naive ``p.ts BETWEEN i.start AND i.end`` join plans as a
    nested-loop per key (quadratic).  Here time is chunked into
    ``bucket_s``-second buckets: an interval is exploded to the buckets
    it spans (``len/bucket_s + 1`` rows — pick ``bucket_s`` ≥ typical
    interval length so this is ~2), a point maps to exactly ONE bucket,
    and the join is a plain equi-join on ``(key, bucket)`` refined by
    the exact BETWEEN predicate.  Shuffle volume is linear in points +
    exploded intervals; each (point, interval) pair meets in exactly
    one bucket, so no dedup is needed.

    Output: all interval columns + all point columns (inner semantics;
    aggregate + right-join the intervals afterwards to keep empty
    ones).
    """
    us = bucket_s * 1_000_000
    # Cap the per-interval explode: one corrupt interval (a year-9999
    # sentinel end date, a classic dirty-source value) would otherwise
    # demand a ~1e8-element sequence and kill the whole job.  The cap
    # is NOT a silent truncation (an interval legitimately spanning
    # more buckets would lose its tail matches — a recall bug):
    #
    # * ``on_overflow="error"`` (default) — any over-cap interval fails
    #   the job loudly via a codegen assert; the fix is an explicit
    #   bigger ``bucket_s``/``max_buckets_per_interval`` or upstream
    #   cleansing.
    # * ``on_overflow="truncate"`` — the sentinel-neutralization mode:
    #   over-cap intervals match only their first ``cap`` buckets.
    #   Opt-in and documented, never the default.
    #
    # Inverted intervals (end < start) explode to nothing instead of
    # erroring the sequence.
    lo_b = F.floor(epoch_us(start_ts) / us)
    end_b = F.floor(epoch_us(end_ts) / us)
    if on_overflow == "error":
        hi_b = F.when(
            end_b - lo_b > max_buckets_per_interval,
            F.raise_error(
                F.format_string(
                    "range_join_bucketed: interval [%s, %s] spans more than "
                    f"max_buckets_per_interval={max_buckets_per_interval} "
                    f"buckets of {bucket_s}s — raise the cap/bucket_s or "
                    "cleanse the interval source "
                    "(on_overflow='truncate' opts into capped matching)",
                    F.col(start_ts).cast("string"),
                    F.col(end_ts).cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(end_b)
    elif on_overflow == "truncate":
        hi_b = F.least(end_b, lo_b + F.lit(max_buckets_per_interval))
    else:
        raise ValueError(
            f"on_overflow must be 'error' or 'truncate', got {on_overflow!r}"
        )
    ivl = intervals.filter(F.col(end_ts) >= F.col(start_ts)).withColumn(
        "_bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    pts = points.withColumn(
        "_bucket", F.floor(epoch_us(point_ts) / us)
    )
    return (
        ivl.join(pts, [on, "_bucket"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bucket")
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of left join: for each left row, attach the right
    row with the greatest ``right_ts <= left_ts`` for the same ``on``
    key (or nulls when none exists / it is older than ``tolerance_s``).

    ``right_cols`` are the right-side payload columns to carry (must
    not collide with left column names).  ``right_tiebreak`` orders
    duplicate ``(key, ts)`` right rows (max wins) so the result is
    deterministic.  Output = all left columns + ``right_cols`` +
    ``_matched_ts`` (the matched right timestamp, null when no match).
    """
    right_cols = right_cols or []
    tb = right_tiebreak or (right_cols[0] if right_cols else right_ts)
    w_dedup = Window.partitionBy(on, right_ts).orderBy(F.col(tb).desc())
    r = (
        right.select(on, right_ts, *right_cols)
        .withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    left_cols = [c for c in left.columns]
    r_schema = {f.name: f.dataType for f in r.schema.fields}

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(r_schema[c]).alias(c) for c in right_cols],
        F.lit(None).cast(r_schema[right_ts]).alias("_r_ts"),
    )
    r_tagged = r.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Fill ONE struct holding the whole right row, not each payload
    # column independently: per-column ignore-nulls fill would blend
    # values from DIFFERENT right rows whenever a payload column is
    # null (a=5 from ts=1, b=7 from ts=2 — a row that never existed).
    # The struct is non-null exactly on right rows, so last() lands on
    # the true as-of row with its nulls intact.
    r_struct = F.when(
        F.col("_is_left") == 0,
        F.struct(*[F.col(c) for c in right_cols], F.col("_r_ts").alias("_r_ts")),
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last(r_struct, ignorenulls=True).over(w).alias("_f"),
    ).select(
        "*",
        *[F.col(f"_f.{c}").alias(f"_f_{c}") for c in right_cols],
        F.col("_f._r_ts").alias("_matched_ts_f"),
    )
    out = filled.filter(F.col("_is_left") == 1)

    in_tol = F.lit(True)
    if tolerance_s is not None:
        in_tol = (
            epoch_us("_t") - epoch_us("_matched_ts_f")
        ) <= int(tolerance_s * 1_000_000)
    return out.select(
        *[F.col(c) for c in left_cols],
        *[
            F.when(in_tol, F.col(f"_f_{c}")).alias(c)
            for c in right_cols
        ],
        F.when(in_tol, F.col("_matched_ts_f")).alias("_matched_ts"),
    )
