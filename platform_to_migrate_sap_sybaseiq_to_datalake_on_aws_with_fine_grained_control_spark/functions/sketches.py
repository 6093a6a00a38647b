"""Mergeable-sketch column helpers (HyperLogLog).

The register construction mirrors the ``sketch_hll_distinct`` oracle
template in ``query_catalog_mining`` stage for stage (md5 → 8-bit
register index + 48-bit suffix → nibble-wise leading-zero rank), so a
register table built incrementally — per micro-batch, per partition,
per day — MAX-merges into exactly the sketch the batch SQL computes.
Everything is integer/string arithmetic: no float appears until the
final estimate, and the harmonic-mean denominator is an exact BIGINT
(``sum(1 << (49 - M))``), so results are independent of aggregation
or merge order — the property that makes the sketch safe to maintain
across retried/replayed micro-batches (duplicate register rows cannot
move a max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["HLL_M", "hll_register_rows", "hll_estimate_row"]

#: register count (8-bit index) — 256 bytes of max-rank state
HLL_M = 256
#: rank ceiling: 48-bit suffix of all zeros
_RHO_MAX = 49
#: bias correction for m=256
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_POW2_49 = float(1 << 49)


def hll_register_rows(
    df: DataFrame, key_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Per-row ``(*carry, idx, rho)`` register observations for
    ``key_col``.

    Same staging as the ``sketch_hll_distinct`` SQL template: the
    register index is the first two md5 hex chars, the rank is the
    leading-zero run of the next twelve (computed from hex nibbles —
    no float log2 near power-of-two boundaries).  Feed the output to
    ``groupBy(*carry, "idx").agg(max("rho"))`` — the resulting table
    merges with any other register table by the same max.  ``carry``
    columns (e.g. a time-window key) ride along untouched, giving
    per-group sketches from the same kernel.
    """
    h12 = f"substr(md5(CAST({key_col} AS STRING)), 3, 12)"
    return (
        df.select(
            *[F.col(c) for c in carry],
            F.expr(
                f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 2), "
                f"16, 10) AS INT)"
            ).alias("idx"),
            F.expr(h12).alias("h12"),
        )
        .withColumn("lz", F.expr("length(regexp_extract(h12, '^0*', 0))"))
        .withColumn("nib", F.expr("substr(h12, lz + 1, 1)"))
        .withColumn(
            "rho",
            F.expr(
                f"CASE WHEN lz = 12 THEN {_RHO_MAX} "
                "ELSE 4 * lz + CASE "
                "WHEN (instr('0123456789abcdef', nib) - 1) >= 8 THEN 1 "
                "WHEN (instr('0123456789abcdef', nib) - 1) >= 4 THEN 2 "
                "WHEN (instr('0123456789abcdef', nib) - 1) >= 2 THEN 3 "
                "ELSE 4 END END"
            ),
        )
        .select(*carry, "idx", "rho")
    )


def hll_estimate_row(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """One-row estimate frame from a (possibly sparse) ``(idx, m)``
    register table: bias-corrected harmonic mean with the
    linear-counting small-range branch — the same formulas (and the
    same exact-BIGINT register sum) as the batch SQL oracle."""
    grid = spark.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
    full = grid.join(regs, "idx", "left").select(
        F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    agg = full.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - m)")).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = F.lit(_ALPHA) * HLL_M * HLL_M * F.lit(_POW2_49) / F.col("s").cast(
        "double"
    )
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(
        corrected.alias("e"),
        F.col("v").cast("bigint").alias("v"),
        (F.lit(HLL_M) - F.col("v")).cast("bigint").alias("registers_set"),
    )


# ---------------------------------------------------------------------
# Count-Min sketch (d x w counter grid, md5 rows, SUM-mergeable)
# ---------------------------------------------------------------------

#: mirror of the ``sketch_count_min_users`` oracle geometry
CMS_DEPTH = 4
CMS_WIDTH = 256

_CMS_BUCKET = (
    "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', k)), 1, 2), "
    "16, 10) AS INT)"
)


def cms_counter_rows(df: DataFrame, key_col: str) -> DataFrame:
    """Per-input ``(i, b, c)`` Count-Min counter deltas for
    ``key_col`` — the same d×w md5 grid as the batch
    ``sketch_count_min_users`` oracle.  Counters MERGE BY SUM, which
    is associative across batches/partitions/days but — unlike the
    HLL register max — NOT idempotent under replay: a re-delivered
    batch inflates every cell it touches, so a streaming maintainer
    MUST sit behind batch-id idempotence markers
    (``idempotent_foreach_batch``).  The replay-contrast test pins
    both facts."""
    keys = df.groupBy(
        F.col(key_col).cast("string").alias("k")
    ).agg(F.count("*").alias("n"))
    return (
        keys.select(
            "k", "n", F.explode(F.expr(f"sequence(1, {CMS_DEPTH})")).alias("i")
        )
        .withColumn("b", F.expr(_CMS_BUCKET))
        .groupBy("i", "b")
        .agg(F.sum("n").alias("c"))
    )


def cms_estimates(
    counters: DataFrame, keys: DataFrame, key_col: str = "k"
) -> DataFrame:
    """Point-frequency estimates from a (possibly merged) counter
    table: per key, min over the d row counters at its buckets.
    ``keys`` must carry ``(k string, exact_n)``; output
    ``(k, exact_n, cms_est)``."""
    buckets = (
        keys.select(
            "k",
            "exact_n",
            F.explode(F.expr(f"sequence(1, {CMS_DEPTH})")).alias("i"),
        )
        .withColumn("b", F.expr(_CMS_BUCKET))
    )
    return (
        buckets.join(F.broadcast(counters), ["i", "b"])
        .groupBy("k")
        .agg(
            F.min("exact_n").alias("exact_n"),
            F.min("c").alias("cms_est"),
        )
    )


def hll_estimate_by_group(regs: DataFrame, grp_col: str = "grp") -> DataFrame:
    """Per-group estimates from a sparse ``(grp, idx, m)`` register
    table: each group gets the full ``HLL_M``-register grid (empty
    registers count as rank 0), then the same exact-BIGINT harmonic
    estimate as :func:`hll_estimate_row`.  Output ``(grp, e, v,
    registers_set)``."""
    spark = regs.sparkSession
    grid = (
        regs.select(grp_col)
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(HLL_M).select(F.col("id").cast("int").alias("idx"))
            )
        )
    )
    full = grid.join(regs, [grp_col, "idx"], "left").select(
        grp_col, F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    agg = full.groupBy(grp_col).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - m)")).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = F.lit(_ALPHA) * HLL_M * HLL_M * F.lit(_POW2_49) / F.col("s").cast(
        "double"
    )
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(
        grp_col,
        corrected.alias("e"),
        F.col("v").cast("bigint").alias("v"),
        (F.lit(HLL_M) - F.col("v")).cast("bigint").alias("registers_set"),
    )
