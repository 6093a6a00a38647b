"""Pattern-mining / compression catalog entries (round 4, third pass):

GROUPING SETS subtotal lattice, market-basket brand affinity (support /
lift), BPE merge-candidate pair counting, per-key EWMA smoothing as a
deterministic fold (stateful-iterative per key without a UDF), and
product quantization of embeddings against a deterministic literal
codebook (the memory-compression leg of the ANN surface: 64 floats ->
8 nibble codes).

Registered into the same ``_CATALOG`` as ``query_catalog``; every
entry is value-checked against DuckDB.  Determinism rules follow the
``query_catalog`` module header: derived float ratios are floor-scaled
(``floor(x * 10000) / 10000`` — both engines compute bit-identical
doubles, and floor has no round-half knife edge), money sums use the
established ``round(.., 2)``, every LIMIT sits under a total order,
folds run left-to-right in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query_catalog import register, sql_query
from .sources.registry import load_table

# ---- shared constants (Spark impl and oracle MUST agree) -------------

BASKET_TOP = 20  # market-basket pairs kept (under a total order)
BPE_TOP = 30  # top adjacent-token pairs kept
EWMA_ALPHA = 0.2  # smoothing factor (literal in both SQL texts)
PQ_SUBSPACES = 8  # product quantization: 64 dims -> 8 subvectors
PQ_SUBDIM = 8  # dims per subvector
PQ_CENTROIDS = 16  # codebook size per subspace (4-bit codes)


# =====================================================================
# GROUPING SETS subtotal lattice (beyond the ROLLUP/CUBE entries —
# an arbitrary explicit set list with grouping() indicator columns)
# =====================================================================

_GROUPING_SETS_SQL = (
    # identical ANSI text in both engines.  One Expand + one hash
    # aggregate in Spark: the input is replicated once per grouping
    # set map-side and partially aggregated before the single shuffle,
    # so the exchange carries |groups|, not 4x the input.
    "SELECT coalesce(l_returnflag, '(all)') AS flag, "
    "coalesce(l_linestatus, '(all)') AS status, "
    "CAST(grouping(l_returnflag) AS INT) AS g_flag, "
    "CAST(grouping(l_linestatus) AS INT) AS g_status, "
    "CAST(count(*) AS BIGINT) AS n_rows, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem "
    "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), "
    "(l_returnflag), (l_linestatus), ())"
)

sql_query(
    "grouping_sets_revenue",
    _GROUPING_SETS_SQL,
    doc="Arbitrary GROUPING SETS subtotal lattice with grouping() "
    "indicator columns — the explicit-set general form of the rollup/"
    "cube entries (reference plans aggregate per partition column and "
    "per full table in separate passes; one Expand-based aggregation "
    "replaces both). Plans as a single Expand + partially-aggregated "
    "hash aggregate: one shuffle of |groups| rows at any scale.",
)


# =====================================================================
# Market-basket affinity: brand pairs co-occurring in an order
# =====================================================================


@register(
    "orders_market_basket",
    # support = orders containing both brands; lift = P(a,b)/(P(a)P(b)).
    "WITH ob AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem "
    "JOIN part ON l_partkey = p_partkey), "
    "bc AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY p_brand), "
    "tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob), "
    "pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, "
    "count(*) AS sup FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey "
    "AND a.p_brand < b.p_brand GROUP BY 1, 2) "
    "SELECT brand_a, brand_b, CAST(sup AS BIGINT) AS pair_orders, "
    "floor((CAST(sup AS DOUBLE) * n_orders) / "
    "(CAST(ca.c AS DOUBLE) * cb.c) * 10000) / 10000 AS lift "
    "FROM pairs, tot "
    "JOIN bc ca ON brand_a = ca.p_brand "
    "JOIN bc cb ON brand_b = cb.p_brand "
    "ORDER BY pair_orders DESC, brand_a, brand_b LIMIT 20",
    doc="Market-basket brand affinity: support count and lift for "
    "brand pairs co-occurring in an order. The pair generator is a "
    "self-equi-join of the DISTINCT (order, brand) table on the order "
    "key — per-order output is bounded by the basket size (max 13 "
    "distinct brands/order in the testdata; quadratic only in that "
    "small constant, linear in orders), and Catalyst reuses one "
    "exchange for both sides (ReusedExchange). Brand marginals (25 "
    "rows) and the order total (1 row) re-attach via broadcast joins; "
    "top-20 under the (pair_orders, brand_a, brand_b) total order is "
    "TakeOrderedAndProject. Lift is floor-scaled: identical double "
    "arithmetic both engines, no round-half knife edge.",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("sup"))
    )
    bc = ob.groupBy("p_brand").agg(F.count("*").alias("c"))
    tot = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ca = bc.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = bc.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("cb"))
    lift = (F.col("sup").cast("double") * F.col("n_orders")) / (
        F.col("ca").cast("double") * F.col("cb")
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("sup").cast("bigint").alias("pair_orders"),
            (F.floor(lift * 10000) / 10000).alias("lift"),
        )
        .orderBy(F.col("pair_orders").desc(), "brand_a", "brand_b")
        .limit(BASKET_TOP)
    )


# =====================================================================
# BPE merge-candidate pair counting (tokenizer-training first pass)
# =====================================================================

sql_query(
    "text_bpe_pair_counts",
    # adjacent-pair generation is a narrow per-row transform (explode
    # of a size-(n-1) array) followed by one partially-aggregated
    # count: the exchange carries |distinct pairs|, not |tokens|.
    # Space tokenization matches text_top_tokens; empty tokens from
    # runs of spaces are filtered identically in both engines.
    "WITH toks AS (SELECT filter(split(text, ' '), t -> t <> '') AS ts "
    "FROM documents), "
    "pairs AS (SELECT explode(transform(sequence(1, size(ts) - 1), "
    "i -> concat(ts[i-1], ' ', ts[i]))) AS pair FROM toks "
    "WHERE size(ts) >= 2) "
    "SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences FROM pairs "
    "GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 30",
    "WITH toks AS (SELECT list_filter(string_split(text, ' '), "
    "t -> t <> '') AS ts FROM documents), "
    "pairs AS (SELECT unnest(list_transform(range(1, len(ts)), "
    "i -> ts[i] || ' ' || ts[i+1])) AS pair FROM toks "
    "WHERE len(ts) >= 2) "
    "SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences FROM pairs "
    "GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 30",
    doc="BPE merge-candidate counting — the inner loop of tokenizer "
    "training: frequency of adjacent token pairs across the corpus, "
    "top-30 under the (count, pair) total order. One narrow explode + "
    "one map-side-combined count + TakeOrderedAndProject; at 100 TB "
    "the shuffle carries only the distinct-pair vocabulary.",
)


# =====================================================================
# Per-key EWMA as a deterministic fold (iterative state per key with
# no UDF — collect_list is bounded by per-key cardinality)
# =====================================================================

_EWMA_SPARK = (
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "floor(aggregate(transform(array_sort(collect_list(named_struct("
    "'e', unix_micros(CAST(ts AS TIMESTAMP)), 'i', event_id, "
    "'v', CAST(value AS DOUBLE)))), x -> x.v), CAST(NULL AS DOUBLE), "
    "(acc, x) -> CASE WHEN acc IS NULL THEN x "
    "ELSE CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc END) "
    "* 10000) / 10000 AS ewma_value "
    "FROM events WHERE value IS NOT NULL GROUP BY user_id"
)

_EWMA_DUCK = (
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "floor(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id), "
    "(acc, x) -> CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc) "
    "* 10000) / 10000 AS ewma_value "
    "FROM events WHERE value IS NOT NULL GROUP BY user_id"
)

sql_query(
    "events_user_ewma",
    _EWMA_SPARK,
    _EWMA_DUCK,
    doc="Exponentially-weighted moving average of event value per user "
    "— an inherently sequential recurrence (ewma_t = a*x_t + "
    "(1-a)*ewma_{t-1}) computed as a deterministic left-to-right "
    "aggregate() fold over the time-sorted per-key value list: "
    "iterative state per key with zero Python and one shuffle. "
    "Spark's null-init CASE fold and DuckDB's first-element-init "
    "list_reduce apply the identical operation sequence, so the "
    "doubles are bit-equal; the output is floor-scaled. State is "
    "bounded by per-key cardinality (~50 events/user at every test "
    "SF); the unbounded-stream form of the same recurrence lives in "
    "streaming/events.py (applyInPandasWithState).",
)


# =====================================================================
# Product quantization of embeddings (deterministic literal codebook)
# =====================================================================


def pq_codebook(subspaces: int, centroids: int, subdim: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random PQ codebook in [-0.5, 0.5).

    Entry (s, c, d) derives from ``md5("pq{s}:{c}:{d}")``'s first 8 hex
    chars — reproducible in any language/engine with no RNG state (the
    same scheme as ``operators.similarity.hyperplanes``).  A trained
    codebook (Lloyd's, as in ann_ivf_kmeans_topk) would minimize
    distortion; a fixed one exercises the identical assign/reconstruct
    plan shape, which is what the oracle can verify exactly.
    """
    out = []
    for s in range(subspaces):
        book = []
        for c in range(centroids):
            row = []
            for d in range(subdim):
                v = int(
                    hashlib.md5(f"pq{s}:{c}:{d}".encode()).hexdigest()[:8], 16
                )
                row.append(round(v / 2**32 - 0.5, 8))
            book.append(row)
        out.append(book)
    return out


def _pq_spark_sql() -> str:
    cb = pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM)
    dist_cols = []
    for s in range(PQ_SUBSPACES):
        book_lit = (
            "array("
            + ", ".join(
                "array(" + ", ".join(repr(x) + "D" for x in row) + ")"
                for row in cb[s]
            )
            + ")"
        )
        sub = f"slice(embedding, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        dist_cols.append(
            f"transform({book_lit}, cent -> aggregate(zip_with({sub}, cent, "
            f"(p, q) -> (CAST(p AS DOUBLE) - q) * (CAST(p AS DOUBLE) - q)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)) AS d{s}"
        )
    codes = ", ".join(
        f"CAST(array_position(d{s}, array_min(d{s})) AS STRING)"
        for s in range(PQ_SUBSPACES)
    )
    err = " + ".join(f"array_min(d{s})" for s in range(PQ_SUBSPACES))
    return (
        "SELECT vec_id, concat_ws(',', " + codes + ") AS codes, "
        f"floor(({err}) / {PQ_SUBSPACES * PQ_SUBDIM} * 10000) / 10000 AS mse "
        "FROM (SELECT vec_id, " + ", ".join(dist_cols) + " FROM embeddings)"
    )


def _pq_duck_sql() -> str:
    cb = pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM)
    dist_cols = []
    for s in range(PQ_SUBSPACES):
        book_lit = (
            "["
            + ", ".join(
                "[" + ", ".join(repr(x) for x in row) + "]" for row in cb[s]
            )
            + "]::DOUBLE[][]"
        )
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        sub = f"(embedding[{lo}:{hi}])"
        dist_cols.append(
            f"list_transform({book_lit}, cent -> list_reduce("
            f"list_transform(generate_series(1, {PQ_SUBDIM}), "
            f"i -> (CAST({sub}[i] AS DOUBLE) - cent[i]) * "
            f"(CAST({sub}[i] AS DOUBLE) - cent[i])), "
            f"(acc, v) -> acc + v)) AS d{s}"
        )
    codes = ", ".join(
        f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) AS VARCHAR)"
        for s in range(PQ_SUBSPACES)
    )
    err = " + ".join(
        f"list_aggregate(d{s}, 'min')" for s in range(PQ_SUBSPACES)
    )
    return (
        "SELECT vec_id, concat_ws(',', " + codes + ") AS codes, "
        f"floor(({err}) / {PQ_SUBSPACES * PQ_SUBDIM} * 10000) / 10000 AS mse "
        "FROM (SELECT vec_id, " + ", ".join(dist_cols) + " FROM embeddings)"
    )


@register(
    "embedding_pq_codes",
    _pq_duck_sql(),
    doc="Product quantization: each 64-d embedding split into 8 "
    "subvectors, each assigned (exact nearest, first-min tiebreak) to "
    "one of 16 deterministic codebook centroids — 256 bytes of floats "
    "compressed to 8 4-bit codes, the standard memory layout for "
    "billion-vector ANN re-ranking. Pure Column arithmetic (codebook "
    "ships as a plan literal, per-row work is a fixed 16x8 flops per "
    "subspace inside whole-stage codegen — zero shuffles, zero "
    "Python); per-vector reconstruction MSE emitted floor-scaled as "
    "the distortion readout. Codebook derivation is md5-seeded like "
    "operators.similarity.hyperplanes, so the DuckDB oracle "
    "reproduces it bit-exactly.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query_catalog import _sql

    return _sql(spark, sf_dir, _pq_spark_sql())
