"""Statistical / curation catalog entries (round 4 widening):

group-wise OLS regression, linear-interpolation gap fill, multi-touch
attribution (built on the bucketed range join), Johnson-Lindenstrauss
random projection of embeddings, length-blocked edit-distance near-dup
pairs, and a Gopher-style rule-based document quality filter.

Registered into the same ``_CATALOG`` as ``query_catalog``; every
entry is value-checked against DuckDB.  Determinism follows the
``query_catalog`` module rules: float aggregates rounded, ratios
floor-scaled (no decimal-tie ambiguity), identical left-to-right
double folds for vector math in both engines, timestamps never appear
raw in an output column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.temporal import epoch_us
from .functions.text import (
    GOPHER_DUCK_SQL as _GOPHER_DUCK,
    GOPHER_SPARK_SQL as _GOPHER_SPARK,
    QUALITY_STOPWORDS,
)
from .operators.similarity import hyperplanes, plane_dot_expr
from .operators.temporal import range_join_bucketed
from .query_catalog import register, sql_query
from .sources.registry import load_table

# ---- shared constants (Spark impl and oracle MUST agree) -------------

GAPFILL_USER_MOD = 50  # per-user grid kept span-bound: every 50th user
TOUCH_WINDOW_S = 1800  # view/click within 30 min before a purchase
RP_OUT_DIMS = 16  # 64-d -> 16-d Johnson-Lindenstrauss projection
ED_PREFIX = 64  # edit distance computed on this codepoint prefix
# typo-radius threshold.  r5 scale lesson: at tau=12 the length-block
# join alone was the candidate generator and went quadratic at sf1
# (122 s) — length buckets are a fixed-size domain, so bucket
# population grows linearly with the corpus.  tau=3 (the classic
# typo/near-identical radius) admits a PassJoin segment index
# (tau+1 = 4 segments, pigeonhole-exact) whose join key is a
# ~11-16-char substring — high-cardinality, buckets stay tiny at any
# corpus size.  On the test corpus family the output is unchanged
# (observed prefix distances are bimodal: 0 or >= 36).
ED_THRESH = 3
ED_SEGMENTS = ED_THRESH + 1
ED_BUCKET = 16  # n_chars blocking bucket width (>= ED_THRESH + 1, so
#                 the +-1-bucket probe admits every |len diff| <= thresh)




# =====================================================================
# Group-wise OLS regression (regr_* aggregates — identical ANSI text
# in both engines; single map-side-combinable aggregation)
# =====================================================================

sql_query(
    "stats_groupwise_regression",
    # one-pass moment aggregation per group: regr_* aggregates are
    # algebraic (sum/count/sum-of-products), so Spark computes partial
    # moments map-side and merges — no second pass over the data, one
    # shuffle of 3 tiny moment rows regardless of input size.
    "SELECT l_returnflag, "
    "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n, "
    "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
    "round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept, "
    "round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
    "round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty, "
    "round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price "
    "FROM lineitem GROUP BY l_returnflag",
    doc="Group-wise OLS regression (price ~ quantity per return flag) "
    "via the ANSI regr_* aggregate family — algebraic moments, so the "
    "plan is a single map-side-combined aggregation; both engines run "
    "the identical SQL text.",
)


# =====================================================================
# Linear-interpolation gap fill (the LOCF entry's numeric sibling)
# =====================================================================

_GAPFILL_SELECT = (
    "SELECT user_id, h, "
    "CASE WHEN v IS NOT NULL THEN 'obs' "
    "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp' "
    "ELSE 'edge' END AS src, "
    # floor-scaled, not round()ed: the lerp double is bit-identical in
    # both engines, and floor(x * 10000) is a pure double op with no
    # decimal-tie ambiguity (Spark's BigDecimal HALF_UP vs DuckDB's
    # multiply-round disagree on knife-edge .5 values).
    "floor(CASE WHEN v IS NOT NULL THEN v "
    "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
    "pv + (nv - pv) * (CAST(h - ph AS DOUBLE) / (nh - ph)) "
    "ELSE coalesce(pv, nv) END * 10000) / 10000 AS val_filled "
    "FROM w"
)


def _gapfill_linear_sql(epoch: str, gen: str, lastv: str, firstv: str) -> str:
    """Dialect-paramed gap-fill-with-lerp: ``epoch`` is the
    micros-since-epoch idiom, ``gen`` the grid generator expression,
    ``lastv``/``firstv`` the dialect's ignore-nulls window spellings."""
    return (
        "WITH k AS (SELECT user_id, "
        f"CAST(floor({epoch} / 3600000000) AS BIGINT) AS h, "
        "round(avg(value), 6) AS v FROM events "
        f"WHERE user_id % {GAPFILL_USER_MOD} = 0 GROUP BY 1, 2), "
        "bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM k GROUP BY 1), "
        f"grid AS (SELECT user_id, {gen} AS h FROM bounds), "
        "j AS (SELECT g.user_id, g.h, k.v FROM grid g "
        "LEFT JOIN k ON k.user_id = g.user_id AND k.h = g.h), "
        "w AS (SELECT user_id, h, v, "
        f"{lastv.format('v')} OVER wp AS pv, "
        f"{lastv.format('CASE WHEN v IS NOT NULL THEN h END')} OVER wp AS ph, "
        f"{firstv.format('v')} OVER wn AS nv, "
        f"{firstv.format('CASE WHEN v IS NOT NULL THEN h END')} OVER wn AS nh "
        "FROM j WINDOW "
        "wp AS (PARTITION BY user_id ORDER BY h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
        "wn AS (PARTITION BY user_id ORDER BY h "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " + _GAPFILL_SELECT
    )


sql_query(
    "events_gapfill_linear",
    # span-bound grid (explode(sequence) — zero-shuffle generator),
    # then ONE per-series ordered window computing both fill
    # directions; the lerp itself is pure rowwise arithmetic.
    _gapfill_linear_sql(
        "unix_micros(CAST(ts AS TIMESTAMP))",
        "explode(sequence(mn, mx))",
        "last_value({0}, true)",
        "first_value({0}, true)",
    ),
    _gapfill_linear_sql(
        "epoch_us(ts)",
        "unnest(generate_series(mn, mx))",
        "last_value({0} IGNORE NULLS)",
        "first_value({0} IGNORE NULLS)",
    ),
    doc="Time-series gap filling with LINEAR interpolation between the "
    "surrounding observations (sibling of events_gapfill_locf): hourly "
    "per-user grid via explode(sequence), ignore-nulls windows find the "
    "previous/next observed (value, position) pairs, then a rowwise "
    "lerp. Grid volume is span-bound; the fill is one per-series "
    "window pass over both frame directions.",
)


# =====================================================================
# Multi-touch attribution over the bucketed range join
# =====================================================================


def _duck_multitouch_sql() -> str:
    us = TOUCH_WINDOW_S * 1_000_000
    return f"""
WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pt, value
  FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id, epoch_us(ts) AS tt, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')),
m AS (SELECT p.pid, p.value, t.touch_type FROM p JOIN t
  ON p.user_id = t.user_id AND t.tt >= p.pt - {us} AND t.tt <= p.pt),
c AS (SELECT pid, value, touch_type,
  count(*) OVER (PARTITION BY pid) AS n FROM m)
SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
  CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
  round(sum(value / n), 4) AS credit
FROM c GROUP BY touch_type
"""


@register(
    "events_multitouch_attribution",
    _duck_multitouch_sql(),
    doc="Linear multi-touch attribution: each purchase's value is split "
    "evenly across the view/click touches of the same user in the 30 "
    "minutes before it. The touch<->purchase match runs through "
    "range_join_bucketed (time-bucketed equi-join, no per-key "
    "nested-loop range scan), so the plan stays linear in touches + "
    "purchases at any scale; the oracle states the same semantics as a "
    "plain BETWEEN join.",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = TOUCH_WINDOW_S * 1_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.timestamp_micros(epoch_us("ts") - us).alias("w_start"),
        F.timestamp_micros(epoch_us("ts")).alias("w_end"),
        "value",
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.timestamp_micros(epoch_us("ts")).alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    matched = range_join_bucketed(
        touches,
        purchases,
        on="user_id",
        point_ts="t_ts",
        start_ts="w_start",
        end_ts="w_end",
        bucket_s=TOUCH_WINDOW_S,
    )
    credited = matched.withColumn(
        "n", F.count("*").over(Window.partitionBy("pid"))
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.countDistinct("pid").cast("bigint").alias("n_purchases"),
        F.round(F.sum(F.col("value") / F.col("n")), 4).alias("credit"),
    )


# =====================================================================
# Johnson-Lindenstrauss random projection of embeddings
# =====================================================================

_RP_PLANES = hyperplanes(RP_OUT_DIMS, 64)
# JL scaling: hyperplane coefficients are uniform on [-1, 1) (variance
# 1/3), so E[||Px||^2] = d_out/3 * ||x||^2; scaling each component by
# sqrt(3/d_out) makes the projection norm-preserving in expectation
# (norm_ratio concentrates around 1). Same double literal both engines.
RP_SCALE = (3.0 / RP_OUT_DIMS) ** 0.5


def _duck_plane_dot(vec: str, row: list[float]) -> str:
    lit = "[" + ", ".join(repr(x) for x in row) + "]"
    return (
        f"list_reduce(list_transform(generate_series(1, len({vec})), "
        f"i -> CAST({vec}[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]), "
        f"(acc, v) -> acc + v)"
    )


def _duck_rp_sql() -> str:
    cols = ", ".join(
        f"round({_duck_plane_dot('embedding', row)} * {RP_SCALE!r}, 6) AS p{j:02d}"
        for j, row in enumerate(_RP_PLANES)
    )
    sq = " + ".join(f"p{j:02d} * p{j:02d}" for j in range(RP_OUT_DIMS))
    orig_norm = (
        "sqrt(list_reduce(list_transform(generate_series(1, len(embedding)), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), "
        "(acc, v) -> acc + v))"
    )
    return (
        f"WITH proj AS (SELECT vec_id, {cols}, {orig_norm} AS onorm FROM embeddings) "
        f"SELECT vec_id, "
        + ", ".join(f"p{j:02d}" for j in range(RP_OUT_DIMS))
        + f", floor(sqrt({sq}) / onorm * 10000) / 10000 AS norm_ratio FROM proj"
    )


@register(
    "embedding_random_projection",
    _duck_rp_sql(),
    doc="Johnson-Lindenstrauss dimensionality reduction: 64-d float "
    f"embeddings projected to {RP_OUT_DIMS}-d with the deterministic "
    "md5-seeded hyperplane matrix (same coefficients both engines, "
    "left-to-right double folds — bit-reproducible), scaled by "
    "sqrt(3/d_out) so the projection is norm-preserving in "
    "expectation. norm_ratio reports per-vector norm preservation, "
    "the JL quality signal. "
    "Rowwise map, zero shuffles; the matrix is a plan literal, so at "
    "cluster scale it ships inside the serialized plan, not as data.",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "embeddings")
    proj_cols = [
        F.expr(
            f"round({plane_dot_expr('embedding', row)} * {RP_SCALE!r}D, 6)"
        ).alias(f"p{j:02d}")
        for j, row in enumerate(_RP_PLANES)
    ]
    onorm = F.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (p, q) -> "
        "CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), "
        "(acc, v) -> acc + v))"
    )
    proj = df.select("vec_id", *proj_cols, onorm.alias("onorm"))
    sq = " + ".join(f"p{j:02d} * p{j:02d}" for j in range(RP_OUT_DIMS))
    return proj.select(
        "vec_id",
        *[f"p{j:02d}" for j in range(RP_OUT_DIMS)],
        F.expr(f"floor(sqrt({sq}) / onorm * 10000) / 10000").alias("norm_ratio"),
    )


# =====================================================================
# Length-blocked edit-distance near-dup pairs
# =====================================================================


def _duck_edit_distance_sql(tau: int) -> str:
    return f"""
WITH d AS (SELECT doc_id, lang,
  substring(text, 1, {ED_PREFIX}) AS prefix,
  CAST(floor(n_chars / {ED_BUCKET}) AS BIGINT) AS b FROM documents)
SELECT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b, a.lang,
  CAST(levenshtein(a.prefix, c.prefix) AS BIGINT) AS edit_distance
FROM d a JOIN d c
  ON a.lang = c.lang AND abs(a.b - c.b) <= 1 AND a.doc_id < c.doc_id
WHERE levenshtein(a.prefix, c.prefix) <= {tau}
"""


def _edit_distance_entry(tau: int):
    """tau-parameterized edit-distance entry (r5 advice: tau is part of
    the entry's contract, not a hidden constant — the PassJoin segment
    index is exact for ANY tau, the registered values just pick the
    semantics: 3 = typo radius, 12 = the original wide near-dup
    radius).  Cost scales as (tau+1) segments x (4*tau+1) window
    shifts, still an equi-join on corpus-growing substring keys."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .operators.dedup import prefix_edit_distance_pairs

        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            F.expr(f"substring(text, 1, {ED_PREFIX})").alias("prefix"),
            F.floor(F.col("n_chars") / ED_BUCKET).alias("b"),
        )
        return prefix_edit_distance_pairs(d, tau=tau, bucket_radius=1)

    return q


_ED_DOC = (
    "Edit-distance near-dup pairs (prefix Levenshtein <= {tau}) via a "
    f"PassJoin segment index: each {ED_PREFIX}-codepoint prefix splits "
    "into tau+1 near-equal segments; pigeonhole guarantees a "
    "qualifying pair shares one segment verbatim (start shift <= "
    "2*tau), so candidates come from an equi-join on substring keys — "
    "cardinality grows WITH the corpus, so buckets stay tiny at any "
    "scale (the length-block-only join this replaces was quadratic: "
    "fixed bucket domain). Length blocking (bucket diff <= 1) and "
    "banded 3-arg Levenshtein verify exactly. The oracle is the direct "
    "quadratic statement of the same predicate — parity doubles as the "
    "no-false-negative proof for the segment index at this tau."
)

dedup_edit_distance_pairs = register(
    "dedup_edit_distance_pairs",
    _duck_edit_distance_sql(ED_THRESH),
    doc=_ED_DOC.format(tau=ED_THRESH),
)(_edit_distance_entry(ED_THRESH))

# the pre-r5 wide radius, kept as its own first-class entry so corpora
# with mid-range distances (4..12) don't silently lose pairs to the
# tau=3 default (r5 advice)
dedup_edit_distance_pairs_tau12 = register(
    "dedup_edit_distance_pairs_tau12",
    _duck_edit_distance_sql(12),
    doc=_ED_DOC.format(tau=12),
)(_edit_distance_entry(12))


# =====================================================================
# Gopher-style rule-based quality filter
# =====================================================================


# moved to functions/text.py (cycle-free shared home): importing
# this module directly must never re-enter query_catalog_corpus's
# registration-time oracle build (SURVEY r8 import-cycle class)


# =====================================================================
# Event-path mining (trigram sequences per user)
# =====================================================================


def _paths_sql() -> str:
    return (
        "WITH s AS (SELECT user_id, event_type AS e1, "
        "lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3 "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT concat(e1, '>', e2, '>', e3) AS path, "
        "CAST(count(*) AS BIGINT) AS n FROM s "
        "WHERE e2 IS NOT NULL AND e3 IS NOT NULL "
        "GROUP BY 1 ORDER BY n DESC, path LIMIT 20"
    )


sql_query(
    "events_top_paths",
    # one per-user ordered window builds the trigrams (lead x2 shares
    # the single sort), then a plain count/top-k; total order under the
    # LIMIT via the (n DESC, path) tiebreak.
    _paths_sql(),
    _paths_sql(),
    doc="Behavioral path mining: the 20 most common 3-step event-type "
    "sequences across user timelines (transition-matrix's trigram "
    "sibling). One per-user window sort feeds both lead() offsets; the "
    "aggregation is map-side combinable on the path string.",
)


# =====================================================================
# Partition-skew diagnostics (the salting decision input)
# =====================================================================


def _skew_sql(pct: str) -> str:
    return (
        "WITH k AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_keys, "
        "CAST(min(n) AS BIGINT) AS min_rows, "
        "CAST(max(n) AS BIGINT) AS max_rows, "
        "round(avg(n), 4) AS avg_rows, "
        f"round({pct.format('n', '0.5')}, 4) AS p50_rows, "
        f"round({pct.format('n', '0.99')}, 4) AS p99_rows, "
        "round(CAST(max(n) AS DOUBLE) / avg(n), 4) AS skew_ratio "
        "FROM k"
    )


sql_query(
    "skew_key_diagnostics",
    _skew_sql("percentile({0}, {1})"),
    _skew_sql("quantile_cont({0}, {1})"),
    doc="Join-key skew diagnostics over orders.o_custkey: per-key row "
    "counts reduced to min/max/avg/p50/p99 and the max/avg skew ratio "
    "— the measurement that decides whether a join needs salting or "
    "AQE skew splitting. Two cheap aggregations (keys, then 1-row "
    "stats); the heavy first groupBy is map-side combinable.",
)


# =====================================================================
# Iterative PageRank over the nation-to-nation trade graph
# =====================================================================

PR_DAMPING = 0.85
PR_ITERS = 5
PR_ROUND = 8  # per-iteration rounding keeps cross-engine sum-order
#               drift (~1e-12 relative) far below the emitted precision


def _duck_pagerank_sql() -> str:
    """PageRank unrolled into chained CTEs (the kmeans-IVF precedent:
    a fixed iteration count makes the loop a straight-line query)."""
    edges = """
edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1, 2),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
e AS (SELECT src, dst, w / ow AS p FROM edges JOIN outw USING (src)),
nodes AS (SELECT n_name AS node FROM nation),
nn AS (SELECT count(*) AS n FROM nodes),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    ctes = [edges]
    for t in range(1, PR_ITERS + 1):
        prev = f"pr{t - 1}"
        ctes.append(
            f"""c{t} AS (SELECT e.dst, sum(e.p * p.pr) AS acc
  FROM e JOIN {prev} p ON e.src = p.node GROUP BY e.dst),
pr{t} AS (SELECT n.node,
  round({1 - PR_DAMPING} / (SELECT n FROM nn)
    + {PR_DAMPING} * coalesce(c.acc, 0), {PR_ROUND}) AS pr
  FROM nodes n LEFT JOIN c{t} c ON n.node = c.dst)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM pr{PR_ITERS}"
    )


@register(
    "trade_pagerank_nations",
    _duck_pagerank_sql(),
    doc="Iterative weighted PageRank over the customer-nation -> "
    f"supplier-nation trade graph (damping {PR_DAMPING}, {PR_ITERS} "
    "fixed iterations): edge weight = revenue share of the source "
    "nation's outbound trade. The Spark loop re-joins the 25-row rank "
    "frame against the edge frame per iteration (both broadcast-small; "
    "at a billion-edge scale the same loop shape holds with the rank "
    "frame shuffled on node id). Per-iteration rounding keeps "
    "cross-engine float-sum ordering drift below emitted precision; "
    "oracle = the identical recursion unrolled into chained CTEs.",
)
def trade_pagerank_nations(
    spark: SparkSession, sf_dir: str, ledger=None
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    cn = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("src")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("c_nkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("s_nkey"))
        .groupBy("src", "dst")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("w")
        )
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    nodes = nation.select(F.col("n_name").alias("node"))
    n_nodes = nodes.count()  # control-plane scalar (25 rows)

    e = e.persist()
    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    deltas: list[float] = []
    for _ in range(PR_ITERS):
        contrib = (
            e.join(pr, e.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("acc"))
        )
        new_pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            F.round(
                F.lit((1 - PR_DAMPING) / n_nodes)
                + PR_DAMPING * F.coalesce("acc", F.lit(0.0)),
                PR_ROUND,
            ).alias("pr"),
        )
        if ledger is not None:
            # Cut lineage each round (same pattern as
            # connected_components): without it, every per-round delta
            # collect() re-executes all prior rounds from scratch —
            # O(iters^2) total work (r5 review finding).
            new_pr = new_pr.localCheckpoint()
            # L1 rank movement this round — a node-count-sized join of
            # two broadcast-small rank frames, only materialized when a
            # ledger asks for observability (never on the benched path).
            deltas.append(
                new_pr.join(
                    pr.withColumnRenamed("pr", "_prev"), "node"
                )
                .agg(F.sum(F.abs(F.col("pr") - F.col("_prev"))))
                .collect()[0][0]
            )
        pr = new_pr
    if ledger is not None:
        ledger.record_iterations(
            "trade_pagerank_nations",
            rounds=PR_ITERS,
            max_rounds=PR_ITERS,
            # fixed-iteration scheme: "converged" = final-round rank
            # movement below the emitted rounding precision
            converged=bool(deltas) and deltas[-1] <= 10 ** -PR_ROUND,
            deltas=deltas,
        )
    return pr


sql_query(
    "text_gopher_quality_filter",
    _GOPHER_SPARK,
    _GOPHER_DUCK,
    doc="Gopher-style rule-based document quality filter: word-count "
    "range, mean word length, symbol-to-word ratio, alphabetic-word "
    "ratio, and distinct-stopword presence, each emitted as a named "
    "boolean flag plus the composite keep decision. Pure rowwise "
    "Catalyst expressions (array lambdas, no UDF), zero shuffles; the "
    "per-rule flags make filter-rate monitoring a trivial downstream "
    "aggregation.",
)


# =====================================================================
# Welch's two-sample t-test (A/B experiment readout)
# =====================================================================

sql_query(
    "events_ab_test_welch",
    # one aggregation computes both arms via FILTER; Welch's t and the
    # Welch-Satterthwaite df are pure scalar arithmetic on the moments.
    "WITH g AS (SELECT "
    "count(*) FILTER (WHERE event_type = 'click') AS n_a, "
    "avg(value) FILTER (WHERE event_type = 'click') AS mean_a, "
    "var_samp(value) FILTER (WHERE event_type = 'click') AS var_a, "
    "count(*) FILTER (WHERE event_type = 'view') AS n_b, "
    "avg(value) FILTER (WHERE event_type = 'view') AS mean_b, "
    "var_samp(value) FILTER (WHERE event_type = 'view') AS var_b "
    "FROM events WHERE event_type IN ('click', 'view') "
    "AND value IS NOT NULL) "
    "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
    "floor(mean_a * 10000) / 10000 AS mean_a, "
    "floor(mean_b * 10000) / 10000 AS mean_b, "
    "floor((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) "
    "* 10000) / 10000 AS welch_t, "
    "floor(pow(var_a / n_a + var_b / n_b, 2) / "
    "(pow(var_a / n_a, 2) / (n_a - 1) + pow(var_b / n_b, 2) / (n_b - 1)) "
    "* 100) / 100 AS welch_df "
    "FROM g",
    doc="Welch's unequal-variance two-sample t-test between the "
    "'click' and 'view' arms of the event stream: one FILTER-pivoted "
    "aggregation produces n/mean/var for both arms (count/avg/var_samp "
    "are all algebraic — map-side partials, a single exchange of one "
    "moment row), then the t statistic and Welch-Satterthwaite df are "
    "scalar arithmetic on that row. The A/B-readout shape for 100 TB "
    "of events: no per-arm scan, no join, one shuffle of O(1) rows. "
    "Identical ANSI text in both engines; moments floor-scaled.",
)


# =====================================================================
# Benford first-digit distribution (data-quality / fraud screen)
# =====================================================================

sql_query(
    "dq_benford_amounts",
    # observed share via a window total (no 1-row cross join); expected
    # share is log10(1 + 1/d); per-digit chi-square contribution rides
    # along so sum(chi2_part) is the test statistic downstream.
    "WITH d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) "
    "AS BIGINT) AS STRING), 1, 1) AS INT) AS digit FROM orders "
    "WHERE o_totalprice >= 1), "
    "obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit) "
    "SELECT digit, CAST(n AS BIGINT) AS n, "
    "floor(n / CAST(sum(n) OVER () AS DOUBLE) * 1000000) / 1000000 "
    "AS observed_p, "
    "floor(log10(1.0 + 1.0 / digit) * 1000000) / 1000000 AS benford_p, "
    "floor(CAST(sum(n) OVER () AS DOUBLE) * "
    "pow(n / CAST(sum(n) OVER () AS DOUBLE) - log10(1.0 + 1.0 / digit), 2) "
    "/ log10(1.0 + 1.0 / digit) * 1000000) / 1000000 AS chi2_part "
    "FROM obs ORDER BY digit",
    doc="Benford's-law first-digit screen over order amounts: digit "
    "extraction is rowwise string arithmetic, the distribution is one "
    "9-group aggregation (map-side combined), and the corpus total "
    "comes from an unpartitioned window over those 9 rows — no 1-row "
    "cross join, no second scan. Expected shares are log10(1+1/d); "
    "each digit carries its chi-square contribution so the full test "
    "statistic is a trivial downstream sum. The classic ledger-fraud / "
    "synthetic-data smell test at any scale: cost is one count-by-digit "
    "shuffle of 9 rows.",
)


# =====================================================================
# Time-weighted average price (TWAP) per event type
# =====================================================================

_TWAP_TMPL = (
    "WITH seq AS (SELECT event_type, value, {epoch} AS es, "
    "lead({epoch}) OVER (PARTITION BY event_type "
    "ORDER BY ts, event_id) AS next_es "
    "FROM events WHERE value IS NOT NULL) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals, "
    "floor(sum(value * (next_es - es) / 1000000.0) / "
    "sum((next_es - es) / 1000000.0) * 10000) / 10000 AS twap, "
    "floor(avg(value) * 10000) / 10000 AS plain_avg "
    "FROM seq WHERE next_es IS NOT NULL AND next_es > es "
    "GROUP BY event_type ORDER BY event_type"
)

sql_query(
    "events_twap_hourly",
    _TWAP_TMPL.format(epoch="unix_micros(CAST(ts AS TIMESTAMP))"),
    _TWAP_TMPL.format(epoch="epoch_us(ts)"),
    doc="Time-weighted average value per event type: each observation "
    "is weighted by how long it was the 'current' value (gap to the "
    "next event via lead() under a unique (ts, event_id) order), the "
    "estimator finance tickers and metrics pipelines use instead of "
    "the sampling-rate-biased plain mean (plain_avg rides along to "
    "show the gap). One window sort per event-type partition feeds "
    "both lead() and the final keyed aggregation — a single shuffle "
    "on the grouping key. NTZ-safe epoch idiom on the Spark side "
    "(unix_micros over an explicit TIMESTAMP cast; the session TZ is "
    "pinned UTC), DuckDB's epoch_us in the oracle.",
)


# =====================================================================
# AUC of a rowwise quality score (Mann-Whitney rank-sum form)
# =====================================================================

_AUC_TMPL = (
    "WITH scored AS (SELECT "
    "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, "
    "floor(CAST(length({alpha}) AS DOUBLE) / length(text) * 10000) "
    "/ 10000 AS score "
    "FROM documents WHERE length(text) > 0), "
    "agg AS (SELECT score, sum(pos) AS np, count(*) AS n "
    "FROM scored GROUP BY score), "
    "w AS (SELECT np, n, COALESCE(sum(n) OVER (ORDER BY score "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below "
    "FROM agg) "
    "SELECT CAST(sum(np) AS BIGINT) AS n_pos, "
    "CAST(sum(n) - sum(np) AS BIGINT) AS n_neg, "
    "floor((sum(np * (below + (n + 1) / 2.0)) "
    "- sum(np) * (sum(np) + 1) / 2.0) "
    "/ (CAST(sum(np) AS DOUBLE) * (sum(n) - sum(np))) "
    "* 1000000) / 1000000 AS auc "
    "FROM w"
)

sql_query(
    "quality_score_auc",
    _AUC_TMPL.format(alpha="regexp_replace(text, '[^a-zA-Z]', '')"),
    _AUC_TMPL.format(alpha="regexp_replace(text, '[^a-zA-Z]', '', 'g')"),
    doc="AUC of the alphabetic-character-ratio quality score as a "
    "predictor of lang='en', in the Mann-Whitney rank-sum form with "
    "midrank tie handling. Scale shape: the score is discretized "
    "(floor at 1e-4), so ranks come from a groupBy over at most 10001 "
    "distinct scores followed by a cumulative window on that tiny "
    "aggregate — never a global sort of the corpus. Midranks make the "
    "result independent of tie order; every sum is cast before the "
    "final ratio so both engines emit the same dtypes (DuckDB "
    "sum(BIGINT) would otherwise widen to HUGEINT). The "
    "classifier-evaluation readout for quality-model gating at corpus "
    "scale.",
)


# =====================================================================
# Day-of-week seasonality index
# =====================================================================

_SEASON_TMPL = (
    "WITH g AS (SELECT CAST({dow} AS INT) AS dow, count(*) AS n, "
    "avg(value) AS avg_v FROM events WHERE value IS NOT NULL "
    "GROUP BY CAST({dow} AS INT)) "
    "SELECT dow, CAST(n AS BIGINT) AS n, "
    "floor(avg_v * 10000) / 10000 AS avg_value, "
    "floor(avg_v / (sum(avg_v * n) OVER () / sum(n) OVER ()) "
    "* 10000) / 10000 AS seasonal_index "
    "FROM g ORDER BY dow"
)

sql_query(
    "events_seasonality_dow",
    _SEASON_TMPL.format(dow="dayofweek(CAST(ts AS TIMESTAMP)) - 1"),
    _SEASON_TMPL.format(dow="dayofweek(ts)"),
    doc="Day-of-week seasonality index over event values: per-dow "
    "mean relative to the overall mean (recomposed exactly as "
    "sum(avg*n)/sum(n) via an unpartitioned window over the 7-row "
    "aggregate — no second scan, no 1-row cross join). The "
    "multiplicative seasonal-adjustment factor feeding forecast "
    "baselines and anomaly thresholds; one 7-group map-side-combined "
    "aggregation at any scale. Dialect note: Spark's dayofweek is "
    "1-based Sunday, DuckDB's 0-based — the Spark text shifts by one "
    "so both emit 0=Sunday.",
)


# =====================================================================
# Holt linear-trend double exponential smoothing (tuple-state fold)
# =====================================================================

sql_query(
    "events_holt_trend",
    # Spark: left-to-right aggregate() fold with named_struct state.
    "WITH vals AS (SELECT user_id, "
    "slice(transform(array_sort(collect_list(named_struct("
    "'e', unix_micros(CAST(ts AS TIMESTAMP)), 'i', event_id, "
    "'v', CAST(value AS DOUBLE)))), x -> x.v), 1, 20) AS vs "
    "FROM events WHERE value IS NOT NULL GROUP BY user_id), "
    "f AS (SELECT user_id, size(vs) AS n, "
    "aggregate(vs, "
    "named_struct('l', CAST(NULL AS DOUBLE), 't', CAST(0.0 AS DOUBLE)), "
    "(acc, x) -> CASE WHEN acc.l IS NULL "
    "THEN named_struct('l', x, 't', CAST(0.0 AS DOUBLE)) "
    "ELSE named_struct("
    "'l', 0.3 * x + 0.7 * (acc.l + acc.t), "
    "'t', 0.2 * ((0.3 * x + 0.7 * (acc.l + acc.t)) - acc.l) "
    "+ 0.8 * acc.t) END) AS st FROM vals) "
    "SELECT user_id, CAST(n AS BIGINT) AS n_used, "
    "floor(st.l * 10000) / 10000 AS level, "
    "floor(st.t * 10000) / 10000 AS trend, "
    "floor((st.l + 3 * st.t) * 10000) / 10000 AS forecast_3 "
    "FROM f ORDER BY user_id",
    # DuckDB 1.0's list_reduce is 2-arg (no struct init), so the
    # oracle unrolls the same left-to-right recurrence as a recursive
    # CTE over the value-list index — identical operation order,
    # bit-equal doubles.
    "WITH RECURSIVE arr AS (SELECT user_id, "
    "list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs "
    "FROM events WHERE value IS NOT NULL GROUP BY user_id), "
    "lim AS (SELECT user_id, vs[1:20] AS vs, least(len(vs), 20) AS n "
    "FROM arr), "
    "f(user_id, i, n, l, t) AS ("
    "SELECT user_id, 1, n, vs[1], CAST(0.0 AS DOUBLE) FROM lim "
    "UNION ALL "
    "SELECT f.user_id, f.i + 1, f.n, "
    "0.3 * lim.vs[f.i + 1] + 0.7 * (f.l + f.t), "
    "0.2 * ((0.3 * lim.vs[f.i + 1] + 0.7 * (f.l + f.t)) - f.l) "
    "+ 0.8 * f.t "
    "FROM f JOIN lim ON f.user_id = lim.user_id WHERE f.i < f.n) "
    "SELECT user_id, CAST(n AS BIGINT) AS n_used, "
    "floor(l * 10000) / 10000 AS level, "
    "floor(t * 10000) / 10000 AS trend, "
    "floor((l + 3 * t) * 10000) / 10000 AS forecast_3 "
    "FROM f WHERE i = n ORDER BY user_id",
    doc="Holt double exponential smoothing (level + trend coupled "
    "recurrence, alpha=0.3 / beta=0.2) folded over each user's first "
    "20 time-ordered values, emitting the smoothed level, trend, and "
    "3-step-ahead forecast — the next forecasting baseline above the "
    "single-state EWMA entry. The Spark side is a left-to-right "
    "aggregate() fold with named_struct tuple state (zero Python, "
    "one shuffle); the DuckDB oracle unrolls the identical operation "
    "order as a depth-bounded recursive CTE (2-arg list_reduce can't "
    "seed struct state), so every double matches bit-for-bit. "
    "Dialect gotchas recorded: DuckDB types a bare 0.0 anchor column "
    "DECIMAL(2,1) — recursive numeric anchors need explicit DOUBLE "
    "casts.",
)


# =====================================================================
# Delete-group jackknife confidence interval (RNG-free resampling)
# =====================================================================

_JK_TMPL = (
    "WITH b AS (SELECT {bucket} AS bk, sum(o_totalprice) AS s, "
    "count(*) AS n FROM orders GROUP BY {bucket}), "
    "t AS (SELECT bk, s, n, sum(s) OVER () AS ts, sum(n) OVER () AS tn "
    "FROM b), "
    "j AS (SELECT bk, (ts - s) / (tn - n) AS theta, ts, tn FROM t), "
    "a AS (SELECT count(*) AS nb, avg(theta) AS tbar, "
    "sum(theta * theta) AS t2, max(ts) AS ts, max(tn) AS tn FROM j) "
    "SELECT CAST(nb AS BIGINT) AS n_buckets, "
    "floor(ts / tn * 10000) / 10000 AS mean_price, "
    "floor(sqrt((nb - 1.0) / nb * (t2 - nb * tbar * tbar)) * 10000) "
    "/ 10000 AS jackknife_se, "
    "floor((ts / tn - 1.96 * sqrt((nb - 1.0) / nb * "
    "(t2 - nb * tbar * tbar))) * 10000) / 10000 AS ci_lo, "
    "floor((ts / tn + 1.96 * sqrt((nb - 1.0) / nb * "
    "(t2 - nb * tbar * tbar))) * 10000) / 10000 AS ci_hi "
    "FROM a"
)

_JK_BUCKET_SPARK = (
    "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 2), 16, 10) "
    "AS INT) % 20"
)
_JK_BUCKET_DUCK = (
    "((strpos('0123456789abcdef', "
    "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', "
    "substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1)) % 20"
)

sql_query(
    "stats_jackknife_ci",
    _JK_TMPL.format(bucket=_JK_BUCKET_SPARK),
    _JK_TMPL.format(bucket=_JK_BUCKET_DUCK),
    doc="Delete-group jackknife confidence interval for the mean order "
    "price: rows split into 20 deterministic md5 buckets (RNG-free — "
    "reproducible across engines, runs, and retries, unlike seeded "
    "sampling), leave-one-bucket-out means computed from per-bucket "
    "(sum, count) partials, and the jackknife variance "
    "(B-1)/B * sum((theta_i - theta_bar)^2) read off their moments. "
    "The uncertainty-quantification shape for any pipeline metric at "
    "100 TB: ONE bucket-keyed aggregation (20 groups, map-side "
    "combined) plus windows over 20 rows — resampling without a "
    "second data pass.",
)


# =====================================================================
# Weighted percentiles (cumulative-weight window selection)
# =====================================================================

sql_query(
    "stats_weighted_median_price",
    # identical ANSI text: per-group weighted median / p90 of unit
    # price, weighted by quantity — first value whose cumulative
    # weight reaches the target fraction of total weight, under a
    # unique (price, orderkey, linenumber) total order.
    "WITH w AS (SELECT l_returnflag, l_extendedprice AS price, "
    "l_quantity AS wt, "
    "sum(l_quantity) OVER (PARTITION BY l_returnflag "
    "ORDER BY l_extendedprice, l_orderkey, l_linenumber "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw, "
    "sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw "
    "FROM lineitem) "
    "SELECT l_returnflag, "
    "round(min(CASE WHEN cw >= 0.5 * tw THEN price END), 2) "
    "AS weighted_median, "
    "round(min(CASE WHEN cw >= 0.9 * tw THEN price END), 2) "
    "AS weighted_p90, "
    "CAST(max(tw) AS DOUBLE) AS total_weight "
    "FROM w GROUP BY l_returnflag ORDER BY l_returnflag",
    doc="Weighted percentiles — quantity-weighted median and p90 of "
    "unit price per return flag: cumulative weight along a unique "
    "(price, orderkey, linenumber) total order, then the first value "
    "whose cumulative weight reaches the target fraction. The "
    "estimator exact percentile_cont cannot express (its every-row- "
    "equal weighting misprices skewed baskets); one window sort per "
    "group partition feeds both cut points. At 100 TB the same "
    "selection runs on a pre-aggregated (price, sum-weight) table — "
    "cardinality |distinct prices|, not |rows| — the same "
    "discretize-then-window trick as the AUC entry.",
)


# =====================================================================
# Kaplan-Meier survival curve (right-censored engagement lifetimes)
# =====================================================================

_KM_TMPL = (
    "WITH ut AS (SELECT user_id, event_type, min({e}) AS fe, "
    "max({e}) AS le FROM events GROUP BY user_id, event_type), "
    "uu AS (SELECT user_id, max({e}) AS ue FROM events "
    "GROUP BY user_id), "
    "life AS (SELECT CAST(floor((le - fe) / 86400000000.0) AS INT) "
    "AS t, CASE WHEN le < ue THEN 1 ELSE 0 END AS death "
    "FROM ut JOIN uu ON ut.user_id = uu.user_id), "
    "pts AS (SELECT t, sum(death) AS d, count(*) AS ev FROM life "
    "GROUP BY t), "
    "risk AS (SELECT t, d, "
    "(SELECT count(*) FROM life) - COALESCE(sum(ev) OVER (ORDER BY t "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk "
    "FROM pts) "
    "SELECT t AS lifetime_days, CAST(d AS BIGINT) AS deaths, "
    "CAST(n_risk AS BIGINT) AS at_risk, "
    "floor(exp(sum(ln(1 - CAST(d AS DOUBLE) / n_risk)) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
    "* 1000000) / 1000000 AS survival "
    "FROM risk WHERE d > 0 ORDER BY t"
)

sql_query(
    "events_survival_km",
    _KM_TMPL.format(e="unix_micros(CAST(ts AS TIMESTAMP))"),
    _KM_TMPL.format(e="epoch_us(ts)"),
    doc="Kaplan-Meier survival curve over right-censored engagement "
    "lifetimes: a (user, event_type) subject 'dies' when the user "
    "remains active in other types after that type's last event, and "
    "is CENSORED when that type's last event ties the user's overall "
    "last (still engaged at observation end) — genuine mixed "
    "censoring, the thing that separates KM from a plain empirical "
    "CDF. The product-limit estimator runs as exp(cumulative sum of "
    "ln(1 - d/n)) over the per-timepoint death/at-risk table — "
    "windows touch |distinct lifetimes| rows, never the event "
    "stream; at-risk counts come from one cumulative window over the "
    "same tiny table. Churn/retention modeling beyond fixed-horizon "
    "cohort triangles.",
)


# =====================================================================
# Gini coefficient / Lorenz concentration readout
# =====================================================================

_GINI_ORACLE = (
    "WITH cr AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev "
    "FROM orders GROUP BY o_custkey), "
    "r AS (SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) "
    "AS i, count(*) OVER () AS n, sum(rev) OVER () AS tot FROM cr) "
    "SELECT CAST(max(n) AS BIGINT) AS n_customers, "
    "floor((2.0 * sum(i * rev) / (max(n) * max(tot)) "
    "- (max(n) + 1.0) / max(n)) * 1000000) / 1000000 AS gini, "
    "floor(sum(CASE WHEN i <= 0.5 * n THEN rev ELSE 0 END) "
    "/ max(tot) * 10000) / 10000 AS bottom_half_share, "
    "floor(sum(CASE WHEN i > 0.9 * n THEN rev ELSE 0 END) "
    "/ max(tot) * 10000) / 10000 AS top_decile_share "
    "FROM r"
)


@register(
    "orders_gini_concentration",
    _GINI_ORACLE,
    doc="Gini coefficient of revenue concentration via the "
    "rank-weighted identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n "
    "over per-customer revenue ranked under a unique (rev, custkey) "
    "order, with Lorenz tail shares (bottom-half, top-decile) riding "
    "along — the inequality readout next to the Pareto 80/20 entry. "
    "Revenue aggregates per key first (map-side combined); the rank "
    "comes from operators.layout.global_row_number (range partitions "
    "+ per-partition windows + O(partitions) offsets — bit-identical "
    "to the oracle's global row_number with no single-task funnel "
    "over the |customers|-cardinality frame); per-key revenue is "
    "rounded before ranking for an engine-stable order.",
)
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.layout import global_row_number

    cr = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    r = global_row_number(cr, ["rev", "o_custkey"], out="i")
    tot = r.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").alias("tot")
    )
    return (
        r.join(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            (
                F.floor(
                    (
                        2.0 * F.sum(F.col("i") * F.col("rev"))
                        / (F.max("n") * F.max("tot"))
                        - (F.max("n") + 1.0) / F.max("n")
                    )
                    * 1e6
                )
                / 1e6
            ).alias("gini"),
            (
                F.floor(
                    F.sum(
                        F.when(
                            F.col("i") <= 0.5 * F.col("n"), F.col("rev")
                        ).otherwise(0.0)
                    )
                    / F.max("tot")
                    * 1e4
                )
                / 1e4
            ).alias("bottom_half_share"),
            (
                F.floor(
                    F.sum(
                        F.when(
                            F.col("i") > 0.9 * F.col("n"), F.col("rev")
                        ).otherwise(0.0)
                    )
                    / F.max("tot")
                    * 1e4
                )
                / 1e4
            ).alias("top_decile_share"),
        )
    )


# =====================================================================
# Seasonally-adjusted robust anomaly detection (composition entry)
# =====================================================================

_SMAD_TMPL = (
    "WITH g AS (SELECT CAST({dow} AS INT) AS dow, count(*) AS n, "
    "avg(value) AS avg_v FROM events WHERE value IS NOT NULL "
    "GROUP BY CAST({dow} AS INT)), "
    "idx AS (SELECT dow, avg_v / (sum(avg_v * n) OVER () "
    "/ sum(n) OVER ()) AS si FROM g), "
    "resid AS (SELECT event_id, value / si AS rv "
    "FROM (SELECT event_id, CAST({dow} AS INT) AS dow, value "
    "FROM events WHERE value IS NOT NULL) e "
    "JOIN idx ON e.dow = idx.dow), "
    "med AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY rv) "
    "AS m FROM resid), "
    "mad AS (SELECT percentile_cont(0.5) WITHIN GROUP "
    "(ORDER BY abs(rv - m)) AS md FROM resid, med) "
    "SELECT CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CASE WHEN abs(rv - m) > 3 * 1.4826 * md "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies, "
    "floor(sum(CASE WHEN abs(rv - m) > 3 * 1.4826 * md "
    "THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) * 1000000) "
    "/ 1000000 AS anomaly_rate, "
    "floor(min(m) * 10000) / 10000 AS resid_median, "
    "floor(min(md) * 10000) / 10000 AS resid_mad "
    "FROM resid, med, mad"
)

sql_query(
    "events_anomaly_seasonal_mad",
    _SMAD_TMPL.format(dow="dayofweek(CAST(ts AS TIMESTAMP)) - 1"),
    _SMAD_TMPL.format(dow="dayofweek(ts)"),
    doc="Seasonally-adjusted robust anomaly detection — the "
    "composition the standalone pieces exist for: deseasonalize each "
    "value by its day-of-week index (events_seasonality_dow's "
    "multiplicative factor, computed inline from the same 7-row "
    "aggregate), then flag residuals beyond 3 robust sigma "
    "(1.4826*MAD, events_mad_outliers' estimator) of the residual "
    "median. Removing the weekly cycle first is what keeps ordinary "
    "weekend peaks from drowning true anomalies. The seasonal index "
    "is a 7-row broadcast; the two medians are single-pass exact "
    "percentiles; the flagging pass is rowwise — three linear scans "
    "total, no quadratic step. The med/mad scalars attach via 1-row "
    "broadcasts (BNLJ-allowlisted).",
)


# =====================================================================
# idf-weighted SimHash signatures (r5)
# =====================================================================

WSH_BITS = 16


def _duck_weighted_simhash_sql() -> str:
    sums = ", ".join(
        f"sum(w * CASE WHEN (strpos('0123456789abcdef', substr(h, {j}, 1)) - 1) "
        f"% 2 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(1, WSH_BITS + 1)
    )
    bits = ", ".join(
        f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(1, WSH_BITS + 1)
    )
    return f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
n AS (SELECT count(*) AS nd FROM documents),
w AS (SELECT token, (SELECT nd FROM n) // count(DISTINCT doc_id) + 1 AS w,
      md5(token) AS h FROM t GROUP BY token),
s AS (SELECT doc_id, {sums} FROM t JOIN w USING (token) GROUP BY doc_id)
SELECT doc_id, concat({bits}) AS simhash FROM s
"""


@register(
    "dedup_simhash_weighted_signatures",
    _duck_weighted_simhash_sql(),
    doc="idf-weighted SimHash signatures (the Manku WWW'07 practice "
    "the unweighted entries approximate): each token votes its md5 "
    "parity bits with weight N_docs div df + 1, so corpus-dominant "
    "tokens no longer drag every document's majority the same way. "
    "Motivation measured at sf1: unweighted 64-bit signatures carry "
    "per-bit biases up to 0.30 on a shared-vocabulary corpus, "
    "inflating block-index candidates to 4M rows; weighting "
    "decorrelates the bits. Integer weights via bigint `div` (Spark) "
    "/ `//` (DuckDB) — bit-exact cross-engine, no float-sum ordering "
    "hazard — and integer vote sums are associativity-free, so the "
    "signature is deterministic under any aggregation order. Scale "
    "shape: one token-df groupBy, a broadcast 1-row corpus count "
    "(allowlisted scalar BNLJ), one occurrence⋈weight equi-join, one "
    "per-doc agg — all linear, AQE-handled.",
)
def dedup_simhash_weighted_signatures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .sources.registry import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    total = docs.agg(F.count("*").alias("_n"))
    weights = (
        toks.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.expr("_n div _df + 1").alias("_w"),
            F.md5("token").alias("_h"),
        )
    )
    votes = [
        F.sum(
            F.col("_w")
            * F.expr(
                f"CASE WHEN (instr('0123456789abcdef', substr(_h, {j}, 1)) - 1) "
                "% 2 = 1 THEN 1 ELSE -1 END"
            )
        ).alias(f"_s{j}")
        for j in range(1, WSH_BITS + 1)
    ]
    per_doc = toks.join(weights, "token").groupBy("doc_id").agg(*votes)
    sig = F.concat(
        *[
            F.when(F.col(f"_s{j}") > 0, F.lit("1")).otherwise("0")
            for j in range(1, WSH_BITS + 1)
        ]
    )
    return per_doc.select("doc_id", sig.alias("simhash"))


# =====================================================================
# Mergeable quantile sketch certification (the 100 TB percentile path)
# =====================================================================

#: quantiles certified and the approx_percentile accuracy knob: the
#: published guarantee is rank error <= N/accuracy, checked with a
#: +1-row slack so engine-version rounding at the guarantee edge can
#: never flake the entry
QSKETCH_QS = [0.25, 0.5, 0.75, 0.95]
QSKETCH_ACCURACY = 1000


@register(
    "stats_quantile_sketch_error",
    """
WITH e AS (
  SELECT 0.25 AS q, quantile_cont(l_extendedprice, 0.25) AS p FROM lineitem
  UNION ALL
  SELECT 0.5, quantile_cont(l_extendedprice, 0.5) FROM lineitem
  UNION ALL
  SELECT 0.75, quantile_cont(l_extendedprice, 0.75) FROM lineitem
  UNION ALL
  SELECT 0.95, quantile_cont(l_extendedprice, 0.95) FROM lineitem)
SELECT CAST(q AS DOUBLE) AS q, round(p, 2) AS exact_p,
       CAST(1 AS INT) AS within_bound
FROM e ORDER BY q
""",
    doc="Mergeable-quantile-sketch certification: percentile_approx "
    "(Spark's single-pass mergeable sketch — THE percentile path at "
    "100 TB, where exact interpolating percentile needs a global "
    "sort) against the exact value, per quantile. Readout = the "
    "exact percentile (value-checked against DuckDB quantile_cont) "
    "plus within_bound = whether the approx value's EXACT rank sits "
    "inside the published N/accuracy guarantee (oracle expects 1 — a "
    "sketch regression turns the row red). One corpus scan for the "
    "sketch, one for exact rank of 4 broadcast candidate values; the "
    "exact percentile itself is the only global-sort cost and exists "
    "purely to value-anchor the entry at test SF.",
)
def stats_quantile_sketch_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = ", ".join(str(q) for q in QSKETCH_QS)
    both = li.agg(
        F.expr(
            f"percentile_approx(l_extendedprice, array({qs}), "
            f"{QSKETCH_ACCURACY})"
        ).alias("approx"),
        F.expr(f"percentile(l_extendedprice, array({qs}))").alias("exact"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.posexplode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in QSKETCH_QS]),
                F.col("approx"),
                F.col("exact"),
            )
        ).alias("i", "z"),
        "n",
    ).select(
        F.col("z.0").alias("q"),
        F.col("z.approx").alias("approx_p"),
        F.col("z.exact").alias("exact_p"),
        "n",
    )
    ranked = both.join(
        li.alias("c"), F.col("c.l_extendedprice") <= F.col("approx_p"), "left"
    ).groupBy("q", "approx_p", "exact_p", "n").agg(
        F.count("c.l_extendedprice").alias("rank_of_approx")
    )
    bound = F.col("n") / QSKETCH_ACCURACY + 1
    return ranked.select(
        F.col("q").cast("double").alias("q"),
        F.round("exact_p", 2).alias("exact_p"),
        (
            F.abs(F.col("rank_of_approx") - F.col("q") * F.col("n")) <= bound
        )
        .cast("int")
        .alias("within_bound"),
    ).orderBy("q")
