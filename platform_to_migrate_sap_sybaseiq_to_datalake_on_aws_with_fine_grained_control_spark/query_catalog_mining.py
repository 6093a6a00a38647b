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
from .functions.pq import (  # noqa: F401  (re-export: shared, cycle-free home)
    PQ_CENTROIDS,
    PQ_SUBDIM,
    PQ_SUBSPACES,
    pq_codebook,
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
# Time-series diagnostics: lag-k autocorrelation + CUSUM changepoint
# =====================================================================

_AUTOCORR_SQL = (
    # shared ANSI text: one per-type window sort feeds both lag offsets;
    # corr() is algebraic (moment sums — map-side combinable)
    "WITH o AS (SELECT event_type, value, "
    "lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2 "
    "FROM events "
    "WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)) "
    "SELECT event_type, "
    "round(corr(value, v1), 4) AS autocorr_lag1, "
    "round(corr(value, v2), 4) AS autocorr_lag2 "
    "FROM o GROUP BY event_type ORDER BY event_type"
)

sql_query(
    "events_autocorrelation",
    _AUTOCORR_SQL,
    doc="Lag-1/lag-2 autocorrelation of event value per type — the "
    "is-this-series-white-noise diagnostic that decides whether "
    "EWMA/forecast features are worth computing. One per-type window "
    "sort feeds both lag offsets (shared WINDOW clause), then a "
    "single algebraic corr() aggregation (moment sums, map-side "
    "combinable). Identical ANSI text both engines; the (ts, "
    "event_id) total order pins lag pairing under ties.",
)


def _cusum_sql(epoch: str) -> str:
    # CUSUM over hourly means: cumulative sum of (hourly mean - global
    # mean); the hour with max |cusum| is the level-shift candidate.
    return f"""
WITH hourly AS (
  SELECT event_type, CAST(floor({epoch} / 3600000000) AS BIGINT) AS h,
         avg(value) AS hv
  FROM events GROUP BY 1, 2),
centered AS (
  SELECT event_type, h,
         hv - avg(hv) OVER (PARTITION BY event_type) AS dev
  FROM hourly),
cusum AS (
  SELECT event_type, h,
         sum(dev) OVER (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cs
  FROM centered),
ranked AS (
  SELECT event_type, h, cs,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cs) DESC, h) AS rn
  FROM cusum)
SELECT event_type, CAST(h AS BIGINT) AS changepoint_hour,
       floor(cs * 10000) / 10000 AS cusum_value
FROM ranked WHERE rn = 1 ORDER BY event_type
"""


sql_query(
    "events_cusum_changepoint",
    _cusum_sql("unix_micros(CAST(ts AS TIMESTAMP))"),
    _cusum_sql("epoch_us(ts)"),
    doc="CUSUM changepoint detection per event type: hourly means, "
    "centered on the series mean, cumulatively summed — the hour of "
    "maximum |CUSUM| is the level-shift candidate (Page 1954's "
    "detector over the pre-aggregated series). The raw scan collapses "
    "to |type × hour| rows FIRST, so the windows run on the tiny "
    "rollup, not the event stream; (abs, hour) total order pins the "
    "argmax. NTZ-safe epoch idiom; floor-scaled output.",
)


# =====================================================================
# Winsorized statistics (percentile-clamped outlier treatment)
# =====================================================================


def _winsor_sql(pct: str) -> str:
    # clamp to the per-group [p01, p99] band, then aggregate — the
    # outlier treatment that, unlike trimming, keeps N constant.
    clamp = "least(greatest(e.value, b.p01), b.p99)"
    return f"""
WITH b AS (SELECT event_type, {pct}(value, 0.01) AS p01,
                  {pct}(value, 0.99) AS p99
           FROM events GROUP BY event_type)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg({clamp}), 4) AS mean_winsor,
       round(stddev_samp({clamp}), 4) AS std_winsor,
       round(min({clamp}), 4) AS min_winsor,
       round(max({clamp}), 4) AS max_winsor
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type
"""


sql_query(
    "events_winsorized_stats",
    _winsor_sql("percentile"),
    _winsor_sql("quantile_cont"),
    doc="Winsorized (percentile-clamped) moments per event type: "
    "values clamped into the group's exact [p01, p99] band before "
    "mean/std — outlier treatment that keeps N constant, the robust "
    "sibling of events_mad_outliers. Two passes: one tiny exact-"
    "percentile aggregate (rows = |groups|, broadcast back) + one "
    "clamped moment aggregate; percentile/quantile_cont share the "
    "same linear-interpolation definition (the percentile_stats "
    "precedent).",
)


# =====================================================================
# Sentence-boundary chunking (never splits a sentence)
# =====================================================================

SENT_CHUNK_BUDGET = 400  # chars per chunk (a sentence may overflow it)


_SENT_CUM = (
    "sum(length(s) + 2) OVER (PARTITION BY doc_id ORDER BY i "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)

_SENT_CTE_SPARK = (
    # regex-escaped dot; LATERAL VIEW is Spark's generator-with-alias form
    "SELECT doc_id, t.i, t.s FROM documents "
    "LATERAL VIEW posexplode(split(text, '\\\\. ')) t AS i, s"
)
_SENT_CTE_DUCK = (
    "SELECT doc_id, unnest(list_transform("
    "generate_series(1, len(string_split(text, '. '))), "
    "j -> {'i': j - 1, 's': string_split(text, '. ')[j]}), "
    "recursive := true) FROM documents"
)


def _sent_chunk_sql(sents_cte: str) -> str:
    return f"""
WITH sents AS ({sents_cte}),
offs AS (
  SELECT doc_id, i, length(s) AS sl,
         {_SENT_CUM} AS cum_end
  FROM sents WHERE s <> '')
SELECT doc_id,
       CAST(floor((cum_end - sl) / {SENT_CHUNK_BUDGET}) AS BIGINT)
         AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(sum(sl) AS BIGINT) AS n_chars
FROM offs GROUP BY 1, 2
"""


sql_query(
    "chunk_documents_sentences",
    _sent_chunk_sql(_SENT_CTE_SPARK),
    _sent_chunk_sql(_SENT_CTE_DUCK),
    doc="Sentence-boundary chunking: split on '. ', assign each "
    "sentence to the chunk its cumulative start offset falls in "
    "(floor(start/budget)) — sentences are never split, chunks may "
    "overflow by at most one sentence (the standard RAG chunker "
    "contract; chunk_documents_fixed is the exact-size sibling). "
    "Narrow posexplode + one per-doc cumulative-sum window — the same "
    "single-sort shape as sessionization, linear at corpus scale.",
)


# =====================================================================
# DSIR-style importance resampling (domain-targeted data selection)
# =====================================================================

DSIR_TARGET_SOURCE = "src18"  # stand-in "high-quality domain" corpus
DSIR_BASE_RATE = 0.5  # acceptance scale for exp(log-importance)

_DSIR_DOC_BUCKET_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT)"
)
_DSIR_DOC_BUCKET_DUCK = (
    "((strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
)


def _dsir_sql(tok: str, bucket: str) -> str:
    return f"""
WITH toks AS (SELECT doc_id, source, {tok} AS tok FROM documents),
ct AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c_all,
       CAST(count(*) FILTER (WHERE source = '{DSIR_TARGET_SOURCE}') AS DOUBLE)
         AS c_tgt
       FROM toks GROUP BY tok),
tot AS (SELECT sum(c_all) AS n_all, sum(c_tgt) AS n_tgt,
        CAST(count(*) AS DOUBLE) AS v FROM ct),
scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         avg(ln( ((c.c_tgt + 1) / (s.n_tgt + s.v))
               / ((c.c_all + 1) / (s.n_all + s.v)) )) AS lw
  FROM toks t JOIN ct c ON t.tok = c.tok CROSS JOIN tot s
  GROUP BY t.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       floor(lw * 10000) / 10000 AS log_importance,
       (CAST({bucket} AS DOUBLE) / 256.0)
         < least(exp(lw) * {DSIR_BASE_RATE}, CAST(1 AS DOUBLE)) AS kept
FROM scored
"""


sql_query(
    "curate_dsir_importance",
    _dsir_sql("explode(filter(split(text, ' '), t -> t <> ''))",
              _DSIR_DOC_BUCKET_SPARK),
    _dsir_sql("unnest(list_filter(string_split(text, ' '), t -> t <> ''))",
              _DSIR_DOC_BUCKET_DUCK),
    doc="DSIR-style importance resampling (Xie et al. 2023): per-doc "
    "log importance = mean token log-ratio of Laplace-smoothed "
    "target-domain vs whole-corpus unigram LMs, acceptance via the "
    "deterministic md5 doc bucket against exp(importance)*rate — "
    "reproducible across engines/runs/retries, unlike seeded RNG "
    "sampling. Plan: one token explode, one vocab-keyed count (both "
    "LMs from the SAME aggregation via FILTER), join back, per-doc "
    "avg — two linear shuffles (token, doc) regardless of corpus "
    "size; LM totals ride a 1-row broadcast.",
)


# =====================================================================
# Logistic quality model scoring (fasttext-style classifier gate,
# literal weights — the model-based sibling of the Gopher rule filter)
# =====================================================================

# weights chosen to exercise all features; a trained model would ship
# the same way (plan literals), which is what the oracle can verify.
QM_W0 = -3.0
QM_W_LOGLEN = 0.85  # ln(1 + n_chars)
QM_W_PUNCT = -4.0  # non-alphanumeric-space ratio
QM_W_DIGIT = -2.5  # digit ratio
QM_W_WORDLEN = -0.15  # mean word length (chars per space-token)


def _qm_z(g: str) -> str:
    # logistic-model logit, shared by the scoring entry and the
    # calibration readout. Near-identical text both engines; the one
    # divergence is DuckDB's regexp_replace needing an explicit 'g'
    # flag to strip ALL matches (Spark is global by default) — ``g``
    # is ", 'g'" or "".
    return (
        f"{QM_W0} + {QM_W_LOGLEN} * ln(1 + length(text)) "
        f"+ {QM_W_PUNCT} * (CAST(length(regexp_replace(text, "
        f"'[a-zA-Z0-9 ]', ''{g})) AS DOUBLE) / length(text)) "
        f"+ {QM_W_DIGIT} * (CAST(length(text) - length(regexp_replace(text, "
        f"'[0-9]', ''{g})) AS DOUBLE) / length(text)) "
        f"+ {QM_W_WORDLEN} * (CAST(length(text) AS DOUBLE) "
        f"/ (1 + length(text) - length(replace(text, ' ', ''))))"
    )


def _qm_sql(g: str) -> str:
    z = _qm_z(g)
    return (
        "SELECT doc_id, "
        f"floor((CAST(1 AS DOUBLE) / (1 + exp(-({z})))) * 10000) / 10000 "
        "AS quality_score, "
        f"(CAST(1 AS DOUBLE) / (1 + exp(-({z})))) >= 0.5 AS kept "
        "FROM documents WHERE length(text) > 0"
    )


sql_query(
    "text_quality_model_score",
    _qm_sql(""),
    _qm_sql(", 'g'"),
    doc="Model-based quality gate: logistic scorer over four rowwise "
    "features (log length, punctuation ratio, digit ratio, mean word "
    "length) with literal weights — the fasttext-classifier-style "
    "sibling of the rule-based Gopher filter; a trained model ships "
    "its weights the same way (plan literals, no data movement). "
    "Pure whole-stage-codegen arithmetic, zero shuffles; score "
    "floor-scaled. NOTE the regexp_replace character-class trick: "
    "ratio numerators come from stripped-length deltas, so no token "
    "explode is needed. Dialect gotcha: DuckDB regexp_replace "
    "replaces only the FIRST match without the 'g' flag (Spark is "
    "global by default) — the single divergence between the texts.",
)


# =====================================================================
# Count-Min sketch frequency estimation (third sketch family, after
# HLL distinct counts and GK quantiles — here BOTH the estimate and
# the exact count are emitted as hard values, fully hash-checked)
# =====================================================================

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row (2 md5 hex digits)

_CMS_BUCKET_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', k)), 1, 2), "
    "16, 10) AS INT)"
)
_CMS_BUCKET_DUCK = (
    "((strpos('0123456789abcdef', "
    "substr(md5(CAST(i AS VARCHAR) || ':' || k), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', "
    "substr(md5(CAST(i AS VARCHAR) || ':' || k), 2, 1)) - 1))"
)


def _cms_sql(explode_i: str, bucket: str, vchar: str) -> str:
    # counters built from the per-key counts (all occurrences of a key
    # share a bucket, so sum-of-key-counts == count-of-rows per bucket)
    return f"""
WITH keys AS (SELECT CAST(user_id AS {vchar}) AS k,
                     CAST(count(*) AS BIGINT) AS exact_n
              FROM events GROUP BY 1),
hashes AS (SELECT k, exact_n, {explode_i} AS i FROM keys),
buckets AS (SELECT k, exact_n, i, {bucket} AS b FROM hashes),
counters AS (SELECT i, b, sum(exact_n) AS c FROM buckets GROUP BY i, b),
est AS (SELECT h.k, min(h.exact_n) AS exact_n, min(c.c) AS cms_est
        FROM buckets h JOIN counters c ON h.i = c.i AND h.b = c.b
        GROUP BY h.k)
SELECT CAST(k AS BIGINT) AS user_id, exact_n,
       CAST(cms_est AS BIGINT) AS cms_est,
       cms_est >= exact_n AS lower_ok,
       CAST(cms_est - exact_n AS DOUBLE)
         <= 2.718281828459045 / {CMS_WIDTH}
            * (SELECT CAST(count(*) AS DOUBLE) FROM events) AS upper_ok
FROM est
"""


sql_query(
    "sketch_count_min_users",
    _cms_sql(
        f"explode(sequence(1, {CMS_DEPTH}))", _CMS_BUCKET_SPARK, "STRING"
    ),
    _cms_sql(
        f"unnest(range(1, {CMS_DEPTH + 1}))", _CMS_BUCKET_DUCK, "VARCHAR"
    ),
    doc="Count-Min sketch frequency estimation (d=4 md5 hash rows, "
    "w=256): counters come from one groupBy over the keyed counts "
    "(all occurrences of a key share its bucket, so sum-of-key-counts "
    "equals the row count per cell); the estimate is the min over the "
    "d counters, re-attached via a broadcast join against the "
    "4x256-row counter table. The sketch is mergeable (pure sums) — "
    "the map-side-combine path for frequency estimates over 100 TB. "
    "Unlike the HLL/GK entries, md5 hashing is engine-reproducible, so "
    "the estimate itself is a hash-checked hard value; the CMS "
    "guarantees (est >= exact; overshoot <= (e/w)*N) ride along as "
    "booleans.",
)


# =====================================================================
# Window distribution functions (percent_rank / cume_dist / ntile)
# =====================================================================

sql_query(
    "window_distribution_functions",
    # shared ANSI text. The WINDOW clause carries a full total order
    # (quantity, orderkey, linenumber) so ntile's positional split is
    # deterministic; percent_rank/cume_dist are floor-scaled.
    "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, "
    "floor(percent_rank() OVER w * 1000000) / 1000000 AS pct_rank, "
    "floor(cume_dist() OVER w * 1000000) / 1000000 AS cume_d, "
    "CAST(ntile(4) OVER w AS INT) AS quartile "
    "FROM lineitem WHERE l_orderkey % 100 = 0 "
    "WINDOW w AS (PARTITION BY l_returnflag "
    "ORDER BY l_quantity, l_orderkey, l_linenumber)",
    doc="Window distribution functions — percent_rank, cume_dist, "
    "ntile(4) over one shared WINDOW clause (single sort per "
    "partition feeds all three). The frame carries a unique tiebreak "
    "so ntile's positional assignment is deterministic; rank ratios "
    "are floor-scaled. Partitioned by return flag — no unpartitioned "
    "global window at any scale. Identical ANSI text both engines.",
)


# =====================================================================
# LATERAL correlated subquery (per-row dependent top-k)
# =====================================================================

sql_query(
    "lateral_topk_customers",
    # identical ANSI text. Spark decorrelates the LATERAL order-limit
    # into a per-key window (DomainJoin rewrite) — no nested loop over
    # the outer side at scale.
    "SELECT n.n_name AS nation, t.c_name AS customer, t.c_acctbal AS balance "
    "FROM nation n, LATERAL ("
    "SELECT c_name, c_acctbal FROM customer "
    "WHERE c_nationkey = n.n_nationkey "
    "ORDER BY c_acctbal DESC, c_name LIMIT 3) t",
    doc="LATERAL correlated subquery: per-nation top-3 customers by "
    "balance via a correlated ORDER BY ... LIMIT — the dependent-join "
    "form of window_topk_per_group. Spark's optimizer decorrelates "
    "the lateral limit (rewritten onto the joined relation), so the "
    "plan is a shuffle join + per-key limit, not an outer-row-driven "
    "nested loop. Balances are stored doubles (bit-exact); identical "
    "ANSI text both engines.",
)


# =====================================================================
# Product quantization of embeddings (deterministic literal codebook)
# =====================================================================


def _pq_spark_sql() -> str:
    # The SQL reference form of the PQ encoding — straight-line
    # arithmetic instead of HOF lambdas (round-9 perf fix: interpreted
    # per-element lambdas cost ~36 µs/vector).  Since r11 the LIVE
    # entry runs functions.pq.pq_encode_udf (one Arrow/NumPy kernel —
    # this ~100 KB literal tree cost Catalyst ~2-3 s of re-analysis on
    # every action); this text remains the Spark-side equivalence
    # anchor: test_pq_encode_udf_matches_sql_form proves the kernel
    # reproduces it bit-for-bit, and the DuckDB oracle states the same
    # arithmetic cross-engine.
    cb = pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM)
    comps = ", ".join(
        f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) AS x{i}"
        for i in range(PQ_SUBSPACES * PQ_SUBDIM)
    )
    dist_cols = []
    for s in range(PQ_SUBSPACES):
        cents = []
        for row in cb[s]:
            terms = " + ".join(
                f"(x{s * PQ_SUBDIM + d} - {row[d]!r}D) * "
                f"(x{s * PQ_SUBDIM + d} - {row[d]!r}D)"
                for d in range(PQ_SUBDIM)
            )
            cents.append(f"({terms})")
        dist_cols.append("array(" + ", ".join(cents) + f") AS d{s}")
    codes = ", ".join(
        f"CAST(array_position(d{s}, array_min(d{s})) AS STRING)"
        for s in range(PQ_SUBSPACES)
    )
    err = " + ".join(f"array_min(d{s})" for s in range(PQ_SUBSPACES))
    return (
        "SELECT vec_id, concat_ws(',', " + codes + ") AS codes, "
        f"floor(({err}) / {PQ_SUBSPACES * PQ_SUBDIM} * 10000) / 10000 AS mse "
        "FROM (SELECT vec_id, " + ", ".join(dist_cols)
        + f" FROM (SELECT vec_id, {comps} FROM embeddings))"
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


# =====================================================================
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
# =====================================================================

HYBRID_QUERY_ID = 7  # query = this document's embedding (exists at all SFs)
HYBRID_LIST_K = 20  # depth of each input ranking
HYBRID_TOP = 10  # fused results kept
RRF_K = 60  # standard reciprocal-rank-fusion damping constant


def _hybrid_sql(tokenize: str, cos: str) -> str:
    from .query_catalog_analytics import BM25_B, BM25_K1, BM25_TERMS

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {tokenize} AS tok FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 (SELECT avg(dl) FROM dl) AS avgdl FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
       WHERE tok IN ({terms}) GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM toks
       WHERE tok IN ({terms}) GROUP BY tok),
lex_score AS (
  SELECT t.doc_id,
         round(sum( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                  * t.tf * {BM25_K1 + 1.0}
                  / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * d.dl / s.avgdl)) ),
               4) AS bm25
  FROM tf t JOIN df f ON t.tok = f.tok
  JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN stats s
  GROUP BY t.doc_id),
lex_top AS (SELECT doc_id, bm25 FROM lex_score
            ORDER BY bm25 DESC, doc_id LIMIT {HYBRID_LIST_K}),
lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                            AS BIGINT) AS lex_rank FROM lex_top),
q AS (SELECT embedding AS qvec FROM embeddings
      WHERE vec_id = {HYBRID_QUERY_ID}),
sem_score AS (SELECT vec_id AS doc_id, round({cos}, 6) AS sim
              FROM embeddings CROSS JOIN q
              WHERE vec_id <> {HYBRID_QUERY_ID}),
sem_top AS (SELECT doc_id, sim FROM sem_score
            ORDER BY sim DESC, doc_id LIMIT {HYBRID_LIST_K}),
sem AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                            AS BIGINT) AS sem_rank FROM sem_top)
SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
       floor((coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + l.lex_rank), CAST(0 AS DOUBLE))
            + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + s.sem_rank), CAST(0 AS DOUBLE)))
             * 1000000) / 1000000 AS rrf
FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id
ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
"""


def _hybrid_entry_sqls() -> tuple[str, str]:
    from .operators.similarity import cosine_expr
    from .query_catalog_ml import _duck_cos

    spark_text = _hybrid_sql(
        "explode(split(text, ' '))", cosine_expr("embedding", "qvec")
    )
    duck_text = _hybrid_sql(
        "unnest(string_split(text, ' '))", _duck_cos("embedding", "qvec")
    )
    return spark_text, duck_text


@register(
    "search_hybrid_rrf",
    lambda: _hybrid_entry_sqls()[1],  # lazy: embeds analytics' BM25
    doc="Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical "
    "ranking (text_bm25_search's scorer) and an embedding-cosine "
    "semantic ranking (query = one document's vector, scalar-broadcast) "
    "each produce a depth-20 list under a (rounded score, doc_id) total "
    "order; RRF = sum of 1/(60 + rank), missing lists contribute 0. "
    "Both rankings come off TakeOrderedAndProject (per-partition "
    "partial top-k — the rank window runs on the 20 survivors, never "
    "the corpus); the fuse is one 20x20 full-outer join. Rank ties are "
    "impossible (unique doc_id tiebreak), so fused output is "
    "deterministic in both engines; RRF floor-scaled at 1e-6.",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .query_catalog import _sql

    return _sql(spark, sf_dir, _hybrid_entry_sqls()[0])


# =====================================================================
# OHLC (open-high-low-close) bars — min_by/max_by positional aggregates
# =====================================================================

_OHLC_ORDKEY_SPARK = (
    "lpad(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING), 20, '0') || "
    "lpad(CAST(event_id AS STRING), 10, '0')"
)
_OHLC_ORDKEY_DUCK = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 10, '0')"
)

sql_query(
    "events_ohlc_hourly",
    "SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:00') AS hour, "
    "event_type, "
    f"min_by(value, {_OHLC_ORDKEY_SPARK}) AS open, "
    "max(value) AS high, min(value) AS low, "
    f"max_by(value, {_OHLC_ORDKEY_SPARK}) AS close, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "round(sum(value), 2) AS volume "
    "FROM events GROUP BY 1, 2",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, "
    "event_type, "
    f"arg_min(value, {_OHLC_ORDKEY_DUCK}) AS open, "
    "max(value) AS high, min(value) AS low, "
    f"arg_max(value, {_OHLC_ORDKEY_DUCK}) AS close, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "round(sum(value), 2) AS volume "
    "FROM events GROUP BY 1, 2",
    doc="OHLC candlestick bars per (hour, event_type): open/close via "
    "min_by/max_by on a zero-padded (epoch, event_id) string key — "
    "positional aggregates with a total-order tiebreak, so the bar is "
    "deterministic under retries and partial-aggregate merge order. "
    "All six measures combine map-side (min_by/max_by are algebraic); "
    "one shuffle of |buckets| rows. Open/high/low/close are stored "
    "values (bit-exact both engines), only the sum is rounded.",
)


# =====================================================================
# Triangle counting on the nation trade graph (oriented edge join)
# =====================================================================

_TRIANGLE_SQL = (
    # undirected edges = nation pairs with above-average trade volume,
    # oriented a < b (each triangle counted exactly once as a<b<c —
    # the standard forward/compact orientation that keeps the edge
    # join linear in triangles instead of 6x-overcounting).
    "WITH pairw AS (SELECT least(cn.n_name, sn.n_name) AS a, "
    "greatest(cn.n_name, sn.n_name) AS b, "
    "sum(l_extendedprice * (1 - l_discount)) AS w "
    "FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation cn ON c_nationkey = cn.n_nationkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation sn ON s_nationkey = sn.n_nationkey "
    "WHERE cn.n_name <> sn.n_name GROUP BY 1, 2), "
    "edges AS (SELECT a, b FROM pairw "
    "WHERE w > (SELECT avg(w) FROM pairw)), "
    "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM edges e1 "
    "JOIN edges e2 ON e1.b = e2.a "
    "JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "members AS (SELECT x AS nation FROM tri UNION ALL "
    "SELECT y FROM tri UNION ALL SELECT z FROM tri) "
    "SELECT nation, CAST(count(*) AS BIGINT) AS n_triangles "
    "FROM members GROUP BY nation ORDER BY nation"
)

sql_query(
    "trade_triangle_count",
    _TRIANGLE_SQL,
    doc="Per-node triangle counting on the nation trade graph (edges = "
    "above-average customer-nation to supplier-nation volume). Edges "
    "are oriented a < b so each triangle materializes exactly once "
    "(x<y<z) from two equi-joins — the compact-forward algorithm whose "
    "join work is O(sum of deg^2) rather than the 6x-overcounting "
    "naive form; per-node counts then fall out of one union + groupBy. "
    "The sparsifying threshold is a scalar subquery (broadcast, one "
    "row). Identical ANSI text both engines.",
)


# =====================================================================
# Null-safe equality join (IS NOT DISTINCT FROM as an equi-join key)
# =====================================================================

sql_query(
    "null_safe_join_sampler",
    # nullif() manufactures NULL keys from testdata (group 0 -> NULL);
    # IS NOT DISTINCT FROM matches NULL with NULL, and Spark plans it
    # as an EqualNullSafe equi-join key (hash/sort-merge able), NOT a
    # nested loop — the correct way to join on nullable keys at scale.
    "WITH c AS (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k "
    "FROM customer), "
    "s AS (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k "
    "FROM supplier) "
    "SELECT c.k AS key_group, CAST(count(*) AS BIGINT) AS n_pairs, "
    "CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers, "
    "CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers "
    "FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k "
    "GROUP BY c.k ORDER BY key_group NULLS FIRST",
    doc="Null-safe equality join: nullable keys matched with IS NOT "
    "DISTINCT FROM (NULL meets NULL), aggregated per key group "
    "including the NULL group. Spark compiles the predicate to an "
    "EqualNullSafe join KEY — hash-partitionable, so the join stays "
    "shuffle-based at scale instead of degenerating to a nested loop. "
    "Identical ANSI text both engines.",
)


@register(
    "embedding_pq_codes",
    _pq_duck_sql(),
    doc="Product quantization: each 64-d embedding split into 8 "
    "subvectors, each assigned (exact nearest, first-min tiebreak) to "
    "one of 16 deterministic codebook centroids — 256 bytes of floats "
    "compressed to 8 4-bit codes, the standard memory layout for "
    "billion-vector ANN re-ranking. Encoding runs as ONE Arrow-batched "
    "NumPy kernel over (vec_id, embedding) — zero shuffles; the r11 "
    "replacement for the unrolled-literal SQL tree whose ~100 KB "
    "expression Catalyst re-analyzed for ~2-3 s flat on every action "
    "(measured faster at sf0.1 AND sf10; kernel folds are bit-"
    "identical to the SQL form, held by "
    "test_pq_encode_udf_matches_sql_form). Per-vector reconstruction "
    "MSE emitted floor-scaled as the distortion readout. Codebook "
    "derivation is md5-seeded like operators.similarity.hyperplanes, "
    "so the DuckDB oracle reproduces it bit-exactly.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.pq import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_codebook,
        pq_encode_udf,
    )

    enc = pq_encode_udf(pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM))
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", enc("embedding").alias("_e"))
        .select("vec_id", F.col("_e.codes").alias("codes"), F.col("_e.mse").alias("mse"))
    )


# =====================================================================
# Recursive-CTE graph reachability (WITH RECURSIVE — Spark 4 native)
# =====================================================================

sql_query(
    "trade_reachability_recursive",
    # identical ANSI text both engines: Spark 4 executes WITH RECURSIVE
    # as an iterative frontier expansion (UnionLoop), DuckDB natively.
    "WITH RECURSIVE edges AS ("
    "SELECT cn.n_name AS src, sn.n_name AS dst, "
    "sum(l_extendedprice * (1 - l_discount)) AS rev "
    "FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation cn ON c_nationkey = cn.n_nationkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation sn ON s_nationkey = sn.n_nationkey "
    "WHERE cn.n_name <> sn.n_name "
    "GROUP BY cn.n_name, sn.n_name), "
    "strong AS (SELECT src, dst FROM edges "
    "WHERE rev > (SELECT avg(rev) FROM edges)), "
    "hub AS (SELECT src FROM strong GROUP BY src "
    "ORDER BY count(*) DESC, src LIMIT 1), "
    "reach(nation, hops) AS ("
    "SELECT src AS nation, 0 AS hops FROM hub "
    "UNION ALL "
    "SELECT s.dst, r.hops + 1 "
    "FROM reach r JOIN strong s ON s.src = r.nation "
    "WHERE r.hops < 3) "
    "SELECT nation, CAST(min(hops) AS INT) AS min_hops, "
    "CAST(count(*) AS BIGINT) AS n_paths "
    "FROM reach GROUP BY nation ORDER BY min_hops, nation",
    doc="Recursive-CTE reachability over the revenue-weighted nation "
    "trade graph (WITH RECURSIVE is native in Spark 4 and DuckDB — "
    "identical ANSI text, unlike trade_pagerank_nations whose "
    "fixed-iteration loop is driver-side). Edges above the mean "
    "revenue form the 'strong' graph; the walk starts at the hub "
    "nation with the most strong out-edges (deterministic under the "
    "(count, src) total order) and expands <= 3 hops, counting walks "
    "and min hops per reached nation. Scale shape: the edge "
    "aggregation is the only big shuffle (one pass over lineitem); "
    "the recursion iterates over a <= 25-node frontier joined to a "
    "<= 600-row broadcast edge list — per-iteration cost is "
    "negligible, and the depth bound caps the loop at 4 steps "
    "regardless of data volume. The BFS/transitive-closure surface "
    "(org charts, BOM explosions, fraud rings) done in pure SQL.",
)


# =====================================================================
# Bloom-filter membership sketch (m=4096 bits, k=3 md5 hash functions)
# =====================================================================

_BLOOM_TMPL = (
    "WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders "
    "WHERE o_orderpriority = '1-URGENT'), "
    "probes AS (SELECT c_custkey AS k FROM customer), "
    "mexp AS (SELECT k, {exploder} AS i FROM members), "
    "mbits AS (SELECT DISTINCT {pos} AS pos FROM mexp), "
    "pexp AS (SELECT k, {exploder} AS i FROM probes), "
    "ppos AS (SELECT k, i, {pos} AS pos FROM pexp), "
    "hits AS (SELECT p.k, count(*) AS nset FROM ppos p "
    "JOIN mbits b ON p.pos = b.pos GROUP BY p.k), "
    "flags AS (SELECT pr.k, COALESCE(h.nset, 0) = 3 AS bloom_hit, "
    "m.k IS NOT NULL AS is_member "
    "FROM probes pr LEFT JOIN hits h ON pr.k = h.k "
    "LEFT JOIN members m ON pr.k = m.k) "
    "SELECT CAST(count(*) AS BIGINT) AS n_probes, "
    "CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_members, "
    "CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) "
    "AS bloom_positives, "
    "CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) "
    "AS BIGINT) AS false_positives, "
    "CAST(sum(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) "
    "AS BIGINT) = 0 AS no_false_negatives "
    "FROM flags"
)

_BLOOM_POS_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(k AS STRING), ':', "
    "CAST(i AS STRING))), 1, 3), 16, 10) AS INT)"
)
_BLOOM_POS_DUCK = (
    "((strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || ':' "
    "|| CAST(i AS VARCHAR)), 1, 1)) - 1) * 256 + "
    "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || ':' "
    "|| CAST(i AS VARCHAR)), 2, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR) || ':' "
    "|| CAST(i AS VARCHAR)), 3, 1)) - 1))"
)

sql_query(
    "sketch_bloom_filter_customers",
    _BLOOM_TMPL.format(exploder="explode(sequence(1, 3))", pos=_BLOOM_POS_SPARK),
    _BLOOM_TMPL.format(exploder="unnest(range(1, 4))", pos=_BLOOM_POS_DUCK),
    doc="Bloom-filter membership sketch: urgent-priority customers "
    "hashed into a 4096-bit filter via k=3 md5 hash positions (3 hex "
    "chars = exactly 12 bits, no modulo bias), then every customer "
    "probed against it. The bit set is a DISTINCT over |members| x 3 "
    "positions — mergeable across partitions/files like the CMS "
    "entry, and small enough (<= 4096 rows) to broadcast to the probe "
    "side, so the probe is a map-side hash join however large the "
    "probe stream is: the semi-join-pushdown primitive (only ship "
    "rows whose keys might match) for 100 TB joins. md5 is "
    "engine-reproducible, so bloom_positives / false_positives are "
    "hash-checked hard values; the no-false-negatives guarantee rides "
    "along as a checked boolean.",
)


# =====================================================================
# Calibration readout for the logistic quality model (reliability
# bins + per-bin Brier contribution)
# =====================================================================


def _calib_sql(g: str) -> str:
    z = _qm_z(g)
    return (
        "WITH scored AS (SELECT "
        f"floor((CAST(1 AS DOUBLE) / (1 + exp(-({z})))) * 10000) / 10000 "
        "AS score, "
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos "
        "FROM documents WHERE length(text) > 0) "
        "SELECT CAST(floor(score * 10) AS INT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n, "
        "floor(avg(score) * 10000) / 10000 AS mean_score, "
        "floor(avg(CAST(pos AS DOUBLE)) * 10000) / 10000 AS pos_rate, "
        "floor(avg(pow(score - pos, 2)) * 10000) / 10000 AS brier "
        "FROM scored GROUP BY CAST(floor(score * 10) AS INT) "
        "ORDER BY bin"
    )


sql_query(
    "quality_model_calibration",
    _calib_sql(""),
    _calib_sql(", 'g'"),
    doc="Reliability diagram for the logistic quality model against "
    "the lang='en' label: decile score bins with empirical positive "
    "rate and per-bin Brier contribution — the is-the-gate-trustworthy "
    "readout that belongs next to any model-based corpus filter "
    "(quality_score_auc ranks, this calibrates). Rowwise scoring is "
    "whole-stage codegen; the readout is ONE 10-group aggregation "
    "with map-side partials, so cost at 100 TB is the scan itself. "
    "The score is floor-discretized before binning, so both engines "
    "bin identical double bits — no knife edge.",
)


# =====================================================================
# Bloom-prefiltered fact-dimension join (semi-join pushdown applied)
# =====================================================================


@register(
    "bloom_prefilter_join_revenue",
    # the oracle is the PLAIN join — the bloom prefilter must be
    # invisible in the result (no false negatives, FPs removed by the
    # final equi-join), which is exactly what this entry proves.
    "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE o_orderkey % 20 = 0 "
    "GROUP BY l_returnflag ORDER BY l_returnflag",
    doc="Fact-dimension join routed through operators/skew.py:"
    "bloom_prefilter_join: the selective order subset's keys build a "
    "64K-bit md5 Bloom filter, membership is 3 chained broadcast "
    "left-semi joins (map-side, zero added shuffles, ReusedExchange "
    "for the bit set), and only survivors enter the equi-join. The "
    "oracle is the PLAIN join — proving the prefilter changes "
    "nothing but the shuffle volume. At 100 TB this is the "
    "semi-join-pushdown shape AQE's runtime bloom filter applies "
    "when thresholds allow, available here unconditionally.",
)
def bloom_prefilter_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    joined = bloom_prefilter_join(li, od, "l_orderkey")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# =====================================================================
# CMS inner-product join-size estimation (AMS/CMS sketch theory)
# =====================================================================

_JSZ_TMPL = (
    "WITH ks AS (SELECT o_custkey AS k, count(*) AS c FROM orders "
    "GROUP BY o_custkey), "
    "cells AS (SELECT i, {bucket} AS w, sum(c) AS cell "
    "FROM (SELECT k, c, {exploder} AS i FROM ks) GROUP BY i, {bucket}), "
    "est AS (SELECT min(ip) AS est FROM "
    "(SELECT i, sum(cell * cell) AS ip FROM cells GROUP BY i)), "
    "exact AS (SELECT sum(c * c) AS ex, sum(c) AS n FROM ks) "
    "SELECT CAST(ex AS BIGINT) AS exact_join_size, "
    "CAST(est AS BIGINT) AS cms_estimate, "
    "est >= ex AS never_underestimates, "
    "est - ex <= 2.71828182845904523536 / 256.0 * n * n "
    "AS within_cms_bound "
    "FROM est, exact"
)

_JSZ_BUCKET_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', "
    "CAST(k AS STRING))), 1, 2), 16, 10) AS INT)"
)
_JSZ_BUCKET_DUCK = (
    "((strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' "
    "|| CAST(k AS VARCHAR)), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' "
    "|| CAST(k AS VARCHAR)), 2, 1)) - 1))"
)

sql_query(
    "sketch_join_size_estimate",
    _JSZ_TMPL.format(
        exploder="explode(sequence(1, 4))", bucket=_JSZ_BUCKET_SPARK
    ),
    _JSZ_TMPL.format(
        exploder="unnest(range(1, 5))", bucket=_JSZ_BUCKET_DUCK
    ),
    doc="Join-size estimation from Count-Min inner products (the "
    "AMS-style self-join-size special case): the size of the "
    "orders-orders self-equi-join on o_custkey is sum(c_k^2); the CMS "
    "estimate is the min over d=4 hash rows of the cell-wise "
    "inner product — computable from the SAME mergeable counter "
    "cells a CMS frequency sketch already maintains, never an extra "
    "data pass. This is the optimizer-statistics primitive for "
    "pre-shuffle skew/cost decisions at 100 TB: per-key counts are "
    "one map-side-combined aggregation, the sketch is 4x256 cells. "
    "md5 reproducibility makes the estimate a hash-checked hard "
    "value, with the two CMS guarantees (overestimate-only; "
    "overshoot <= e/w * N^2) as checked booleans. The scalar "
    "est-x-exact attach is a 1-row broadcast (BNLJ-allowlisted like "
    "the CMS entry).",
)


# =====================================================================
# KMV (k-minimum-values) distinct + Jaccard sketch — deterministic,
# therefore hash-checkable (unlike HLL), and mergeable like CMS
# =====================================================================

KMV_K = 64


def _kmv_duck_hex(expr: str, n: int = 8) -> str:
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1) "
        f"* {16 ** (n - i)}"
        for i in range(1, n + 1)
    ]
    return "(" + " + ".join(terms) + ")"


_KMV_TMPL = (
    "WITH ua AS (SELECT DISTINCT user_id FROM events "
    "WHERE event_type = 'click'), "
    "ub AS (SELECT DISTINCT user_id FROM events "
    "WHERE event_type = 'purchase'), "
    "ha AS (SELECT {h} AS h FROM ua), "
    "hb AS (SELECT {h} AS h FROM ub), "
    "ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) "
    f"AS r FROM ha) t WHERE r <= {KMV_K}), "
    "skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) "
    f"AS r FROM hb) t WHERE r <= {KMV_K}), "
    "mrg AS (SELECT DISTINCT h FROM "
    "(SELECT h FROM ska UNION ALL SELECT h FROM skb) u), "
    "un AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) "
    f"AS r FROM mrg) t WHERE r <= {KMV_K}) "
    "SELECT "
    "CAST((SELECT count(*) FROM ua) AS BIGINT) AS exact_click_users, "
    "floor(((SELECT count(*) FROM ska) - 1) "
    "/ (SELECT max(h) FROM ska) * 100) / 100 AS kmv_est_click, "
    "CAST((SELECT count(*) FROM ub) AS BIGINT) AS exact_purchase_users, "
    "floor(((SELECT count(*) FROM skb) - 1) "
    "/ (SELECT max(h) FROM skb) * 100) / 100 AS kmv_est_purchase, "
    "floor(CAST((SELECT count(*) FROM un "
    "JOIN ska ON un.h = ska.h JOIN skb ON un.h = skb.h) AS DOUBLE) "
    "/ (SELECT count(*) FROM un) * 10000) / 10000 AS kmv_jaccard, "
    "floor(CAST((SELECT count(*) FROM ua JOIN ub "
    "ON ua.user_id = ub.user_id) AS DOUBLE) "
    "/ ((SELECT count(*) FROM ua) + (SELECT count(*) FROM ub) "
    "- (SELECT count(*) FROM ua JOIN ub ON ua.user_id = ub.user_id)) "
    "* 10000) / 10000 AS exact_jaccard"
)

_KMV_H_SPARK = (
    "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) "
    "AS DOUBLE) / 4294967296.0"
)
_KMV_H_DUCK = _kmv_duck_hex("CAST(user_id AS VARCHAR)") + " / 4294967296.0"

sql_query(
    "sketch_kmv_distinct_jaccard",
    _KMV_TMPL.format(h=_KMV_H_SPARK),
    _KMV_TMPL.format(h=_KMV_H_DUCK),
    doc="K-minimum-values sketch (Beyer et al., SIGMOD'07): distinct "
    "counts via (k-1)/theta_k over the k smallest md5-uniform hashes, "
    "and audience overlap via the KMV resemblance estimator — the "
    "fraction of the merged sketch's k minima present in both input "
    "sketches. The fourth sketch family (after HLL, GK, CMS) and the "
    "one that makes DISTINCT estimation hash-checkable: md5 hashes "
    "are engine-reproducible, so unlike HLL the estimates themselves "
    "are value-checked, and sketches MERGE by taking the k smallest "
    "of a union — the map-side-combinable property that lets 100 TB "
    "of partitions each ship 64 doubles. Per-set sketch selection is "
    "a top-k window over DISTINCT keys (ties in h carry identical "
    "values, so tie order cannot change the selected multiset); the "
    "exact counterparts ride along for the error readout.",
)


# =====================================================================
# Zipf's-law fit over token frequencies (corpus health diagnostic)
# =====================================================================

_ZIPF_TMPL = (
    "WITH toks AS (SELECT {exploder} AS tok FROM documents), "
    "tf AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok), "
    "ranked AS (SELECT f, row_number() OVER "
    "(ORDER BY f DESC, tok) AS r FROM tf), "
    "top AS (SELECT ln(CAST(r AS DOUBLE)) AS lr, "
    "ln(CAST(f AS DOUBLE)) AS lf FROM ranked WHERE r <= 500) "
    "SELECT CAST(count(*) AS BIGINT) AS n_ranks, "
    "floor(regr_slope(lf, lr) * 10000) / 10000 AS zipf_slope, "
    "floor(regr_r2(lf, lr) * 10000) / 10000 AS fit_r2, "
    "floor(regr_intercept(lf, lr) * 10000) / 10000 AS log_c "
    "FROM top"
)

sql_query(
    "text_zipf_fit",
    _ZIPF_TMPL.format(
        exploder="explode(filter(split(text, ' '), t -> t <> ''))"
    ),
    _ZIPF_TMPL.format(
        exploder="unnest(list_filter(string_split(text, ' '), "
        "t -> t <> ''))"
    ),
    doc="Zipf's-law fit over the corpus token frequency distribution: "
    "OLS of ln(frequency) on ln(rank) over the top-500 ranks via the "
    "regr_* aggregate family — natural text sits near slope -1, and "
    "deviation (slope far from -1, low R^2) is a corpus-health smell "
    "for boilerplate floods, template spam, or tokenizer damage. One "
    "token-keyed count (map-side combined) + a top-k rank window on "
    "the |vocabulary| aggregate + a 500-row moment aggregation; the "
    "rank order carries a (freq, token) tiebreak so both engines "
    "rank identically.",
)


# =====================================================================
# HyperLogLog distinct sketch (m=256 registers, md5 hash, max-merge)
# =====================================================================

# Register sums use EXACT integer arithmetic: sum(1 << (49 - M_j)) is
# a BIGINT (max 256 * 2^49 < 2^58), so the harmonic-mean denominator
# is identical regardless of aggregation order — the float form
# sum(2^-M) needs a 57-bit mantissa and would be order-sensitive.
_HLL_TMPL = """
WITH keys AS (SELECT DISTINCT o_orderpriority AS grp, o_custkey AS k
              FROM orders),
h AS (SELECT grp, {idx} AS idx,
             substr(md5(CAST(k AS {str_t})), 3, 12) AS h12 FROM keys),
r AS (SELECT grp, idx, length({re0}) AS lz,
             substr(h12, length({re0}) + 1, 1) AS nib FROM h),
rho AS (SELECT grp, idx,
          CASE WHEN lz = 12 THEN 49
               ELSE 4 * lz + CASE WHEN {nv} >= 8 THEN 1
                                  WHEN {nv} >= 4 THEN 2
                                  WHEN {nv} >= 2 THEN 3 ELSE 4 END
          END AS rho
        FROM r),
regs AS (SELECT grp, idx, max(rho) AS m FROM rho GROUP BY grp, idx),
allregs AS (SELECT grp, idx, m FROM regs
            UNION ALL
            SELECT 'ALL' AS grp, idx, max(m) AS m FROM regs GROUP BY idx),
grps AS (SELECT DISTINCT grp FROM allregs),
grid AS (SELECT g.grp, s.idx FROM grps g CROSS JOIN ({seq}) s),
fullr AS (SELECT gr.grp, gr.idx, COALESCE(a.m, 0) AS m
          FROM grid gr LEFT JOIN allregs a
            ON gr.grp = a.grp AND gr.idx = a.idx),
est AS (SELECT grp, sum({shl}) AS s,
               sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM fullr GROUP BY grp),
raw AS (SELECT grp, v,
          (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0
            * 562949953421312.0 / CAST(s AS DOUBLE) AS e
        FROM est),
corr AS (SELECT grp, v,
           CASE WHEN e <= 640.0 AND v > 0 THEN 256.0 * ln(256.0 / v)
                ELSE e END AS e
         FROM raw),
exact AS (SELECT o_orderpriority AS grp,
                 count(DISTINCT o_custkey) AS n
          FROM orders GROUP BY o_orderpriority
          UNION ALL
          SELECT 'ALL' AS grp, count(DISTINCT o_custkey) AS n FROM orders)
SELECT c.grp, CAST(x.n AS BIGINT) AS n_exact,
       floor(c.e * 100) / 100 AS hll_est,
       floor(abs(c.e - x.n) / x.n * 10000) / 10000 AS rel_err,
       CAST(256 - c.v AS BIGINT) AS registers_set
FROM corr c JOIN exact x ON c.grp = x.grp
ORDER BY c.grp
"""

_HLL_SPARK = _HLL_TMPL.format(
    idx="CAST(conv(substring(md5(CAST(k AS STRING)), 1, 2), 16, 10) AS INT)",
    str_t="STRING",
    re0="regexp_extract(h12, '^0*', 0)",
    nv="(instr('0123456789abcdef', nib) - 1)",
    seq="SELECT explode(sequence(0, 255)) AS idx",
    shl="shiftleft(CAST(1 AS BIGINT), 49 - m)",
)
_HLL_DUCK = _HLL_TMPL.format(
    idx=(
        "((strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1) * 16 + "
        "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1))"
    ),
    str_t="VARCHAR",
    re0="regexp_extract(h12, '^0*')",
    nv="(strpos('0123456789abcdef', nib) - 1)",
    seq="SELECT unnest(range(0, 256)) AS idx",
    shl="(CAST(1 AS BIGINT) << (49 - m))",
)

sql_query(
    "sketch_hll_distinct",
    _HLL_SPARK,
    _HLL_DUCK,
    doc="HyperLogLog distinct-count sketch built from first "
    "principles: md5 keys split into an 8-bit register index (m=256) "
    "and a 48-bit suffix whose leading-zero run (computed from hex "
    "nibbles — no float log2 near power-of-two boundaries) gives the "
    "register rank; per-priority registers MERGE into a global 'ALL' "
    "sketch via max — the property that makes HLL the 100 TB "
    "cardinality primitive (registers combine across partitions, "
    "files, or days with 256 bytes of state, unlike count(DISTINCT) "
    "which must shuffle every key). Bias-corrected harmonic-mean "
    "estimate with the small-range linear-counting correction; the "
    "register sum is exact BIGINT arithmetic so both engines agree "
    "bit-for-bit regardless of aggregation order. Emits exact vs "
    "estimated cardinality and relative error per group — the "
    "accuracy readout alongside the approx_count_distinct entry "
    "(Spark's own HLL++, not oracle-reproducible).",
)


# =====================================================================
# Streaming HLL maintenance (register max-merge across micro-batches)
# =====================================================================

# Single-group HLL over events.user_id — the DuckDB oracle for the
# STREAMING register-merge entry.  Distinct keys first is equivalent
# to streaming raw rows: max over duplicate observations is the same
# register rank.
_HLL1_DUCK = """
WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
h AS (SELECT {idx} AS idx,
             substr(md5(CAST(k AS VARCHAR)), 3, 12) AS h12 FROM keys),
r AS (SELECT idx, length({re0}) AS lz,
             substr(h12, length({re0}) + 1, 1) AS nib FROM h),
rho AS (SELECT idx,
          CASE WHEN lz = 12 THEN 49
               ELSE 4 * lz + CASE WHEN {nv} >= 8 THEN 1
                                  WHEN {nv} >= 4 THEN 2
                                  WHEN {nv} >= 2 THEN 3 ELSE 4 END
          END AS rho
        FROM r),
regs AS (SELECT idx, max(rho) AS m FROM rho GROUP BY idx),
fullr AS (SELECT s.idx, COALESCE(a.m, 0) AS m
          FROM (SELECT unnest(range(0, 256)) AS idx) s
          LEFT JOIN regs a ON s.idx = a.idx),
est AS (SELECT sum((CAST(1 AS BIGINT) << (49 - m))) AS s,
               sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM fullr),
raw AS (SELECT v, (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0
                  * 562949953421312.0 / CAST(s AS DOUBLE) AS e
        FROM est),
corr AS (SELECT v, CASE WHEN e <= 640.0 AND v > 0
                        THEN 256.0 * ln(256.0 / v) ELSE e END AS e
         FROM raw),
exact AS (SELECT count(DISTINCT user_id) AS n FROM events)
SELECT 'ALL' AS grp, CAST(x.n AS BIGINT) AS n_exact,
  floor(c.e * 100) / 100 AS hll_est,
  floor(abs(c.e - x.n) / x.n * 10000) / 10000 AS rel_err,
  CAST(256 - c.v AS BIGINT) AS registers_set
FROM corr c, exact x
""".format(
    idx=(
        "((strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1) * 16 + "
        "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1))"
    ),
    re0="regexp_extract(h12, '^0*')",
    nv="(strpos('0123456789abcdef', nib) - 1)",
)


@register(
    "streaming_hll_users",
    _HLL1_DUCK,
    doc="STREAMING HyperLogLog maintenance: the events table replays "
    "as a 4-file availableNow stream; each micro-batch reduces to "
    "per-register max ranks and appends 256-row register deltas; the "
    "sketch is max(m) per register over the log. Exactly-once by "
    "construction twice over — idempotent_foreach_batch markers skip "
    "re-delivered batches, and max-merge is idempotent under "
    "duplicate rows anyway (replay-tolerance property test). The "
    "value oracle is the BATCH single-group HLL over the same keys: "
    "stream-merged registers == batch sketch, the mergeability "
    "contract verified end-to-end. At 100 TB/day this is cardinality "
    "tracking with 256 bytes of state per group and no count-distinct "
    "shuffle.",
)
def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _sh

    from .functions.sketches import hll_estimate_row
    from .streaming.events import run_streaming_hll

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_stream_hll_{tag}"
    _sh.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select("user_id")
    src = f"{base}/src"
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    regs = run_streaming_hll(spark, src, "user_id", f"{base}/work")
    est = hll_estimate_row(spark, regs)
    n_exact = events.agg(F.count_distinct("user_id").alias("n"))
    return est.crossJoin(F.broadcast(n_exact)).select(
        F.lit("ALL").alias("grp"),
        F.col("n").cast("bigint").alias("n_exact"),
        (F.floor(F.col("e") * 100) / 100).alias("hll_est"),
        (F.floor(F.abs(F.col("e") - F.col("n")) / F.col("n") * 10000) / 10000)
        .alias("rel_err"),
        "registers_set",
    )


# =====================================================================
# Streaming Count-Min maintenance (counter sum-merge, marker-guarded)
# =====================================================================


@register(
    "streaming_cms_users",
    _cms_sql(
        f"unnest(range(1, {CMS_DEPTH + 1}))", _CMS_BUCKET_DUCK, "VARCHAR"
    ),
    doc="STREAMING Count-Min maintenance: the events table replays as "
    "a 4-file availableNow stream; each micro-batch appends its d x w "
    "counter deltas and the sketch is sum(c) per cell over the log. "
    "The deliberate contrast with streaming_hll_users: CMS cells "
    "merge by SUM — associative (stream == batch, which is exactly "
    "what the batch oracle checks) but NOT replay-idempotent, so "
    "exactly-once genuinely depends on the idempotent_foreach_batch "
    "marker layer (the contrast test pins the double-count without "
    "markers). Same d=4/w=256 md5 grid as sketch_count_min_users, so "
    "the BATCH oracle text verifies the streamed counters verbatim.",
)
def streaming_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _sh

    from .functions.sketches import CMS_WIDTH as _W
    from .functions.sketches import cms_estimates
    from .streaming.events import run_streaming_cms

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_stream_cms_{tag}"
    _sh.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select("user_id")
    src = f"{base}/src"
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    counters = run_streaming_cms(spark, src, "user_id", f"{base}/work")
    keys = events.groupBy(
        F.col("user_id").cast("string").alias("k")
    ).agg(F.count("*").cast("bigint").alias("exact_n"))
    est = cms_estimates(counters, keys)
    total = events.agg(F.count("*").cast("double").alias("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            "exact_n",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_n")).alias("lower_ok"),
            (
                (F.col("cms_est") - F.col("exact_n")).cast("double")
                <= F.lit(2.718281828459045 / _W) * F.col("n_total")
            ).alias("upper_ok"),
        )
    )


# =====================================================================
# Streaming windowed HLL (per-hour cardinality through the stream)
# =====================================================================

_HLL_HOURLY_DUCK = """
WITH keys AS (SELECT DISTINCT CAST(date_trunc('hour', ts) AS VARCHAR) AS grp,
                              user_id AS k
              FROM events),
h AS (SELECT grp, {idx} AS idx,
             substr(md5(CAST(k AS VARCHAR)), 3, 12) AS h12 FROM keys),
r AS (SELECT grp, idx, length({re0}) AS lz,
             substr(h12, length({re0}) + 1, 1) AS nib FROM h),
rho AS (SELECT grp, idx,
          CASE WHEN lz = 12 THEN 49
               ELSE 4 * lz + CASE WHEN {nv} >= 8 THEN 1
                                  WHEN {nv} >= 4 THEN 2
                                  WHEN {nv} >= 2 THEN 3 ELSE 4 END
          END AS rho
        FROM r),
regs AS (SELECT grp, idx, max(rho) AS m FROM rho GROUP BY grp, idx),
grid AS (SELECT g.grp, s.idx
         FROM (SELECT DISTINCT grp FROM regs) g
         CROSS JOIN (SELECT unnest(range(0, 256)) AS idx) s),
fullr AS (SELECT gr.grp, gr.idx, COALESCE(a.m, 0) AS m
          FROM grid gr LEFT JOIN regs a
            ON gr.grp = a.grp AND gr.idx = a.idx),
est AS (SELECT grp, sum((CAST(1 AS BIGINT) << (49 - m))) AS s,
               sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM fullr GROUP BY grp),
raw AS (SELECT grp, v, (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0
                       * 562949953421312.0 / CAST(s AS DOUBLE) AS e
        FROM est),
corr AS (SELECT grp, v, CASE WHEN e <= 640.0 AND v > 0
                             THEN 256.0 * ln(256.0 / v) ELSE e END AS e
         FROM raw),
exact AS (SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS grp,
                 count(DISTINCT user_id) AS n
          FROM events GROUP BY 1)
SELECT c.grp AS win, CAST(x.n AS BIGINT) AS n_exact,
  floor(c.e * 100) / 100 AS hll_est,
  floor(abs(c.e - x.n) / x.n * 10000) / 10000 AS rel_err,
  CAST(256 - c.v AS BIGINT) AS registers_set
FROM corr c JOIN exact x ON c.grp = x.grp
ORDER BY win
""".format(
    idx=(
        "((strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1) * 16 + "
        "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1))"
    ),
    re0="regexp_extract(h12, '^0*')",
    nv="(strpos('0123456789abcdef', nib) - 1)",
)


@register(
    "streaming_hll_hourly_users",
    _HLL_HOURLY_DUCK,
    doc="STREAMING per-tumbling-hour cardinality: the events stream "
    "maintains one 256-register HLL per hour window (max-merged "
    "deltas per micro-batch), then every window's bias-corrected "
    "estimate lands next to the exact per-hour distinct count — the "
    "cardinality-dashboard pattern (distinct users per hour, forever, "
    "at 256 rows of state per window: late data keeps merging with no "
    "watermark-dropped accuracy and no count-distinct shuffle). "
    "Oracle = the batch per-hour register chain over the same keys, "
    "so stream == batch is value-checked per window.",
)
def streaming_hll_hourly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _sh

    from .functions.sketches import hll_estimate_by_group
    from .streaming.events import run_streaming_hll_windows

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_stream_hllw_{tag}"
    _sh.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src = f"{base}/src"
    events.repartition(4).write.parquet(src)
    regs = run_streaming_hll_windows(spark, src, "user_id", "ts", f"{base}/work")
    est = hll_estimate_by_group(regs, "win")
    exact = events.groupBy(
        F.expr("CAST(date_trunc('hour', ts) AS STRING)").alias("win")
    ).agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
    return (
        est.join(exact, "win")
        .select(
            "win",
            "n_exact",
            (F.floor(F.col("e") * 100) / 100).alias("hll_est"),
            (
                F.floor(
                    F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact") * 10000
                )
                / 10000
            ).alias("rel_err"),
            "registers_set",
        )
        .orderBy("win")
    )
