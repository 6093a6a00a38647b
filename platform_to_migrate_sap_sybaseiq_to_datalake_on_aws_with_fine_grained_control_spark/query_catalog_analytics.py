"""Product-analytics / IR / layout catalog entries (round 5).

The behavioral-analytics surface every event-warehouse user of the
reference platform runs downstream of the extraction (funnels,
retention, drift monitoring), plus BM25 keyword search over the
document corpus, exact n-gram span dedup, UNPIVOT, and z-order
clustering.  Registered into the same ``_CATALOG`` as
``query_catalog``; every entry is value-checked against DuckDB.

Determinism: every float aggregate is rounded, every LIMIT/ntile sits
under a total order (unique tiebreak), timestamps never appear raw in
an output column (module docstring of ``query_catalog``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.temporal import epoch_us
from .operators.dedup import shared_ngram_spans
from .operators.layout import exact_ntile, zorder_key, zorder_key_sql
from .query_catalog import register, sql_query
from .query_oracle_shared import (
    BIGRAM_ADD_K,
    bigram_ppl_duck_sql as _bigram_ppl_duck_sql,
    values_oracle as _values_oracle_shared,
)
from .sources.registry import load_table

# ---- shared constants (Spark impl and oracle MUST agree) -------------

FUNNEL_VIEW_WINDOW_US = 3_600_000_000  # signup -> view within 1 h
FUNNEL_PURCHASE_WINDOW_US = 1_800_000_000  # view -> purchase within 30 min
PSI_BIN_WIDTH = 50.0
PSI_BINS = 10
PSI_SPLIT_DATE = "2024-01-16"
BM25_TERMS = ("spark", "join", "hash")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
SHARED_NGRAM_N = 8
ZORDER_BITS = 16
ZORDER_BUCKETS = 16


# =====================================================================
# Ordered funnel conversion (signup -> view -> purchase with windows)
# =====================================================================

def _funnel_sql(epoch: str) -> str:
    """Min-timestamp cascade funnel; ``epoch`` is the dialect's
    micros-since-epoch idiom applied to a timestamp expression."""
    return f"""
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
      JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t0
        AND {epoch.format('e.ts')} - {epoch.format('s.t0')}
            <= {FUNNEL_VIEW_WINDOW_US}
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1
        AND {epoch.format('e.ts')} - {epoch.format('v.t1')}
            <= {FUNNEL_PURCHASE_WINDOW_US}
      GROUP BY e.user_id)
SELECT * FROM (
  SELECT 'signup' AS stage, 1 AS stage_ord,
         CAST(count(*) AS BIGINT) AS users FROM s
  UNION ALL SELECT 'view_1h', 2, CAST(count(*) AS BIGINT) FROM v
  UNION ALL SELECT 'purchase_30m', 3, CAST(count(*) AS BIGINT) FROM p
) funnel ORDER BY stage_ord
"""


sql_query(
    "events_funnel_conversion",
    _funnel_sql("unix_micros(CAST({0} AS TIMESTAMP))"),
    _funnel_sql("epoch_us({0})"),
    doc="Ordered conversion funnel (signup -> view within 1 h -> purchase "
    "within 30 min of the view) via a min-timestamp cascade: three keyed "
    "aggregations + two equi-joins on user_id, no window over raw event "
    "rows, no self-join explosion.  Each stage's frame shrinks, so at "
    "100 TB the later joins ride AQE's runtime-size broadcasts.  NTZ-safe "
    "via the unix_micros(CAST) idiom.",
)


# =====================================================================
# Retention cohorts (daily cohort x day offset triangle)
# =====================================================================

def _retention_sql(datediff_expr: str, strtype: str = "VARCHAR") -> str:
    return f"""
WITH first_ev AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
                  FROM events GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day
             FROM events)
SELECT CAST(f.cohort_day AS {strtype}) AS cohort_day,
       CAST({datediff_expr} AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS users
FROM first_ev f JOIN activity a ON f.user_id = a.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


sql_query(
    "events_retention_cohorts",
    _retention_sql("datediff(a.activity_day, f.cohort_day)", "STRING"),
    _retention_sql("datediff('day', f.cohort_day, a.activity_day)", "VARCHAR"),
    doc="Classic retention triangle: cohort = date of a user's first "
    "event, one row per (cohort_day, day_offset) with distinct active "
    "users.  Two aggregations on user_id (same shuffle key, reused "
    "exchange) + one equi-join; the DISTINCT activity projection caps "
    "the join input at users x days regardless of event volume.",
)


# =====================================================================
# PSI distribution drift (baseline vs current period)
# =====================================================================

_PSI_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN CAST(ts AS DATE) < DATE '{PSI_SPLIT_DATE}'
              THEN 'base' ELSE 'cur' END AS period,
         LEAST(CAST(floor(value / {PSI_BIN_WIDTH}) AS INT), {PSI_BINS - 1}) AS bin
  FROM events),
counts AS (
  SELECT event_type, bin,
         count(*) FILTER (WHERE period = 'base') AS nb,
         count(*) FILTER (WHERE period = 'cur') AS nc
  FROM binned GROUP BY 1, 2),
tot AS (SELECT event_type, sum(nb) AS tb, sum(nc) AS tc
        FROM counts GROUP BY 1)
SELECT c.event_type,
       round(sum( ((c.nb + 1.0) / (t.tb + {PSI_BINS}.0)
                   - (c.nc + 1.0) / (t.tc + {PSI_BINS}.0))
                * ln( ((c.nb + 1.0) / (t.tb + {PSI_BINS}.0))
                    / ((c.nc + 1.0) / (t.tc + {PSI_BINS}.0)) ) ), 6) AS psi
FROM counts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type ORDER BY c.event_type
"""

sql_query(
    "events_psi_drift",
    _PSI_SQL,
    doc="Population Stability Index drift monitor: fixed-width value "
    "bins, Laplace-smoothed (+1 per observed bin) base-vs-current "
    "proportions, PSI per event_type.  One FILTER-pivoted aggregation "
    "over (type, bin) — a few hundred rows after the first groupBy no "
    "matter the input size, so drift checks on 100 TB cost one scan.  "
    "Identical ANSI text runs on both engines.",
)


# =====================================================================
# BM25 keyword search over documents
# =====================================================================

def _bm25_sql(tokenize: str) -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {tokenize} AS tok FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 (SELECT avg(dl) FROM dl) AS avgdl FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
       WHERE tok IN ({terms}) GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM toks
       WHERE tok IN ({terms}) GROUP BY tok)
SELECT t.doc_id,
       round(sum( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                * t.tf * {BM25_K1 + 1.0}
                / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * d.dl / s.avgdl)) ),
             4) AS bm25
FROM tf t JOIN df f ON t.tok = f.tok
JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN stats s
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id LIMIT {BM25_TOPK}
"""


sql_query(
    "text_bm25_search",
    _bm25_sql("explode(split(text, ' '))"),
    _bm25_sql("unnest(string_split(text, ' '))"),
    doc="Lucene-flavored BM25 (k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)) "
    "top-10 for a fixed conjunctive term set.  The tf table is filtered to "
    "the query terms BEFORE any join (matching-postings rows only, the "
    "inverted-index access path); df and corpus stats are scalar-broadcast. "
    "Total order on (rounded score, doc_id) keeps the LIMIT deterministic.",
)


# =====================================================================
# Cross-document exact n-gram span dedup
# =====================================================================

_SHARED_NGRAM_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE len(string_split(text, ' ')) >= {SHARED_NGRAM_N}),
pos AS (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {SHARED_NGRAM_N - 1})) AS i
        FROM toks),
ngrams AS (SELECT doc_id, array_to_string(t[i:i + {SHARED_NGRAM_N - 1}], ' ') AS g
           FROM pos),
gcount AS (SELECT g, count(DISTINCT doc_id) AS nd FROM ngrams GROUP BY g)
SELECT n.doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(count(*) FILTER (WHERE c.nd >= 2) AS BIGINT) AS n_shared,
       round(CAST(count(*) FILTER (WHERE c.nd >= 2) AS DOUBLE) / count(*), 4)
         AS shared_ratio
FROM ngrams n JOIN gcount c ON n.g = c.g
GROUP BY n.doc_id
"""


@register(
    "dedup_shared_ngram_spans",
    _SHARED_NGRAM_ORACLE,
    doc="Exact-substring dedup discretized to token 8-grams (Lee et al. "
    "ACL 2022): per document, how many of its 8-gram positions occur in "
    "at least one other document.  O(total tokens) n-gram table, one "
    "doc-frequency groupBy, one equi-join back — no document self-join.",
)
def dedup_shared_ngram_spans_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return shared_ngram_spans(docs, "doc_id", "text", n=SHARED_NGRAM_N)


# =====================================================================
# UNPIVOT / melt
# =====================================================================

_UNPIVOT_MEASURES = ["sum_qty", "sum_price", "sum_disc", "sum_tax"]

_UNPIVOT_ORACLE = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_discount), 2) AS sum_disc,
         round(sum(l_tax), 2) AS sum_tax
  FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, measure, amount
FROM agg UNPIVOT (amount FOR measure IN ({', '.join(_UNPIVOT_MEASURES)}))
"""


@register(
    "unpivot_lineitem_measures",
    _UNPIVOT_ORACLE,
    doc="Wide-to-long UNPIVOT/melt: per-(flag, status) measure sums "
    "rotated into (measure, amount) rows via the native DataFrame "
    "``unpivot`` (Expand node — no join, no shuffle beyond the "
    "aggregation's own exchange).",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        F.round(F.sum("l_tax"), 2).alias("sum_tax"),
    )
    return agg.unpivot(
        ["l_returnflag", "l_linestatus"],
        _UNPIVOT_MEASURES,
        "measure",
        "amount",
    )


# =====================================================================
# Z-order clustering layout
# =====================================================================

_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         {zorder_key_sql(
             '(user_id & 65535)',
             f'(CAST(floor(epoch_us(ts) / 60000000) AS BIGINT) & 65535)',
             ZORDER_BITS,
         )} AS zkey
  FROM events),
bucketed AS (
  SELECT *, ntile({ZORDER_BUCKETS}) OVER (ORDER BY zkey, event_id) AS bucket
  FROM keyed)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(user_id) AS min_user, max(user_id) AS max_user,
       min(day) AS min_day, max(day) AS max_day
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@register(
    "layout_zorder_events",
    _ZORDER_ORACLE,
    doc="Z-order (Morton) clustering readout: interleave (user_id, "
    "epoch-minute) bits, split the key space into 16 contiguous range "
    "buckets, report per-bucket min/max of BOTH dimensions — the "
    "file-level stats a z-ordered write produces, which let the scan "
    "prune on either column.  The write path is "
    "``operators.layout.zorder_layout`` (repartitionByRange + "
    "sortWithinPartitions on the key); file assignment here is "
    "``exact_ntile`` — bit-identical to the oracle's NTILE but "
    "distributed (range partitions + per-partition windows + "
    "O(partitions) offsets), never the single-task global window.",
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("date").cast("string").alias("day"),
        zorder_key(
            F.col("user_id").bitwiseAND(F.lit(65535)),
            F.floor(epoch_us(F.col("ts")) / 60_000_000)
            .cast("bigint")
            .bitwiseAND(F.lit(65535)),
            ZORDER_BITS,
        ).alias("zkey"),
    )
    return (
        exact_ntile(keyed, ["zkey", "event_id"], ZORDER_BUCKETS, out="bucket")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .orderBy("bucket")
    )


# =====================================================================
# Robust (median/MAD) outlier detection
# =====================================================================

def _mad_sql(p50: str) -> str:
    """``p50`` is the dialect's exact interpolating median aggregate."""
    return f"""
WITH med AS (SELECT event_type, {p50.format('value')} AS med
             FROM events GROUP BY 1),
dev AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        FROM events e JOIN med m ON e.event_type = m.event_type),
mad AS (SELECT event_type, {p50.format('dev')} AS mad FROM dev GROUP BY 1)
SELECT d.event_type,
       round(max(d.med), 4) AS med,
       round(max(m2.mad), 4) AS mad,
       CAST(count(*) FILTER (WHERE d.dev > 3 * 1.4826 * m2.mad) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
GROUP BY d.event_type ORDER BY d.event_type
"""


sql_query(
    "events_mad_outliers",
    _mad_sql("percentile({0}, 0.5)"),
    _mad_sql("quantile_cont({0}, 0.5)"),
    doc="Robust outlier detection per event_type: median + MAD "
    "(median absolute deviation), flagging |x - med| > 3 sigma-hat "
    "(1.4826*MAD) — immune to the outliers themselves, unlike the "
    "z-score entry.  Two median aggregations on the same grouping key "
    "(reused exchange) + one small broadcast join back.",
)


# =====================================================================
# Equal-frequency quantile binning
# =====================================================================

_NTILE_BIN_SQL = """
WITH b AS (SELECT o_totalprice,
                  ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
           FROM orders)
SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM b GROUP BY bucket ORDER BY bucket
"""

@register(
    "quantile_binning_prices",
    _NTILE_BIN_SQL,
    doc="Equal-frequency decile binning of order totals (feature "
    "bucketing for ML preprocessing) — exact NTILE semantics under a "
    "total order, computed by operators.layout.exact_ntile: range "
    "partitions + per-partition windows + O(partitions) offsets, "
    "bit-identical to the oracle's global-window NTILE without its "
    "single-task funnel.  (approx_percentile + width_bucket is the "
    "cheaper inexact alternative; exact_ntile keeps the oracle-"
    "checkable values AND scales.)",
)
def quantile_binning_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    binned = exact_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        10,
        out="bucket",
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# =====================================================================
# TF-IDF top terms per document
# =====================================================================

def _tfidf_sql(tokenize: str) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {tokenize} AS tok FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       FROM toks GROUP BY doc_id, tok),
dfr AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks GROUP BY tok),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (SELECT t.doc_id, t.tok,
                  round(t.tf * ln(n.n / f.df), 6) AS tfidf
           FROM tf t JOIN dfr f ON t.tok = f.tok CROSS JOIN nd n),
ranked AS (SELECT doc_id, tok, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, tok) AS rk
           FROM scored)
SELECT doc_id, tok AS term, tfidf, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
"""


sql_query(
    "text_tfidf_top_terms",
    _tfidf_sql("explode(split(text, ' '))"),
    _tfidf_sql("unnest(string_split(text, ' '))"),
    doc="Top-3 TF-IDF terms per document (keyword extraction): tf and "
    "df from the same tokenization, idf = ln(N/df), per-doc "
    "row_number window under a (rounded score, term) total order.  "
    "The df table and the 1-row corpus count broadcast; the per-doc "
    "window shuffles once on doc_id.",
)


# =====================================================================
# Inverted-index postings materialization
# =====================================================================

_POSTINGS_TERMS = ("spark", "join", "hash", "scan", "filter")


def _postings_sql(tokenize: str, listagg: str) -> str:
    terms = ", ".join(f"'{t}'" for t in _POSTINGS_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {tokenize} AS tok FROM documents)
SELECT tok AS term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       {listagg} AS postings
FROM toks WHERE tok IN ({terms})
GROUP BY tok ORDER BY tok
"""


sql_query(
    "text_inverted_postings",
    _postings_sql(
        "explode(split(text, ' '))",
        "array_join(transform(array_sort(collect_set(doc_id)),"
        " x -> cast(x AS STRING)), ',')",
    ),
    _postings_sql(
        "unnest(string_split(text, ' '))",
        "array_to_string(list_sort(list(DISTINCT doc_id)), ',')",
    ),
    doc="Inverted-index postings for a fixed dictionary: df + the "
    "sorted doc-id posting list per term (comma-joined for the "
    "canonicalizer).  The WHERE prunes the token stream to dictionary "
    "hits before the aggregation — the materialization pass behind "
    "the BM25 entry's access path.",
)


# =====================================================================
# Perceptual image dedup groups (planted duplicates)
# =====================================================================

def _ahash_dup_golden() -> list[tuple]:
    """Golden dup groups from the generator's pre-encode pixel SPEC:
    every even-id image is re-labeled (+1000) as a planted duplicate, so
    each group is exactly {i, i+1000} — derived without touching the PNG
    bytes, which keeps the distributed decode->hash->group round trip
    honestly under test."""
    import numpy as np

    from .operators.multimodal import (
        resize_nearest,
        synthetic_asset_rows,
        synthetic_image_pixels,
    )

    rows = []
    for asset_id, media, _p, _n, _u in synthetic_asset_rows(64):
        if media != "image" or asset_id % 2 != 0:
            continue
        small = resize_nearest(synthetic_image_pixels(asset_id), 8, 8).astype(
            np.int64
        )
        mean = int(small.sum()) // 64
        v = 0
        for bit in (small >= mean).flatten():
            v = (v << 1) | int(bit)
        rows.append(
            (f"{v:016x}", 2, asset_id, f"{asset_id},{asset_id + 1000}")
        )
    rows.sort()
    return rows


def _ahash_dup_oracle() -> str:
    return _values_oracle_shared(
        _ahash_dup_golden(),
        [
            ("ahash", "VARCHAR"),
            ("n_members", "BIGINT"),
            ("min_asset", "BIGINT"),
            ("members", "VARCHAR"),
        ],
    )


@register(
    "mm_image_dup_groups",
    _ahash_dup_oracle(),
    doc="Exact perceptual image dedup end-to-end: plant a re-labeled "
    "copy of every even-id image, PNG-decode + aHash via Arrow-batched "
    "mapInPandas, then ONE map-side-combined groupBy on the hash "
    "(never a pairwise image compare) — groups of >=2 are the "
    "duplicate sets.  Oracle = golden groups from the pre-encode "
    "pixel spec.",
)
def mm_image_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import image_ahash, make_synthetic_assets

    assets = make_synthetic_assets(spark, 64)
    planted = (
        assets.filter(
            (F.col("media_type") == "image") & (F.col("asset_id") % 2 == 0)
        )
        .withColumn("asset_id", F.col("asset_id") + 1000)
    )
    hashes = image_ahash(assets.unionByName(planted))
    return (
        hashes.groupBy("ahash")
        .agg(
            F.count("*").alias("n_members"),
            F.min("asset_id").alias("min_asset"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("asset_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("ahash")
    )


# =====================================================================
# Token-budget corpus mix (uniform per-language rebalance)
# =====================================================================

MIX_BUDGET_FRAC = 0.3


def _mix_sql(tokens: str) -> str:
    return f"""
WITH d AS (SELECT doc_id, lang, n_chars, {tokens} AS toks FROM documents),
tot AS (SELECT CAST(floor({MIX_BUDGET_FRAC} * sum(toks) / count(DISTINCT lang))
               AS BIGINT) AS budget FROM d),
c AS (SELECT lang, toks,
             sum(toks) OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id) AS cum
      FROM d)
SELECT c.lang,
       max(t.budget) AS budget_tokens,
       CAST(count(*) FILTER (WHERE c.cum <= t.budget) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(sum(c.toks) FILTER (WHERE c.cum <= t.budget), 0) AS BIGINT)
         AS tokens_kept
FROM c CROSS JOIN tot t
GROUP BY c.lang ORDER BY c.lang
"""


sql_query(
    "corpus_token_budget_mix",
    _mix_sql("size(split(text, ' '))"),
    _mix_sql("len(string_split(text, ' '))"),
    doc="Training-mix scheduling: give every language an equal share of "
    f"a {MIX_BUDGET_FRAC:.0%}-of-corpus token budget (upweighting rare "
    "languages, the standard rebalancing move), fill each share "
    "best-documents-first (n_chars desc, doc_id tiebreak) via one "
    "per-language cumulative-sum window, report kept docs/tokens vs "
    "budget.  One window shuffle on lang + a 1-row broadcast budget; "
    "the budget is derived from the data so the entry is "
    "scale-factor-invariant.",
)


# =====================================================================
# Quality-weighted deterministic sampling
# =====================================================================

_WEIGHTED_SAMPLE_ORACLE = """
WITH m AS (SELECT max(n_chars) AS maxc FROM documents),
k AS (SELECT lang, doc_id, n_chars,
             CAST((strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS INT) AS bucket,
             CAST(floor(256.0 * n_chars / m.maxc) AS INT) AS rate
      FROM documents CROSS JOIN m)
SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE bucket < rate) AS BIGINT) AS n_kept
FROM k GROUP BY lang ORDER BY lang
"""


@register(
    "sample_weighted_by_quality",
    _WEIGHTED_SAMPLE_ORACLE,
    doc="Per-row weighted Bernoulli sampling "
    "(operators/chunking.py:weighted_sample): inclusion probability "
    "proportional to document length (quality proxy), decided by the "
    "same md5 hash-bucket idiom as the stratified sampler — fully "
    "deterministic across engines/runs/retries, no RNG.  Narrow "
    "filter + one small aggregation; the length normalizer is a 1-row "
    "broadcast.",
)
def sample_weighted_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.chunking import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    maxc = docs.agg(F.max("n_chars").alias("maxc"))
    rated = docs.crossJoin(F.broadcast(maxc))
    kept = weighted_sample(
        rated, "doc_id", F.col("n_chars") / F.col("maxc")
    ).select("lang", "doc_id")
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_total"))
        .join(
            kept.groupBy("lang").agg(F.count("*").alias("n_kept")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        )
        .orderBy("lang")
    )


# =====================================================================
# Event-type transition matrix (first-order Markov)
# =====================================================================

_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
"""

sql_query(
    "events_transition_matrix",
    _TRANSITION_SQL,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() window on (user_id, time) then a (from, to) "
    "count with row-normalized probabilities via a window over the "
    "aggregate.  One keyed window shuffle + one 25-row aggregate; "
    "identical ANSI text on both engines.",
)


# =====================================================================
# Unigram LM surprisal scoring
# =====================================================================

def _unigram_sql(tokenize: str) -> str:
    return f"""
WITH toks AS (SELECT doc_id, {tokenize} AS tok FROM documents),
uni AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(u.c / s.n)), 4) AS avg_nll
FROM toks t JOIN uni u ON t.tok = u.tok CROSS JOIN tot s
GROUP BY t.doc_id
"""


# =====================================================================
# Temperature-based language mix (alpha-sampling, XLM-R style)
# =====================================================================

MIX_TEMPERATURE_ALPHA = 0.3


def _temp_mix_sql(fold: str) -> str:
    """``fold`` is the dialect's ORDER-DETERMINISTIC sum of the
    per-language weights (a left fold in lang order — a plain sum()
    of non-integral doubles would depend on aggregation order)."""
    a = MIX_TEMPERATURE_ALPHA
    return f"""
WITH langs AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
               FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS nn FROM langs),
wt AS (SELECT lang, n, n / t.nn AS p, pow(n / t.nn, {a}) AS w
       FROM langs, tot t),
norm AS (SELECT {fold} AS tw FROM wt)
SELECT wt.lang, CAST(wt.n AS BIGINT) AS n_docs,
  floor(wt.p * 1000000) / 1000000 AS p_native,
  floor(wt.w / nm.tw * 1000000) / 1000000 AS p_sampled,
  floor((wt.w / nm.tw) / wt.p * 10000) / 10000 AS sample_rate,
  CAST(floor(wt.w / nm.tw * t.nn) AS BIGINT) AS expected_docs
FROM wt, norm nm, tot t
ORDER BY wt.lang
"""


sql_query(
    "corpus_temperature_mix",
    _temp_mix_sql(
        "aggregate(array_sort(collect_list(struct(lang, w))), "
        "CAST(0 AS DOUBLE), (acc, s) -> acc + s.w)"
    ),
    _temp_mix_sql("list_reduce(list(w ORDER BY lang), (a, b) -> a + b)"),
    doc="Temperature-based multilingual sampling (the XLM-R / mT5 "
    f"alpha-mix, alpha={MIX_TEMPERATURE_ALPHA}): per-language "
    "probability p^alpha renormalized — rare languages upsample, "
    "dominant ones downsample, the standard knob between native "
    "proportions (alpha=1) and uniform (alpha=0). Emits native vs "
    "sampled shares, the per-language sampling rate, and expected "
    "document allocation at corpus size. The weight normalizer is an "
    "ORDER-DETERMINISTIC left fold in lang order (collect_list + "
    "aggregate / list(ORDER BY) + list_reduce) — a plain sum() of "
    "non-integral doubles would be aggregation-order-dependent and "
    "break cross-engine bit parity. One groupBy(lang) scan; "
    "everything after is a handful of rows.",
)


# =====================================================================
# CCNet-style bigram-LM perplexity bucketing (head / middle / tail)
# =====================================================================



def bigram_perplexity_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of the CCNet bigram-perplexity scorer.

    The SQL form inlines the ``bg`` CTE three times (bigram counts,
    context counts, scoring), so the tokenize+explode — the dominant
    cost at corpus scale — would run three times plus once more for
    the vocab.  Here the bigram stream is computed ONCE and persisted
    (the ``minhash_feature_table`` pattern; at 100 TB this is a
    parquet-materialized LM-count table reused across runs), cutting
    the plan from 4 document scans to 2.  Arithmetic is expression-
    identical to the DuckDB oracle text.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "concat(element_at(t, i), ' ', element_at(t, i + 1)) AS big))"
                )
            ).alias("pair"),
        )
        .select("doc_id", "pair.w1", "pair.big")
    )
    bg.persist()
    cnt = bg.groupBy("big").agg(F.count("*").cast("double").alias("c"))
    ctx = bg.groupBy("w1").agg(F.count("*").cast("double").alias("cw"))
    voc = docs.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").cast("double").alias("v")
    )
    scored = (
        bg.join(cnt, "big")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .withColumn(
            "nll",
            -F.log(
                (F.col("c") + BIGRAM_ADD_K)
                / (F.col("cw") + BIGRAM_ADD_K * F.col("v"))
            ),
        )
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (F.floor(F.exp(F.avg("nll")) * 10000) / 10000).alias("ppl"),
    )
    # the tercile needs a corpus-total order over DOC rows — that used
    # to be a degenerate 1-partition window (pmod(hash,1): silenced
    # the warning, kept the single-task funnel); exact_ntile is the
    # distributed bit-identical form (range partitions +
    # per-partition windows + O(partitions) offsets)
    binned = exact_ntile(perdoc, ["ppl", "doc_id"], 3, out="_bucket")
    return binned.select(
        "doc_id",
        "n_bigrams",
        "ppl",
        F.when(F.col("_bucket") == 1, "head")
        .when(F.col("_bucket") == 2, "middle")
        .otherwise("tail")
        .alias("ccnet_bucket"),
    )




@register(
    "text_bigram_perplexity",
    _bigram_ppl_duck_sql(),
    doc="CCNet-style perplexity bucketing: an add-k smoothed BIGRAM "
    "LM trained on the corpus itself scores every document "
    "(perplexity = exp of mean negative log conditional likelihood), "
    "then documents split into head/middle/tail terciles — the "
    "quality-stratification step of the CCNet pipeline (Wenzek et al. "
    "2020), where 'head' (lowest perplexity) is the cleanest training "
    "slice. Scale shape: the bigram stream is tokenized ONCE and "
    "persisted (4 document scans -> 2 vs the naive CTE plan; at "
    "100 TB a parquet-materialized LM-count table reused across "
    "runs); counts are two hash aggregations over it; scoring "
    "re-joins it to both count tables on token keys (shuffled "
    "equi-joins, Zipf-truncatable); vocab size is a 1-row scalar "
    "broadcast. The tercile ranks DOCUMENTS on the floor-scaled ppl "
    "with doc_id tiebreak via exact_ntile (distributed, bit-identical "
    "to the oracle's NTILE — no single-task funnel over the corpus-"
    "cardinality per-doc frame).",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_perplexity_df(spark, sf_dir)


sql_query(
    "text_unigram_logprob",
    _unigram_sql("explode(split(text, ' '))"),
    _unigram_sql("unnest(string_split(text, ' '))"),
    doc="Unigram LM surprisal per document (mean negative log "
    "likelihood under corpus unigram frequencies) — the cheapest "
    "perplexity-style quality signal for corpus filtering; documents "
    "of rare tokens score high, boilerplate scores low.  The unigram "
    "table broadcasts; per-doc aggregation shuffles once on doc_id.",
)


# =====================================================================
# Session duration statistics (gaps-and-islands full sessions)
# =====================================================================

def _session_stats_sql(epoch: str) -> str:
    return f"""
WITH o AS (SELECT user_id, {epoch} AS es,
                  lag({epoch}) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_es
           FROM events),
m AS (SELECT user_id, es,
             CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, es,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY es) AS session_id
      FROM m),
sess AS (SELECT user_id, session_id,
                max(es) - min(es) AS dur_s,
                count(*) AS n_events
         FROM s GROUP BY user_id, session_id)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       round(avg(dur_s), 2) AS avg_dur_s,
       round(max(dur_s), 2) AS max_dur_s,
       round(avg(CAST(n_events AS DOUBLE)), 4) AS avg_events,
       CAST(max(n_events) AS BIGINT) AS max_events
FROM sess
"""


sql_query(
    "events_session_stats",
    _session_stats_sql("(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 1000000.0)"),
    _session_stats_sql("epoch(ts)"),
    doc="Session duration/size distribution over the full "
    "gaps-and-islands sessionization (30-min gap): conditional-cumsum "
    "session ids, per-session duration + event count, global "
    "aggregate.  Two windows on the same (user_id, time) ordering — "
    "one shuffle, one sort, reused across both — then two hash "
    "aggregations; NTZ-safe epoch idiom.",
)


# =====================================================================
# One-pass column profiling (Deequ-style)
# =====================================================================

_PROFILE_SQL = """
SELECT * FROM (
SELECT 'lang' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(lang) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct,
       CAST(min(lang) AS VARCHAR) AS min_val,
       CAST(max(lang) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT),
       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
       CAST(count(DISTINCT n_chars) AS BIGINT),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
FROM documents
) p ORDER BY col_name
"""

sql_query(
    "profile_documents",
    _PROFILE_SQL.replace("AS VARCHAR", "AS STRING"),
    _PROFILE_SQL,
    doc="Deequ-style column profile (completeness, distinctness, "
    "min/max) for the documents table — the data-quality summary a "
    "pipeline records per ingest batch.  Catalyst merges the three "
    "branch scans of the UNION into grouped aggregations over one "
    "pass' worth of I/O; output is O(columns).",
)


# =====================================================================
# Rolling 7-day distinct users (bounded-explode rolling distinct)
# =====================================================================

_ROLL_TMPL = (
    "WITH ud AS (SELECT DISTINCT user_id, {eday} AS e FROM events), "
    "contrib AS (SELECT user_id, {exploder} AS wd FROM ud), "
    "days AS (SELECT DISTINCT e FROM ud) "
    "SELECT CAST({wdate} AS STRING) AS day, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS users_7d "
    "FROM contrib JOIN days ON contrib.wd = days.e "
    "GROUP BY wd ORDER BY wd"
)

sql_query(
    "events_rolling_distinct_users",
    _ROLL_TMPL.format(
        eday="datediff(CAST(ts AS DATE), DATE '1970-01-01')",
        exploder="explode(sequence(e, e + 6))",
        wdate="date_add(DATE '1970-01-01', wd)",
    ),
    _ROLL_TMPL.format(
        eday="date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))",
        exploder="unnest(range(e, e + 7))",
        wdate="DATE '1970-01-01' + CAST(wd AS INT)",
    ),
    doc="Trailing 7-day distinct user count per day. Rolling DISTINCT "
    "is not a window aggregate (distinct state can't merge across "
    "frames), so the scale-correct form dedups to (user, day) FIRST "
    "— collapsing the event stream to at most |users| x |days| rows "
    "— then explodes each surviving pair into the <= 7 window days "
    "it serves and counts distinct per window day. The explode is "
    "bounded by the window length, NOT event volume: 100 TB of "
    "events still contributes at most 7 x |users x days| rows to "
    "the final count. Day keys ride as epoch-day ints (engine-"
    "neutral date arithmetic), stringified on output per the DATE "
    "canonicalization rule.",
)


# =====================================================================
# Malformed-record quarantine routing (ingestion error handling)
# =====================================================================

_QUAR_TMPL = (
    "WITH raw AS (SELECT event_id, value, "
    "CASE WHEN event_id % 7 = 0 THEN replace(props, '{{', '') "
    "ELSE props END AS praw FROM events), "
    "parsed AS (SELECT event_id, value, {extract} AS k FROM raw) "
    "SELECT CASE WHEN k IS NULL THEN 'quarantine' ELSE 'ok' END "
    "AS route, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k, "
    "floor(avg(value) * 10000) / 10000 AS avg_value "
    "FROM parsed GROUP BY CASE WHEN k IS NULL THEN 'quarantine' "
    "ELSE 'ok' END ORDER BY route"
)

sql_query(
    "json_quarantine_routing",
    _QUAR_TMPL.format(extract="get_json_object(praw, '$.k')"),
    _QUAR_TMPL.format(
        extract="CASE WHEN json_valid(praw) "
        "THEN json_extract_string(praw, '$.k') END"
    ),
    doc="Malformed-record quarantine routing — the ingestion "
    "error-handling pattern (badRecordsPath / PERMISSIVE "
    "_corrupt_record, expressed engine-neutrally): a deterministic "
    "corruption (brace-stripped JSON on %7 keys) is parsed, rows "
    "whose extraction fails route to 'quarantine', the rest to 'ok', "
    "each side carrying its own count / distinct-key / value "
    "profile. Rowwise parse + one 2-group aggregation: scan-bound, "
    "no shuffle beyond two rows. Dialect note: Spark's "
    "get_json_object is null-on-malformed; DuckDB errors on invalid "
    "JSON, so the oracle gates extraction behind json_valid.",
)


# =====================================================================
# Interval merge / coverage (gaps-and-islands over ranges)
# =====================================================================

_IVL_TMPL = (
    "WITH iv AS (SELECT user_id, {e} - 300000000 AS s, "
    "{e} + 300000000 AS e FROM events), "
    "m AS (SELECT user_id, s, e, "
    "max(e) OVER (PARTITION BY user_id ORDER BY s, e "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max "
    "FROM iv), "
    "g AS (SELECT user_id, s, e, "
    "sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END) "
    "OVER (PARTITION BY user_id ORDER BY s, e) AS island FROM m), "
    "isl AS (SELECT user_id, island, min(s) AS st, max(e) AS en "
    "FROM g GROUP BY user_id, island) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals, "
    "CAST(floor(sum(en - st) / 1000000.0) AS BIGINT) AS covered_s "
    "FROM isl GROUP BY user_id ORDER BY user_id"
)

sql_query(
    "events_interval_coverage",
    _IVL_TMPL.format(e="unix_micros(CAST(ts AS TIMESTAMP))"),
    _IVL_TMPL.format(e="epoch_us(ts)"),
    doc="Interval union per user: each event projects a +-5 min "
    "activity interval; overlapping intervals merge via the "
    "cumulative-max-end gaps-and-islands pattern (an island starts "
    "where start > max(prior ends)), yielding merged-interval count "
    "and exact covered seconds. ONE window sort per user partition "
    "feeds both the island numbering and the merge — the range-form "
    "sibling of events_sessionize (points+gap) and the uptime/SLA "
    "coverage primitive. Dialect gotcha recorded: DuckDB "
    "CAST(DOUBLE AS BIGINT) rounds half-to-even while Spark "
    "truncates toward zero — integer-second readouts must go "
    "through floor() in both texts.",
)


# =====================================================================
# Pareto / cumulative contribution analysis
# =====================================================================

#: the 80%-crossing decision runs in EXACT integer cents (rev is
#: already round(,2), so cents = round(rev*100) reproduces it exactly
#: and 5*cum_cents >= 4*tot_cents is the same predicate with zero FP
#: ambiguity) — a double cumulative sum's association order differs
#: between the oracle's sequential window and the distributed scan,
#: and an ulp at the crossing row would flip the integer rank readout
_PARETO_ORACLE = (
    "WITH cr AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev "
    "FROM orders GROUP BY o_custkey), "
    "c2 AS (SELECT o_custkey, rev, "
    "CAST(round(rev * 100) AS BIGINT) AS cents FROM cr), "
    "r AS (SELECT o_custkey, rev, "
    "sum(cents) OVER (ORDER BY rev DESC, o_custkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c, "
    "sum(cents) OVER () AS tot_c, sum(rev) OVER () AS tot, "
    "row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk FROM c2) "
    "SELECT CAST(count(*) AS BIGINT) AS n_customers, "
    "CAST(min(CASE WHEN 5 * cum_c >= 4 * tot_c THEN rnk END) AS BIGINT) "
    "AS customers_to_80pct, "
    "floor(min(CASE WHEN 5 * cum_c >= 4 * tot_c THEN rnk END) "
    "/ CAST(count(*) AS DOUBLE) * 10000) / 10000 AS pareto_ratio, "
    "floor(max(rev) / max(tot) * 10000) / 10000 AS top1_share "
    "FROM r"
)


@register(
    "orders_pareto_customers",
    _PARETO_ORACLE,
    doc="Pareto (80/20) contribution analysis: cumulative revenue "
    "share per customer under a unique (revenue DESC, custkey) total "
    "order; emits how many customers cover 80% of revenue, that count "
    "as a fraction of all customers, and the top-1 share. Revenue "
    "aggregates per key first (map-side combined); the global rank "
    "AND running sum come from operators.layout.global_ordered_scan "
    "(range partitions + per-partition windows + O(partitions) "
    "offsets) — no single-task window over the |customers|-"
    "cardinality frame. Per-key revenue is round()ed before ranking "
    "so the order — and the rank readout — is engine-stable. The "
    "concentration readout behind skew decisions and account "
    "prioritization.",
)
def orders_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.layout import global_ordered_scan

    cr = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        # EXACT integer cents for the cumulative threshold: bigint
        # sums are association-order-free, so the distributed scan and
        # the oracle's sequential window agree bit-for-bit at the
        # 80%-crossing row (a double cumsum could flip an ulp there)
        .withColumn("cents", F.round(F.col("rev") * 100).cast("bigint"))
    )
    r = global_ordered_scan(
        cr,
        [F.col("rev").desc(), F.col("o_custkey")],
        rn_out="rnk",
        cumsum={"cum_c": "cents"},
    )
    tot = r.agg(
        F.sum("rev").alias("tot"), F.sum("cents").alias("tot_c")
    )
    hit = F.when(
        5 * F.col("cum_c") >= 4 * F.col("tot_c"), F.col("rnk")
    )
    return (
        r.join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min(hit).cast("bigint").alias("customers_to_80pct"),
            (
                F.floor(
                    F.min(hit) / F.count(F.lit(1)).cast("double") * 1e4
                )
                / 1e4
            ).alias("pareto_ratio"),
            (F.floor(F.max("rev") / F.max("tot") * 1e4) / 1e4).alias(
                "top1_share"
            ),
        )
    )


# =====================================================================
# Ordered LISTAGG (Spark 4 native) — delimited roster per group
# =====================================================================

sql_query(
    "listagg_supplier_roster",
    # Spark 4's ANSI listagg ... WITHIN GROUP; deterministic because
    # the order key (s_name) is unique per group.
    "SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers, "
    "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS roster "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n_name",
    "SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers, "
    "string_agg(s_name, ',' ORDER BY s_name) AS roster "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n_name",
    doc="Ordered string aggregation per group via Spark 4's native "
    "ANSI listagg(...) WITHIN GROUP (ORDER BY ...) — DuckDB spells it "
    "string_agg(expr, sep ORDER BY ...). Deterministic because the "
    "order key is unique within each group; one map-side-combinable "
    "aggregation after a broadcast dimension join. Replaces the "
    "array_join(array_sort(collect_list(...))) three-step the older "
    "entries used — same result, one less array materialization. "
    "(Probed and recorded: GROUPS window frames are NOT in Spark 4.1; "
    "listagg is.)",
)


# =====================================================================
# Deterministic pseudonymization with referential-integrity proof
# =====================================================================

_PSEUD_TMPL = (
    "WITH tok AS (SELECT c_custkey, {sur_c} AS surrogate FROM customer), "
    "j_raw AS (SELECT count(*) AS n FROM orders "
    "JOIN customer ON o_custkey = c_custkey), "
    "j_tok AS (SELECT count(*) AS n FROM orders "
    "JOIN tok ON {sur_o} = surrogate), "
    "card AS (SELECT count(*) AS nc, "
    "count(DISTINCT surrogate) AS ns FROM tok) "
    "SELECT CAST(nc AS BIGINT) AS n_customers, "
    "CAST(ns AS BIGINT) AS n_surrogates, "
    "CAST(j_raw.n AS BIGINT) AS orders_joined_raw, "
    "CAST(j_tok.n AS BIGINT) AS orders_joined_tokenized, "
    "nc = ns AS no_collisions, "
    "j_raw.n = j_tok.n AS referential_integrity_preserved "
    "FROM card, j_raw, j_tok"
)

sql_query(
    "pseudonymize_referential_integrity",
    _PSEUD_TMPL.format(
        sur_c="md5(concat('pseud:', CAST(c_custkey AS STRING)))",
        sur_o="md5(concat('pseud:', CAST(o_custkey AS STRING)))",
    ),
    _PSEUD_TMPL.format(
        sur_c="md5('pseud:' || CAST(c_custkey AS VARCHAR))",
        sur_o="md5('pseud:' || CAST(o_custkey AS VARCHAR))",
    ),
    doc="Governance op: keyed deterministic pseudonymization (salted "
    "md5 surrogate per customer key) with its two safety proofs read "
    "off in the same query — surrogate uniqueness (no collisions "
    "across the customer base) and referential integrity (the "
    "fact-to-dimension join row count is identical through raw keys "
    "and through surrogates, because the same salted hash applied on "
    "both sides preserves equality). Rowwise hashing + two equi-joins; "
    "at 100 TB the tokenized join behaves exactly like the raw join "
    "(same key distribution, same broadcast/shuffle choice). The "
    "scalar readout rides 1-row broadcasts (BNLJ-allowlisted).",
)


# =====================================================================
# Out-of-order arrival profile (watermark sizing input)
# =====================================================================

_OOO_TMPL = (
    "WITH seq AS (SELECT event_type, {e} AS es, "
    "max({e}) OVER (PARTITION BY event_type ORDER BY event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm "
    "FROM events) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CASE WHEN es < hwm THEN 1 ELSE 0 END) AS BIGINT) "
    "AS late_events, "
    "floor(sum(CASE WHEN es < hwm THEN 1 ELSE 0 END) "
    "/ CAST(count(*) AS DOUBLE) * 10000) / 10000 AS late_fraction, "
    "CAST(floor(COALESCE(max(CASE WHEN es < hwm THEN hwm - es END), 0) "
    "/ 1000000.0) AS BIGINT) AS max_lateness_s "
    "FROM seq GROUP BY event_type ORDER BY event_type"
)

sql_query(
    "events_out_of_order_profile",
    _OOO_TMPL.format(e="unix_micros(CAST(ts AS TIMESTAMP))"),
    _OOO_TMPL.format(e="epoch_us(ts)"),
    doc="Out-of-order arrival profile per event type: taking event_id "
    "as the arrival order, an event is late iff its event time is "
    "below the running high-water mark of everything that arrived "
    "before it — late count, late fraction, and worst lateness in "
    "seconds. This is the measurement that SIZES a Structured "
    "Streaming watermark (withWatermark delay must cover the observed "
    "lateness tail or late rows are dropped); run it on a sample "
    "before deploying any windowed streaming aggregation. One window "
    "per event-type partition (running max, no full sort beyond the "
    "partition order) feeding a keyed aggregation. The "
    "floor-over-micros integer idiom sidesteps the DuckDB "
    "CAST-rounds / Spark CAST-truncates divergence.",
)


# =====================================================================
# Cohort LTV accumulation curve
# =====================================================================

sql_query(
    "orders_cohort_ltv_curve",
    # identical ANSI text: first-order month = cohort; cumulative
    # revenue per cohort by month offset, normalized per customer.
    "WITH first_o AS (SELECT o_custkey, min(o_orderdate) AS fd "
    "FROM orders GROUP BY o_custkey), "
    "base AS (SELECT date_trunc('month', fd) AS cohort, "
    "count(*) AS cohort_size FROM first_o GROUP BY 1), "
    "rev AS (SELECT date_trunc('month', f.fd) AS cohort, "
    "(year(o.o_orderdate) - year(f.fd)) * 12 "
    "+ (month(o.o_orderdate) - month(f.fd)) AS m_off, "
    "sum(o.o_totalprice) AS r "
    "FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey "
    "GROUP BY 1, 2) "
    "SELECT CAST(CAST(cohort AS DATE) AS STRING) AS cohort_month, "
    "CAST(m_off AS INT) AS month_offset, "
    "CAST(max(b.cohort_size) AS BIGINT) AS cohort_size, "
    "round(sum(rev.r) OVER w, 2) AS cum_revenue, "
    "floor(round(sum(rev.r) OVER w, 2) / max(b.cohort_size) * 100) "
    "/ 100 AS ltv_per_customer "
    "FROM rev JOIN base b USING (cohort) "
    "GROUP BY cohort, m_off, rev.r "
    "WINDOW w AS (PARTITION BY cohort ORDER BY m_off "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "ORDER BY cohort_month, month_offset",
    doc="Cohort LTV accumulation: customers cohorted by first-order "
    "month, cumulative revenue per cohort along month offsets, "
    "normalized to LTV per cohort member — the revenue-side "
    "companion of the retention triangle (events_retention_cohorts). "
    "The join input is pre-aggregated to |cohort x offset| rows "
    "before any window runs, so the curve costs two keyed "
    "aggregations and a cumsum over a tiny frame regardless of order "
    "volume. Cohort months stringified per the DATE canonicalization "
    "rule.",
)


# =====================================================================
# Cross-table consistency audit (order header vs line-item detail)
# =====================================================================

sql_query(
    "dq_order_lineitem_consistency",
    # identical ANSI text: per-order detail sum vs header total,
    # relative deviation banded into an auditable histogram.
    "WITH li AS (SELECT l_orderkey, "
    "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) "
    "AS detail_total, count(*) AS n_lines FROM lineitem "
    "GROUP BY l_orderkey), "
    "j AS (SELECT o.o_orderkey, o.o_totalprice, li.detail_total, "
    "CASE WHEN li.l_orderkey IS NULL THEN 'no_lineitems' "
    "WHEN abs(o.o_totalprice - li.detail_total) "
    "<= 0.01 * o.o_totalprice THEN 'within_1pct' "
    "WHEN abs(o.o_totalprice - li.detail_total) "
    "<= 0.10 * o.o_totalprice THEN 'within_10pct' "
    "ELSE 'divergent' END AS band "
    "FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey) "
    "SELECT band, CAST(count(*) AS BIGINT) AS n_orders, "
    "floor(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE) "
    "* 10000) / 10000 AS share, "
    "round(max(abs(o_totalprice - COALESCE(detail_total, 0))), 2) "
    "AS worst_abs_gap "
    "FROM j GROUP BY band ORDER BY band",
    doc="Cross-table consistency audit — the header-vs-detail "
    "invariant every ERP migration must check: per-order line-item "
    "net total (extended * (1-disc) * (1+tax), the TPC-H pricing "
    "identity) against the order header total, banded into "
    "within-1%/within-10%/divergent/no-lineitems with shares and the "
    "worst absolute gap per band. One keyed aggregation over "
    "lineitem + one left join on the order key — the detail side "
    "pre-aggregates to |orders| rows before joining, so the check "
    "costs a single pass over each table at any scale. Complements "
    "the single-table dq_checks_orders constraint suite with a "
    "referential (cross-table) rule.",
)


# =====================================================================
# Bucketed-table co-located join (Exchange-free sort-merge join)
# =====================================================================

_BUCKETED_JOIN_ORACLE = """
SELECT c_mktsegment, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
ORDER BY c_mktsegment, o_orderpriority
"""

#: bucket count for the demo layout (at 100 TB this would be sized so
#: each bucket's file set fits an executor's scan budget, e.g. 4096)
BUCKETED_JOIN_BUCKETS = 8


@register(
    "layout_bucketed_join_orders",
    _BUCKETED_JOIN_ORACLE,
    doc="Bucketed-table co-located join: orders and customer are "
    "persisted as Spark bucketed tables (bucketBy on the join key, "
    "one file per bucket via a pre-repartition), then joined with a "
    "merge hint — the scans report 'Bucketed: true' and NEITHER join "
    "side shuffles (no hashpartitioning exchange on o_custkey/"
    "c_custkey; asserted by tests/test_plans.py). THE pre-pay "
    "technique for 100 TB repeated joins: the shuffle happens once at "
    "write time and every subsequent join/aggregation on the bucket "
    "key is exchange-free, the DataFrame-native equivalent of the "
    "lakehouse tier's clustered layouts. Value oracle is the plain "
    "join, so the bucketed round-trip is also proven lossless.",
)
def layout_bucketed_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    db = "bucket_demo"
    root = "/tmp/spark_graft_bucket_demo"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{root}'")
    ob, cb = f"{db}.orders_b_{tag}", f"{db}.customer_b_{tag}"
    # the in-memory catalog forgets tables across sessions but their
    # directories persist — drop both name and location before writing
    for t in (ob, cb):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _sh.rmtree(f"{root}/{t.split('.')[1]}", ignore_errors=True)
    n = BUCKETED_JOIN_BUCKETS
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .repartition(n, "o_custkey")
        .write.bucketBy(n, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(ob)
    )
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .repartition(n, "c_custkey")
        .write.bucketBy(n, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(cb)
    )
    o, c = spark.table(ob), spark.table(cb)
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            # decimal sum -> integer cents: EXACT in both engines, so
            # the value is independent of double summation order
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


# =====================================================================
# Perceptual image NEAR-dup pairs (banded Hamming over aHash)
# =====================================================================

MM_NEARDUP_MAX_HAMMING = 3


def _ahash_neardup_golden() -> list[tuple]:
    """Golden near-dup pairs from the pixel SPEC: original images plus
    their +1000-id perturbed variants, all-pairs Hamming over the
    Python aHash — the banded distributed path must reproduce exactly
    the pairs within the threshold (pigeonhole guarantees the banding
    loses none of them)."""
    import numpy as np

    from .operators.multimodal import (
        resize_nearest,
        synthetic_image_pixels,
        synthetic_perturbed_pixels,
    )

    def ahash(px):
        small = resize_nearest(px, 8, 8).astype(np.int64)
        mean = int(small.sum()) // 64
        v = 0
        for bit in (small >= mean).flatten():
            v = (v << 1) | int(bit)
        return v

    hashes = {}
    for i in range(64):
        if i % 3 != 0:
            continue
        hashes[i] = ahash(synthetic_image_pixels(i))
        hashes[i + 1000] = ahash(synthetic_perturbed_pixels(i))
    rows = []
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(hashes[ids[x]] ^ hashes[ids[y]]).count("1")
            if d <= MM_NEARDUP_MAX_HAMMING:
                rows.append((ids[x], ids[y], d))
    rows.sort()
    return rows


def _ahash_neardup_oracle() -> str:
    return _values_oracle_shared(
        _ahash_neardup_golden(),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
    )


@register(
    "mm_image_neardup_pairs",
    _ahash_neardup_oracle(),
    doc="Perceptual image NEAR-dup pairs end-to-end: plant a "
    "pixel-perturbed copy of every image (a few aHash bits flip — "
    "some variants land past the threshold, exercising the reject "
    "branch), PNG-decode + aHash via the Arrow kernel, then Manku "
    "block banding — 4 x 16-bit blocks, pigeonhole-complete for "
    "Hamming <= 3 — generates candidates through equi-self-joins "
    "(linear shuffle, never pairwise images), verified by exact "
    "per-block bit_count XOR. The multimodal twin of the text SimHash "
    "index; oracle = all-pairs Hamming over the pre-encode pixel "
    "spec, which the banded path must reproduce exactly.",
)
def mm_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (
        ASSET_SCHEMA,
        image_ahash,
        image_neardup_pairs,
        make_synthetic_assets,
        png_encode_gray,
        synthetic_perturbed_pixels,
    )

    assets = make_synthetic_assets(spark, 64)
    planted_rows = []
    for i in range(64):
        if i % 3 != 0:
            continue
        payload = png_encode_gray(synthetic_perturbed_pixels(i))
        planted_rows.append(
            (i + 1000, "image", payload, len(payload), f"synth://near/{i}")
        )
    planted = spark.createDataFrame(planted_rows, ASSET_SCHEMA)
    hashes = image_ahash(assets.unionByName(planted))
    return image_neardup_pairs(
        hashes, "asset_id", "ahash", max_hamming=MM_NEARDUP_MAX_HAMMING
    ).orderBy("id_a", "id_b")


# =====================================================================
# Video NEAR-dup by frame containment (shared-frame equi-join)
# =====================================================================

MM_VIDEO_MIN_CONTAINMENT = 0.3


def _video_variant_frames(i: int) -> list[bytes]:
    """Deterministic near-duplicate of video ``i``: keep every 2nd
    frame (a re-encode/trim survivor set) and append 3 brand-new
    frames — containment vs the original stays high while the frame
    lists differ."""
    import hashlib as _hl

    from .operators.multimodal import synthetic_video_frames

    kept = synthetic_video_frames(i)[::2]
    return kept + [
        _hl.md5(f"newframe:{i}:{k}".encode()).digest() for k in range(3)
    ]


def _video_containment_golden() -> list[tuple]:
    """All-pairs frame containment from the container SPEC (only
    original<->variant pairs share frames — every other digest is
    unique by construction), filtered at the entry threshold."""
    import hashlib as _hl

    from .operators.multimodal import synthetic_video_frames

    frames = {}
    for i in range(64):
        if i % 3 != 2:
            continue
        frames[i] = {_hl.md5(f).hexdigest() for f in synthetic_video_frames(i)}
        frames[i + 1000] = {
            _hl.md5(f).hexdigest() for f in _video_variant_frames(i)
        }
    rows = []
    ids = sorted(frames)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            shared = len(frames[ids[x]] & frames[ids[y]])
            if not shared:
                continue
            cont = (
                int(
                    shared
                    / min(len(frames[ids[x]]), len(frames[ids[y]]))
                    * 10000
                )
                / 10000
            )
            if cont >= MM_VIDEO_MIN_CONTAINMENT:
                rows.append((ids[x], ids[y], shared, cont))
    rows.sort()
    return rows


def _video_containment_oracle() -> str:
    return _values_oracle_shared(
        _video_containment_golden(),
        [
            ("id_a", "BIGINT"),
            ("id_b", "BIGINT"),
            ("n_shared", "BIGINT"),
            ("containment", "DOUBLE"),
        ],
    )


@register(
    "mm_video_neardup_containment",
    _video_containment_oracle(),
    doc="Video near-dup by frame containment: plant a trimmed+extended "
    "variant of every video (every 2nd frame kept, 3 new appended), "
    "decode the FRAM containers to frame digests via the Arrow "
    "sampler, then an equi-self-join on frame_md5 -> per-pair shared "
    "count -> containment = shared/min(|A|,|B|) — the shot-level "
    "video-dedup primitive (re-encodes, trims and re-edits share "
    "frames; unrelated videos share none). Candidates come from the "
    "digest join (linear shuffle keyed on frame hash, never pairwise "
    "videos). Oracle = all-pairs containment over the container spec.",
)
def mm_video_neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (
        ASSET_SCHEMA,
        fram_encode,
        make_synthetic_assets,
        sample_frames,
    )

    assets = make_synthetic_assets(spark, 64)
    planted_rows = []
    for i in range(64):
        if i % 3 != 2:
            continue
        payload = fram_encode(_video_variant_frames(i))
        planted_rows.append(
            (i + 1000, "video", payload, len(payload), f"synth://vnear/{i}")
        )
    planted = spark.createDataFrame(planted_rows, ASSET_SCHEMA)
    digests = sample_frames(
        assets.unionByName(planted), every_nth=1, max_frames=1 << 30
    )
    counts = digests.groupBy("asset_id").agg(
        F.count("*").alias("n_frames")
    )
    a = digests.select(
        F.col("asset_id").alias("id_a"), F.col("frame_md5")
    )
    b = digests.select(
        F.col("asset_id").alias("id_b"), F.col("frame_md5")
    )
    shared = (
        a.join(b, "frame_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    ca = counts.select(
        F.col("asset_id").alias("id_a"), F.col("n_frames").alias("n_a")
    )
    cb = counts.select(
        F.col("asset_id").alias("id_b"), F.col("n_frames").alias("n_b")
    )
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "containment",
            F.floor(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b")
                * 10000
            )
            / 10000,
        )
        .filter(F.col("containment") >= MM_VIDEO_MIN_CONTAINMENT)
        .select("id_a", "id_b", "n_shared", "containment")
        .orderBy("id_a", "id_b")
    )


# =====================================================================
# Audio NEAR-dup by fingerprint containment (Shazam-lite shingles)
# =====================================================================

MM_AUDIO_MIN_CONTAINMENT = 0.3
MM_AUDIO_FP_WINDOW = 64


def _audio_fp_golden() -> list[tuple]:
    """All-pairs fingerprint containment from the sample SPEC: 21
    chirp clips + their re-leveled/extended variants through the SAME
    peak-shingle kernel the executors run."""
    from .operators.multimodal import (
        audio_peak_shingles,
        synthetic_chirp_samples,
        synthetic_chirp_variant,
    )

    fps = {}
    for i in range(21):
        fps[i] = set(
            audio_peak_shingles(
                synthetic_chirp_samples(i), window=MM_AUDIO_FP_WINDOW
            )
        )
        fps[i + 1000] = set(
            audio_peak_shingles(
                synthetic_chirp_variant(i), window=MM_AUDIO_FP_WINDOW
            )
        )
    rows = []
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            inter = len(fps[ids[x]] & fps[ids[y]])
            if not inter:
                continue
            cont = (
                int(inter / min(len(fps[ids[x]]), len(fps[ids[y]])) * 10000)
                / 10000
            )
            if cont >= MM_AUDIO_MIN_CONTAINMENT:
                rows.append((ids[x], ids[y], inter, cont))
    rows.sort()
    return rows


def _audio_fp_oracle() -> str:
    return _values_oracle_shared(
        _audio_fp_golden(),
        [
            ("id_a", "BIGINT"),
            ("id_b", "BIGINT"),
            ("n_shared", "BIGINT"),
            ("containment", "DOUBLE"),
        ],
    )


@register(
    "mm_audio_neardup_containment",
    _audio_fp_oracle(),
    doc="Audio near-dup by fingerprint containment (Shazam-lite): "
    "WAV-decode chirp clips, take the dominant rFFT bin per 64-sample "
    "window (argmax is amplitude-scale-invariant, so re-leveled audio "
    "fingerprints identically), md5 each 3-window peak shingle via "
    "the Arrow kernel, then an equi-self-join on the token -> per-pair "
    "containment — the re-level/extend edit detector. 21 planted "
    "variant pairs all land at containment 1.0 with zero false "
    "positives at the 0.3 threshold (md5-scheduled frequencies make "
    "unrelated clips token-disjoint). Candidates from the token join, "
    "never pairwise waveforms; oracle = all-pairs containment through "
    "the same kernel over the sample spec.",
)
def mm_audio_neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (
        ASSET_SCHEMA,
        audio_fingerprints,
        synthetic_chirp_samples,
        synthetic_chirp_variant,
        wav_encode_pcm16,
    )

    rows = []
    for i in range(21):
        orig = wav_encode_pcm16(synthetic_chirp_samples(i))
        rows.append((i, "audio", orig, len(orig), f"synth://chirp/{i}"))
        var = wav_encode_pcm16(synthetic_chirp_variant(i))
        rows.append(
            (i + 1000, "audio", var, len(var), f"synth://chirpvar/{i}")
        )
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    fps = audio_fingerprints(assets, window=MM_AUDIO_FP_WINDOW, shingle=3)
    counts = fps.groupBy("asset_id").agg(F.count("*").alias("n_tokens"))
    a = fps.select(F.col("asset_id").alias("id_a"), "shingle_md5")
    b = fps.select(F.col("asset_id").alias("id_b"), "shingle_md5")
    shared = (
        a.join(b, "shingle_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    ca = counts.select(
        F.col("asset_id").alias("id_a"), F.col("n_tokens").alias("n_a")
    )
    cb = counts.select(
        F.col("asset_id").alias("id_b"), F.col("n_tokens").alias("n_b")
    )
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "containment",
            F.floor(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b")
                * 10000
            )
            / 10000,
        )
        .filter(F.col("containment") >= MM_AUDIO_MIN_CONTAINMENT)
        .select("id_a", "id_b", "n_shared", "containment")
        .orderBy("id_a", "id_b")
    )


# =====================================================================
# Hilbert vs Z-order clustering quality (liquid-clustering readout)
# =====================================================================

HILBERT_BITS = 8  # 256x256 grid
HILBERT_BUCKETS = 16


def _hilbert_vs_zorder_oracle() -> str:
    from .operators.layout import hilbert_cte_sql, zorder_key_sql

    zkey = zorder_key_sql("gx", "gy", HILBERT_BITS)
    ctes = hilbert_cte_sql(
        "src", "gx", "gy", ["event_id", "gx", "gy", "zkey"], HILBERT_BITS
    )
    stats = (
        "SELECT b, (max(gx) - min(gx) + 1) * (max(gy) - min(gy) + 1) "
        "AS area FROM {side} GROUP BY b"
    )
    return f"""
WITH src AS (
  SELECT event_id, user_id & 255 AS gx,
         CAST(floor(epoch_us(ts) / 60000000) AS BIGINT) & 255 AS gy,
         {zkey} AS zkey
  FROM events),
{ctes},
zb AS (SELECT gx, gy, ntile({HILBERT_BUCKETS})
         OVER (ORDER BY zkey, event_id) AS b FROM hilb),
hb AS (SELECT gx, gy, ntile({HILBERT_BUCKETS})
         OVER (ORDER BY hkey, event_id) AS b FROM hilb),
za AS ({stats.format(side='zb')}),
ha AS ({stats.format(side='hb')})
SELECT 'hilbert' AS curve, CAST({HILBERT_BUCKETS} AS BIGINT) AS n_buckets,
  floor(avg(area) * 10000) / 10000 AS avg_box_area,
  CAST(max(area) AS BIGINT) AS max_box_area FROM ha
UNION ALL
SELECT 'zorder', {HILBERT_BUCKETS}, floor(avg(area) * 10000) / 10000,
  CAST(max(area) AS BIGINT) FROM za
ORDER BY curve
"""


@register(
    "layout_hilbert_vs_zorder_clustering",
    _hilbert_vs_zorder_oracle,  # lazy: builds 8 fold-level CTEs
    doc="Space-filling-curve bake-off for multi-dimensional "
    "clustering (the analysis behind Delta liquid clustering's "
    "Hilbert choice over classic ZORDER): key (user_id, epoch-minute) "
    "grid cells by BOTH curves, split each curve order into "
    f"{HILBERT_BUCKETS} contiguous range buckets (= files), and read "
    "out the mean/max per-bucket bounding-box AREA — exactly the "
    "min/max stats a scan prunes on, so smaller boxes = better "
    "two-sided pruning. Hilbert's unit-step property (consecutive "
    "positions always grid-adjacent — differential-tested) avoids "
    "Z's diagonal jumps, so its buckets bound tighter. The Hilbert "
    "key is 8 unrolled integer CASE fold levels (whole-stage "
    "codegen, no UDF; engine-neutral SQL text shared with the "
    "oracle); bucketing is exact_ntile (distributed, no global "
    "window); the readout is two O(buckets) aggregates.",
)
def layout_hilbert_vs_zorder_clustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.layout import add_hilbert_key, exact_ntile

    src = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("gx"),
        F.floor(epoch_us(F.col("ts")) / 60_000_000)
        .cast("long")
        .bitwiseAND(F.lit(255))
        .alias("gy"),
    )
    keyed = src.withColumn(
        "zkey", zorder_key(F.col("gx"), F.col("gy"), HILBERT_BITS)
    )
    keyed = add_hilbert_key(keyed, "gx", "gy", HILBERT_BITS, out="hkey")

    def curve_stats(key_col: str, label: str) -> DataFrame:
        b = exact_ntile(
            keyed.select("event_id", "gx", "gy", key_col),
            [key_col, "event_id"],
            HILBERT_BUCKETS,
            out="b",
        )
        areas = b.groupBy("b").agg(
            (
                (F.max("gx") - F.min("gx") + 1)
                * (F.max("gy") - F.min("gy") + 1)
            ).alias("area")
        )
        return areas.agg(
            F.lit(label).alias("curve"),
            F.lit(HILBERT_BUCKETS).cast("bigint").alias("n_buckets"),
            (F.floor(F.avg("area") * 1e4) / 1e4).alias("avg_box_area"),
            F.max("area").cast("bigint").alias("max_box_area"),
        )

    return (
        curve_stats("hkey", "hilbert")
        .unionByName(curve_stats("zkey", "zorder"))
        .orderBy("curve")
    )
