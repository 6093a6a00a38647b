"""Round-9 corpus-curation & retrieval catalog entries.

Seven additions that round out the LLM-training-data surface:

* ``filter_repeated_blocks_c4`` — C4/MassiveText-style repeated-span
  filter at disjoint token-block granularity.
* ``text_trigram_stupid_backoff`` — trigram LM with stupid backoff
  (Brants et al., EMNLP 2007) trained on a held-out half, with
  per-document backoff-rate telemetry.
* ``corpus_unimax_budget_mix`` — UniMax (Chung et al. 2023) budget
  allocation: per-language waterfilling under an epoch cap, in closed
  form via window functions.
* ``stats_ks_test_chars`` — two-sample Kolmogorov–Smirnov test between
  document-length distributions.
* ``dedup_minhash_containment_pairs`` — asymmetric shingle containment
  (doc-inside-doc detection) over the shared MinHash candidate index.
* ``quality_ensemble_vote`` — majority vote over three independent
  quality signals (Gopher rules, composite quality score, CCNet
  perplexity bucket).
* ``ann_mmr_diversified_topk`` — maximal-marginal-relevance diversified
  retrieval (Carbonell & Goldstein, SIGIR 1998): greedy re-ranking of a
  cosine top-pool, k fixed so both engines run the identical unrolled
  plan.

Every entry keeps the repo's parity discipline: shared constants,
floor-scaled doubles, deterministic tiebreaks, and a DuckDB oracle
built from the same template wherever the dialects allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query_catalog import register, sql_query
from .query_oracle_shared import (
    BIGRAM_ADD_K,
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_HASHES,
    QUALITY_MIN,
    SHINGLE_N,
    _duck_minhash_pair_ctes,
)
from .sources.registry import load_table

# ---- shared constants (Spark impl and oracle MUST agree) -------------

#: C4 repeated-span filter: disjoint block width (tokens) and the
#: document-frequency threshold above which a block is "boilerplate"
#: (C4 removes any three-sentence span occurring more than once; the
#: block analog keeps the same ">1 document" rule).
C4_BLOCK_TOKENS = 8
C4_BLOCK_MIN_DF = 2
C4_MAX_COMMON_RATIO = 0.3

#: stupid backoff discount (the fixed 0.4 from Brants et al. 2007)
SB_ALPHA = 0.4
#: unigram add-k floor for unseen words
SB_ADD_K = 0.5

#: UniMax epoch cap: no language repeats more than C epochs
UNIMAX_EPOCH_CAP = 2
#: total budget as a multiple of the corpus token count — 1.5 makes the
#: testdata exercise BOTH branches (low-resource languages saturate at
#: the cap, the high-resource tail waterfills; at budget=1.0 no lang
#: with >10% share ever saturates under C=2)
UNIMAX_BUDGET_FACTOR = 1.5

#: MMR: relevance/diversity trade-off and pool/output sizes
MMR_LAMBDA = 0.7
MMR_POOL = 20
MMR_K = 5
MMR_QUERY_ID = 0

#: containment threshold (asymmetric: |A∩B| / |A|)
CONTAINMENT_MIN = 0.7


# =====================================================================
# C4-style repeated-block filter
# =====================================================================


def _c4_texts() -> tuple[str, str]:
    """One template, two dialects: explode each document into disjoint
    ``C4_BLOCK_TOKENS``-token blocks, count per-block document
    frequency, and emit per-doc boilerplate ratios + keep decision."""

    def build(
        toks: str, size_fn: str, slice_join: str, unnest: str
    ) -> str:
        w = C4_BLOCK_TOKENS
        return f"""
WITH docs AS (SELECT doc_id, {toks} AS t FROM documents),
blocks AS (
  SELECT doc_id,
    {unnest.format(expr=f"CAST(floor({size_fn}(t) / {w}) AS INT) - 1", body=slice_join)} AS block
  FROM docs WHERE {size_fn}(t) >= {w}),
common AS (
  SELECT block FROM blocks GROUP BY block
  HAVING count(DISTINCT doc_id) >= {C4_BLOCK_MIN_DF}),
flagged AS (
  SELECT b.doc_id,
    CASE WHEN c.block IS NOT NULL THEN 1 ELSE 0 END AS is_common
  FROM blocks b LEFT JOIN common c ON b.block = c.block)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_blocks,
  CAST(sum(is_common) AS BIGINT) AS n_common,
  floor(CAST(sum(is_common) AS DOUBLE) / count(*) * 10000) / 10000 AS common_ratio,
  (floor(CAST(sum(is_common) AS DOUBLE) / count(*) * 10000) / 10000
     <= {C4_MAX_COMMON_RATIO}) AS keep
FROM flagged GROUP BY doc_id
"""

    w = C4_BLOCK_TOKENS
    spark_text = build(
        "split(text, ' ')",
        "size",
        f"array_join(slice(t, p * {w} + 1, {w}), ' ')",
        "explode(transform(sequence(0, {expr}), p -> {body}))",
    )
    duck_text = build(
        "string_split(text, ' ')",
        "len",
        f"array_to_string(t[p * {w} + 1 : p * {w} + {w}], ' ')",
        "unnest(list_transform(generate_series(0, {expr}), p -> {body}))",
    )
    return spark_text, duck_text


_C4_SPARK, _C4_DUCK = _c4_texts()

sql_query(
    "filter_repeated_blocks_c4",
    _C4_SPARK,
    _C4_DUCK,
    doc="C4/MassiveText-style repeated-span filter at disjoint "
    f"{C4_BLOCK_TOKENS}-token-block granularity: a block occurring in "
    f">= {C4_BLOCK_MIN_DF} distinct documents is corpus boilerplate; "
    "documents whose boilerplate ratio exceeds "
    f"{C4_MAX_COMMON_RATIO} are dropped (C4 removes any repeated "
    "three-sentence span; the block analog keeps the same more-than-"
    "one-document rule). Scale shape: the block table is O(tokens/8) "
    "rows shuffled once on the block string for the DF count, then "
    "once on doc_id for the rollup — linear, no pairwise joins; at "
    "100 TB the block key becomes xxhash64(block) to shrink the "
    "shuffle (string kept here for oracle bit-parity).",
)


# =====================================================================
# Trigram LM with stupid backoff (held-out scoring)
# =====================================================================


def _sb_score_case(
    tc: str, cc: str, bc: str, u2: str, u3: str, n: str, v: str
) -> str:
    """Shared stupid-backoff score CASE (raw counts, fixed 0.4
    discount, add-k unigram floor) — identical text in both dialects."""
    a = SB_ALPHA
    k = SB_ADD_K
    return (
        f"CASE WHEN {tc} IS NOT NULL THEN {tc} / {cc} "
        f"WHEN {bc} IS NOT NULL THEN {a} * {bc} / {u2} "
        f"ELSE {a} * {a} * (coalesce({u3}, CAST(0 AS DOUBLE)) + {k}) "
        f"/ ({n} + {k} * {v}) END"
    )


@register(
    "text_trigram_stupid_backoff",
    f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
eval AS (SELECT * FROM toks WHERE doc_id % 2 = 1 AND len(t) >= 3),
tri AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 2),
         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
  FROM train WHERE len(t) >= 3),
big AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         i -> t[i] || ' ' || t[i + 1])) AS g
  FROM train WHERE len(t) >= 2),
uni AS (SELECT unnest(t) AS g FROM train),
c3 AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM tri GROUP BY g),
c2 AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM big GROUP BY g),
c1 AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM uni GROUP BY g),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(count(DISTINCT g) AS DOUBLE) AS v FROM uni),
pos AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS tri,
    unnest(list_transform(generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i + 1])) AS ctx,
    unnest(list_transform(generate_series(1, len(t) - 2),
           i -> t[i + 1] || ' ' || t[i + 2])) AS bg,
    unnest(list_transform(generate_series(1, len(t) - 2), i -> t[i + 1])) AS w2,
    unnest(list_transform(generate_series(1, len(t) - 2), i -> t[i + 2])) AS w3
  FROM eval),
scored AS (
  SELECT p.doc_id,
    -ln({_sb_score_case('tc.c', 'cc.c', 'bc.c', 'u2.c', 'u3.c', 's.n', 's.v')}) AS nll,
    CASE WHEN tc.c IS NULL AND bc.c IS NOT NULL THEN 1 ELSE 0 END AS bo_bi,
    CASE WHEN tc.c IS NULL AND bc.c IS NULL THEN 1 ELSE 0 END AS bo_uni
  FROM pos p
  LEFT JOIN c3 tc ON p.tri = tc.g
  LEFT JOIN c2 cc ON p.ctx = cc.g
  LEFT JOIN c2 bc ON p.bg = bc.g
  LEFT JOIN c1 u2 ON p.w2 = u2.g
  LEFT JOIN c1 u3 ON p.w3 = u3.g
  CROSS JOIN nv s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
  floor(exp(avg(nll)) * 10000) / 10000 AS ppl,
  CAST(sum(bo_bi) AS BIGINT) AS n_backoff_bi,
  CAST(sum(bo_uni) AS BIGINT) AS n_backoff_uni
FROM scored GROUP BY doc_id
""",
    doc="Trigram LM with stupid backoff (Brants et al., EMNLP 2007: "
    f"fixed {SB_ALPHA} discount, raw counts, no normalization): counts "
    "train on the even-doc_id half so backoff GENUINELY fires on the "
    "odd-half eval stream (training and scoring on the same corpus "
    "would make every observed trigram a hit). Emits per-doc "
    "perplexity plus backoff-level telemetry (how often the model "
    "fell to bigram / unigram), the standard LM-data diagnostic. "
    "Scale shape: the tokenized corpus is persisted once and every "
    "count table and the eval stream read the cached arrays; scoring "
    "is five hash equi-joins on gram strings — linear, and exactly "
    "the shape of a parquet-materialized count-table LM at 100 TB "
    "(the count tables write once, score many).",
)
def text_trigram_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    toks.persist()
    train = toks.filter(F.col("doc_id") % 2 == 0)
    eval_ = toks.filter((F.col("doc_id") % 2 == 1) & (F.size("t") >= 3))

    tri = train.filter(F.size("t") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), i -> concat("
                "element_at(t, i), ' ', element_at(t, i + 1), ' ', "
                "element_at(t, i + 2)))"
            )
        ).alias("g")
    )
    big = train.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), i -> concat("
                "element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("g")
    )
    uni = train.select(F.explode("t").alias("g"))
    c3 = tri.groupBy("g").agg(F.count("*").cast("double").alias("c"))
    c2 = big.groupBy("g").agg(F.count("*").cast("double").alias("c"))
    c1 = uni.groupBy("g").agg(F.count("*").cast("double").alias("c"))
    nv = uni.agg(
        F.count("*").cast("double").alias("n"),
        F.count_distinct("g").cast("double").alias("v"),
    )

    pos = eval_.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), i -> named_struct("
                "'tri', concat(element_at(t, i), ' ', element_at(t, i + 1), ' ', element_at(t, i + 2)), "
                "'ctx', concat(element_at(t, i), ' ', element_at(t, i + 1)), "
                "'bg', concat(element_at(t, i + 1), ' ', element_at(t, i + 2)), "
                "'w2', element_at(t, i + 1), "
                "'w3', element_at(t, i + 2)))"
            )
        ).alias("p"),
    ).select("doc_id", "p.tri", "p.ctx", "p.bg", "p.w2", "p.w3")

    score = _sb_score_case("tc", "cc", "bc", "u2", "u3", "n", "v")
    scored = (
        pos.join(c3.select(F.col("g").alias("tri"), F.col("c").alias("tc")), "tri", "left")
        .join(c2.select(F.col("g").alias("ctx"), F.col("c").alias("cc")), "ctx", "left")
        .join(c2.select(F.col("g").alias("bg"), F.col("c").alias("bc")), "bg", "left")
        .join(c1.select(F.col("g").alias("w2"), F.col("c").alias("u2")), "w2", "left")
        .join(c1.select(F.col("g").alias("w3"), F.col("c").alias("u3")), "w3", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id",
            (-F.log(F.expr(score))).alias("nll"),
            F.expr(
                "CASE WHEN tc IS NULL AND bc IS NOT NULL THEN 1 ELSE 0 END"
            ).alias("bo_bi"),
            F.expr(
                "CASE WHEN tc IS NULL AND bc IS NULL THEN 1 ELSE 0 END"
            ).alias("bo_uni"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_trigrams"),
        (F.floor(F.exp(F.avg("nll")) * 10000) / 10000).alias("ppl"),
        F.sum("bo_bi").cast("bigint").alias("n_backoff_bi"),
        F.sum("bo_uni").cast("bigint").alias("n_backoff_uni"),
    )


# =====================================================================
# UniMax budget allocation (waterfilling under an epoch cap)
# =====================================================================


def _unimax_texts() -> tuple[str, str]:
    """Closed-form waterfill: languages ascending by capacity
    ``cap = C * n_tokens``; with caps ascending, the saturated set is a
    prefix, so the first index j where ``cap_j > (B - cumcap_j) /
    (L - j + 1)`` fixes the water level v = that fair share; languages
    before j get their cap, everyone else gets v."""
    c = UNIMAX_EPOCH_CAP

    def build(toks_len: str, part: str) -> str:
        return f"""
WITH langs AS (
  SELECT lang, CAST(sum({toks_len}) AS DOUBLE) AS n
  FROM documents GROUP BY lang),
tot AS (SELECT sum(n) * {UNIMAX_BUDGET_FACTOR} AS b,
               CAST(count(*) AS DOUBLE) AS l FROM langs),
ranked AS (
  SELECT lang, n, n * {c} AS cap,
    CAST(row_number() OVER ({part}ORDER BY n * {c}, lang) AS DOUBLE) AS i,
    coalesce(sum(n * {c}) OVER ({part}ORDER BY n * {c}, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS DOUBLE)) AS cumcap
  FROM langs),
fair AS (
  SELECT r.*, (t.b - r.cumcap) / (t.l - r.i + 1) AS f, t.b AS b
  FROM ranked r CROSS JOIN tot t),
level AS (SELECT min(i) AS j FROM fair WHERE cap > f),
water AS (SELECT max(CASE WHEN f2.i = lv.j THEN f2.f END) AS v
          FROM fair f2 CROSS JOIN level lv)
SELECT f.lang, CAST(f.n AS BIGINT) AS n_tokens, CAST(f.cap AS BIGINT) AS cap_tokens,
  CAST(floor(CASE WHEN lv.j IS NOT NULL AND f.i >= lv.j THEN w.v ELSE f.cap END) AS BIGINT) AS alloc_tokens,
  floor((CASE WHEN lv.j IS NOT NULL AND f.i >= lv.j THEN w.v ELSE f.cap END) / f.n * 10000) / 10000 AS epochs,
  floor((CASE WHEN lv.j IS NOT NULL AND f.i >= lv.j THEN w.v ELSE f.cap END) / f.b * 1000000) / 1000000 AS budget_share
FROM fair f CROSS JOIN level lv CROSS JOIN water w
ORDER BY f.lang
"""

    spark_text = build("size(split(text, ' '))", "PARTITION BY pmod(hash(lang), 1) ")
    duck_text = build("len(string_split(text, ' '))", "")
    return spark_text, duck_text


_UNIMAX_SPARK, _UNIMAX_DUCK = _unimax_texts()

sql_query(
    "corpus_unimax_budget_mix",
    _UNIMAX_SPARK,
    _UNIMAX_DUCK,
    doc="UniMax budget allocation (Chung et al. 2023): distribute a "
    f"total token budget B (= {UNIMAX_BUDGET_FACTOR} corpus worths) "
    "across languages as uniformly as possible subject to a "
    "per-language epoch cap "
    f"(C = {UNIMAX_EPOCH_CAP}) — low-resource languages saturate at "
    "C epochs, the remainder waterfills evenly over the rest. The "
    "waterfill is CLOSED-FORM: with capacities ascending the "
    "saturated set is a prefix, so one window pass (row_number + "
    "prefix sum) plus two scalar reductions finds the water level — "
    "no iteration, unlike the paper's greedy loop. One groupBy(lang) "
    "corpus scan; everything downstream is O(languages) rows. The "
    "Spark window partitions by pmod(hash(lang), 1) — constant-valued "
    "but non-foldable, the repo's idiom for a deliberate "
    "single-partition window over a tiny frame.",
)


# =====================================================================
# Two-sample Kolmogorov–Smirnov test
# =====================================================================


def _ks_texts() -> tuple[str, str]:
    def build(part: str) -> str:
        return f"""
WITH vals AS (
  SELECT n_chars AS x, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g
  FROM documents),
tot AS (SELECT CAST(sum(g) AS DOUBLE) AS n1,
               CAST(sum(1 - g) AS DOUBLE) AS n2 FROM vals),
perval AS (
  SELECT x, CAST(sum(g) AS DOUBLE) AS c1, CAST(sum(1 - g) AS DOUBLE) AS c2
  FROM vals GROUP BY x),
cdf AS (
  SELECT x,
    sum(c1) OVER ({part}ORDER BY x) AS f1,
    sum(c2) OVER ({part}ORDER BY x) AS f2
  FROM perval),
d AS (SELECT max(abs(f1 / t.n1 - f2 / t.n2)) AS ks
      FROM cdf CROSS JOIN tot t)
SELECT CAST(t.n1 AS BIGINT) AS n_en, CAST(t.n2 AS BIGINT) AS n_other,
  floor(d.ks * 1000000) / 1000000 AS ks_d,
  floor(1.358 * sqrt((t.n1 + t.n2) / (t.n1 * t.n2)) * 1000000) / 1000000 AS crit_05,
  (d.ks > 1.358 * sqrt((t.n1 + t.n2) / (t.n1 * t.n2))) AS reject_05
FROM d CROSS JOIN tot t
"""

    return build("PARTITION BY pmod(hash(x), 1) "), build("")


_KS_SPARK, _KS_DUCK = _ks_texts()

sql_query(
    "stats_ks_test_chars",
    _KS_SPARK,
    _KS_DUCK,
    doc="Two-sample Kolmogorov–Smirnov test between the document-"
    "length (n_chars) distributions of English vs non-English docs: "
    "D = max |F1 - F2| over the pooled support, with the large-sample "
    "alpha=0.05 critical value 1.358*sqrt((n1+n2)/(n1*n2)) and the "
    "reject decision — the distribution-drift gate between corpus "
    "slices. Scale shape: one groupBy(value) aggregation collapses "
    "the corpus to its value support BEFORE the CDF window, so the "
    "single-partition cumulative sum sees O(distinct lengths) rows, "
    "not O(docs); counts are integer-exact, the division happens once "
    "per support point.",
)


# =====================================================================
# Asymmetric containment pairs (doc-inside-doc detection)
# =====================================================================


def _duck_containment_sql() -> str:
    cts = _duck_minhash_pair_ctes()
    # reuse sigs/banded/cand/docs from the shared chain; ignore its
    # jaccard-thresholded `pairs` and apply the containment rule.
    return f"""
WITH {cts}
SELECT id_a, id_b,
  floor(len(list_intersect(da.sh, db.sh))::DOUBLE / len(da.sh) * 10000) / 10000 AS cont_a_in_b,
  floor(len(list_intersect(da.sh, db.sh))::DOUBLE / len(db.sh) * 10000) / 10000 AS cont_b_in_a
FROM cand
JOIN docs da ON da.doc_id = id_a
JOIN docs db ON db.doc_id = id_b
WHERE greatest(
    floor(len(list_intersect(da.sh, db.sh))::DOUBLE / len(da.sh) * 10000) / 10000,
    floor(len(list_intersect(da.sh, db.sh))::DOUBLE / len(db.sh) * 10000) / 10000)
  >= {CONTAINMENT_MIN}
"""


@register(
    "dedup_minhash_containment_pairs",
    _duck_containment_sql(),
    doc="Asymmetric shingle CONTAINMENT pairs (Broder 1997's second "
    "resemblance measure): |A∩B|/|A| and |A∩B|/|B| over the SAME "
    "banded-MinHash candidate index as the Jaccard entry — the "
    "doc-inside-doc detector (quotes, wrappers, concatenations) that "
    "symmetric Jaccard under-scores. Candidate recall is inherited "
    "from the Jaccard-tuned LSH bands, so very asymmetric pairs "
    "(small doc inside huge doc) can be missed by the index — the "
    "documented trade of reusing one index for both measures; the "
    "verify step is exact on whatever the bands surface. Scale "
    "shape: identical to dedup_minhash_lsh_pairs — persisted feature "
    "table, banded equi-join, candidates ≪ corpus.",
)
def dedup_minhash_containment_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.dedup import minhash_feature_table, minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    feat = minhash_feature_table(
        docs, "doc_id", "text", MINHASH_HASHES, SHINGLE_N
    )
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", MINHASH_HASHES, MINHASH_BANDS, SHINGLE_N,
        feat=feat,
    )
    da = feat.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    db = feat.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cont_a = F.floor(inter / F.size("sh_a") * 10000) / 10000
    cont_b = F.floor(inter / F.size("sh_b") * 10000) / 10000
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("cont_a_in_b", cont_a)
        .withColumn("cont_b_in_a", cont_b)
        .filter(
            F.greatest("cont_a_in_b", "cont_b_in_a") >= CONTAINMENT_MIN
        )
        .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
    )


# =====================================================================
# Quality ensemble vote
# =====================================================================


def _duck_ensemble_sql() -> str:
    from .query_oracle_shared import bigram_ppl_duck_sql as _bigram_ppl_duck_sql
    from .query_catalog_ml import _duck_curate_sql  # noqa: F401 (doc xref)
    from .functions.text import GOPHER_DUCK_SQL as _GOPHER_DUCK

    toks = "string_split(text, ' ')"
    n_chars = "length(text)"
    n_tokens = f"len({toks})"
    punct = "length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))"
    quality = (
        f"floor((least(1.0, greatest(0.0, "
        f"0.4 * least(1.0, CAST({n_tokens} AS DOUBLE) / 64) "
        f"+ 0.4 * (CAST(len(list_distinct({toks})) AS DOUBLE) / {n_tokens}) "
        f"+ 0.2 * (1.0 - CAST({punct} AS DOUBLE) / {n_chars})))) * 10000) / 10000"
    )
    return f"""
WITH gopher AS ({_GOPHER_DUCK}),
q AS (SELECT doc_id, {quality} >= {QUALITY_MIN} AS v_quality FROM documents),
ppl AS ({_bigram_ppl_duck_sql()})
SELECT g.doc_id, g.keep AS v_gopher, q.v_quality,
  (p.ccnet_bucket <> 'tail') AS v_ppl,
  CAST((CASE WHEN g.keep THEN 1 ELSE 0 END
      + CASE WHEN q.v_quality THEN 1 ELSE 0 END
      + CASE WHEN p.ccnet_bucket <> 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS votes,
  ((CASE WHEN g.keep THEN 1 ELSE 0 END
      + CASE WHEN q.v_quality THEN 1 ELSE 0 END
      + CASE WHEN p.ccnet_bucket <> 'tail' THEN 1 ELSE 0 END) >= 2) AS keep
FROM gopher g JOIN q ON g.doc_id = q.doc_id JOIN ppl p ON g.doc_id = p.doc_id
"""


@register(
    "quality_ensemble_vote",
    _duck_ensemble_sql,  # lazy: embeds a sibling module's SQL
    doc="Majority vote over three INDEPENDENT quality signals — "
    "Gopher rule set (structural), composite quality score "
    "(lexical), CCNet perplexity bucket (distributional) — the "
    "ensemble pattern production filters use because single signals "
    "each have known blind spots (rules pass templated spam, "
    "perplexity rejects rare-domain text). Emits each vote plus the "
    ">= 2-of-3 keep decision so downstream can audit which signal "
    "vetoed a document. Scale shape: the two rowwise signals fuse "
    "into the document scan; the perplexity signal joins back on "
    "doc_id — one shuffle over doc keys.",
)
def quality_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import quality_features
    from .query_catalog import _CATALOG
    from .query_catalog_analytics import bigram_perplexity_df

    gopher = _CATALOG["text_gopher_quality_filter"].fn(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("v_gopher")
    )
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        (quality_features("text")["quality_score"] >= QUALITY_MIN).alias(
            "v_quality"
        ),
    )
    ppl = bigram_perplexity_df(spark, sf_dir).select(
        "doc_id", (F.col("ccnet_bucket") != "tail").alias("v_ppl")
    )
    votes = (
        F.when(F.col("v_gopher"), 1).otherwise(0)
        + F.when(F.col("v_quality"), 1).otherwise(0)
        + F.when(F.col("v_ppl"), 1).otherwise(0)
    )
    return (
        gopher.join(q, "doc_id")
        .join(ppl, "doc_id")
        .withColumn("votes", votes.cast("bigint"))
        .withColumn("keep", F.col("votes") >= 2)
    )


# =====================================================================
# MMR diversified retrieval
# =====================================================================


def _duck_mmr_sql() -> str:
    from .query_catalog_ml import _duck_cos

    lam = MMR_LAMBDA
    cos_q = _duck_cos("q.qv", "e.embedding")
    cos_p = _duck_cos("a.emb", "b.emb")
    ctes = [
        f"q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {MMR_QUERY_ID})",
        f"""pool AS (
  SELECT e.vec_id, e.embedding AS emb, {cos_q} AS rel
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {MMR_QUERY_ID}
  ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL})""",
        f"""sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cos_p} AS s
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id)""",
        f"""sel1 AS (
  SELECT vec_id, rel AS score FROM pool
  ORDER BY rel DESC, vec_id LIMIT 1)""",
    ]
    prev_sel = "sel1"
    prev_union = "SELECT vec_id FROM sel1"
    for k in range(2, MMR_K + 1):
        ctes.append(
            f"""sel{k} AS (
  SELECT vec_id, {lam} * rel - {1 - lam} * msim AS score FROM (
    SELECT p.vec_id, p.rel, max(m.s) AS msim
    FROM pool p JOIN sims m ON m.ia = p.vec_id
    WHERE m.ib IN ({prev_union})
      AND p.vec_id NOT IN ({prev_union})
    GROUP BY p.vec_id, p.rel) t
  ORDER BY score DESC, vec_id LIMIT 1)"""
        )
        prev_union = prev_union + f" UNION ALL SELECT vec_id FROM sel{k}"
        prev_sel = f"sel{k}"
    finals = " UNION ALL ".join(
        f"SELECT {k} AS rank, vec_id, score FROM sel{k}"
        for k in range(1, MMR_K + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(rank AS BIGINT) AS rank, vec_id, "
        f"floor(score * 1000000) / 1000000 AS score FROM ({finals}) u "
        "ORDER BY rank"
    )


def _mmr_step_frame(
    pool: DataFrame, sims: DataFrame, sel_ids: list[int]
) -> DataFrame:
    """One greedy MMR selection as a 1-row frame over the PERSISTED
    pool and similarity table — never the corpus.  Kept as a named
    helper so the plan guard can assert the step reads the in-memory
    pool (InMemoryTableScan), not the embeddings parquet."""
    return (
        pool.filter(~F.col("vec_id").isin(sel_ids))
        .join(
            sims.filter(F.col("ib").isin(sel_ids))
            .groupBy("ia")
            .agg(F.max("s").alias("msim")),
            pool["vec_id"] == F.col("ia"),
        )
        .withColumn(
            "score",
            MMR_LAMBDA * F.col("rel") - (1 - MMR_LAMBDA) * F.col("msim"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(1)
        .select("vec_id", "score")
    )


def _mmr_pool_and_sims(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The corpus-scale half of MMR: cosine top-pool scan (pruned
    two-phase ranking) + the pool's pairwise similarity table, both
    PERSISTED — every greedy step replans over these tiny cached
    frames."""
    from .operators.similarity import dot_expr, norm_expr

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    rel = F.expr(f"({dot_expr('qv', 'embedding')}) / (_qn * _vn)")
    pool = (
        emb.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("_vn", F.expr(norm_expr("embedding")))
        .withColumn("_qn", F.expr(norm_expr("qv")))
        .withColumn("rel", rel)
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(MMR_POOL)
        .select("vec_id", F.col("embedding").alias("emb"), "rel")
    )
    pool.persist()
    a = pool.select(
        F.col("vec_id").alias("ia"),
        F.col("emb").alias("ea"),
        F.expr(norm_expr("emb")).alias("_na"),
    )
    b = pool.select(
        F.col("vec_id").alias("ib"),
        F.col("emb").alias("eb"),
        F.expr(norm_expr("emb")).alias("_nb"),
    )
    sims = (
        a.crossJoin(b)
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.expr(f"({dot_expr('ea', 'eb')}) / (_na * _nb)").alias("s"),
        )
    )
    sims.persist()
    return pool, sims


@register(
    "ann_mmr_diversified_topk",
    _duck_mmr_sql,  # lazy: embeds a sibling module's SQL
    doc="Maximal-marginal-relevance diversified retrieval (Carbonell "
    f"& Goldstein, SIGIR 1998): take the cosine top-{MMR_POOL} pool "
    f"for one query, then greedily select {MMR_K} results maximizing "
    f"lambda*relevance - (1-lambda)*max-similarity-to-selected "
    f"(lambda={MMR_LAMBDA}), ties by vec_id — the standard redundancy "
    "killer for RAG context assembly. The greedy loop runs as "
    f"{MMR_K - 1} chained DataFrame steps over the PERSISTED "
    f"{MMR_POOL}-row pool and its {MMR_POOL}x{MMR_POOL} similarity "
    "table — selection is O(pool^2) work on a broadcast-tiny frame, "
    f"driven by {MMR_K} ONE-ROW scalar argmax readouts (.first() off "
    f"the persisted {MMR_POOL}-row pool — the repo's allowed scalar-"
    "readout class, NOT a data-plane collect); the corpus-scale work "
    "is only the initial top-pool scan, identical to ann_cosine_topk's "
    "two-phase pruned ranking. Oracle: the same greedy unrolled as "
    f"{MMR_K} chained CTEs (k is a fixed constant, so the plan is "
    "finite and engine-portable).",
)
def ann_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool, sims = _mmr_pool_and_sims(spark, sf_dir)

    # Each greedy argmax is a SCALAR readout (one (vec_id, score) row
    # from the 20-row pool), so it lands as a plan literal for the next
    # step — the same allowed class as the repo's scalar-aggregate
    # readouts.  Keeping the selections as chained DataFrames instead
    # duplicates every earlier TakeOrdered subtree ~2^k times (each
    # step references the selected set twice) and was measured as a
    # flat ~4.5 s of pure job scheduling at ANY scale; the corpus-scale
    # work — the top-pool scan — stays fully distributed either way.
    first = (
        pool.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(1)
        .select("vec_id", F.col("rel").alias("score"))
        .first()
    )
    picked: list[tuple[int, float]] = [(first["vec_id"], first["score"])]
    for _k in range(2, MMR_K + 1):
        step = _mmr_step_frame(pool, sims, [p[0] for p in picked]).first()
        picked.append((step["vec_id"], step["score"]))

    spark = pool.sparkSession
    import math

    return spark.createDataFrame(
        [
            (k, vid, math.floor(score * 1000000) / 1000000)
            for k, (vid, score) in enumerate(picked, start=1)
        ],
        "rank bigint, vec_id bigint, score double",
    ).orderBy("rank")


# =====================================================================
# Streaming PSI drift monitor
# =====================================================================


def _streaming_psi_oracle() -> str:
    from .query_catalog_analytics import _PSI_SQL

    return _PSI_SQL


@register(
    "streaming_psi_drift",
    _streaming_psi_oracle,  # lazy: embeds a sibling module's SQL
    doc="STREAMING Population Stability Index: the events table "
    "replays as a 4-file availableNow stream; each micro-batch "
    "reduces to per-(event_type, bin) base/current count deltas "
    "(O(groups x bins) rows) and the drift readout computes PSI from "
    "the sum-merged counts — bit-identical arithmetic to the batch "
    "events_psi_drift entry, whose text IS the value oracle, so "
    "stream == batch is verified end-to-end. Sum-merged counts are "
    "associative but not replay-idempotent, so exactly-once rides on "
    "the idempotent_foreach_batch marker layer (the streaming_cms "
    "contrast test pins that dependency for this merge class). At "
    "100 TB/day this is distribution monitoring with bins-not-values "
    "state and one binning map pass per batch.",
)
def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil as _sh

    from .query_catalog_analytics import (
        PSI_BIN_WIDTH,
        PSI_BINS,
        PSI_SPLIT_DATE,
    )
    from .streaming.events import run_streaming_bin_counts

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_stream_psi_{tag}"
    _sh.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    src = f"{base}/src"
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    counts = run_streaming_bin_counts(
        spark,
        src,
        f"{base}/work",
        bin_expr=(
            f"LEAST(CAST(floor(value / {PSI_BIN_WIDTH}) AS INT), {PSI_BINS - 1})"
        ),
        period_expr=(
            f"CASE WHEN CAST(ts AS DATE) < DATE '{PSI_SPLIT_DATE}' "
            "THEN 'base' ELSE 'cur' END"
        ),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    term = (
        (
            (F.col("nb") + 1.0) / (F.col("tb") + float(PSI_BINS))
            - (F.col("nc") + 1.0) / (F.col("tc") + float(PSI_BINS))
        )
        * F.log(
            ((F.col("nb") + 1.0) / (F.col("tb") + float(PSI_BINS)))
            / ((F.col("nc") + 1.0) / (F.col("tc") + float(PSI_BINS)))
        )
    )
    return (
        counts.join(tot, "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .orderBy("event_type")
    )


# =====================================================================
# Hashed-key exact n-gram span dedup (the documented 100 TB path)
# =====================================================================


def _spans_hashed_oracle() -> str:
    from .query_catalog_analytics import _SHARED_NGRAM_ORACLE

    return _SHARED_NGRAM_ORACLE


@register(
    "dedup_shared_ngram_spans_hashed",
    _spans_hashed_oracle,  # lazy: embeds a sibling module's SQL
    doc="dedup_shared_ngram_spans with xxhash64 gram keys — the scale "
    "path its sibling's docstring prescribes for 100 TB, now measured "
    "instead of promised: the 8-byte hash is computed inside the "
    "transform so the gram STRING never leaves the projection, and "
    "the single gram shuffle moves fixed-width BIGINTs instead of "
    "~40-char strings (the string entry's dominant shuffle cost). "
    "Results are identical whenever no 64-bit collision occurs "
    "(expected collisions ~N^2/2^65 — about 10^-6 at a billion "
    "grams), so the value oracle is the SAME string-keyed SQL as the "
    "sibling entry; a hash collision would surface as a hash-gate "
    "mismatch, which is exactly the right failure mode for a "
    "correctness harness.",
)
def dedup_shared_ngram_spans_hashed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.dedup import shared_ngram_spans
    from .query_catalog_analytics import SHARED_NGRAM_N

    docs = load_table(spark, sf_dir, "documents")
    return shared_ngram_spans(
        docs, "doc_id", "text", n=SHARED_NGRAM_N, hash_grams=True
    )


# =====================================================================
# HLL set algebra (union by register merge, intersection by
# inclusion-exclusion)
# =====================================================================


def _duck_hll_chain(name: str, where: str) -> str:
    """Register-table CTE chain for one key set — the same md5/nibble
    register math as the sketch_hll_distinct oracle, parametrized by a
    WHERE clause."""
    idx = (
        "((strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1) * 16 + "
        "(strpos('0123456789abcdef', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1))"
    )
    return f"""
keys_{name} AS (SELECT DISTINCT user_id AS k FROM events WHERE {where}),
h_{name} AS (SELECT {idx} AS idx,
             substr(md5(CAST(k AS VARCHAR)), 3, 12) AS h12 FROM keys_{name}),
r_{name} AS (SELECT idx, length(regexp_extract(h12, '^0*')) AS lz,
             substr(h12, length(regexp_extract(h12, '^0*')) + 1, 1) AS nib
             FROM h_{name}),
rho_{name} AS (SELECT idx,
          CASE WHEN lz = 12 THEN 49
               ELSE 4 * lz + CASE WHEN (strpos('0123456789abcdef', nib) - 1) >= 8 THEN 1
                                  WHEN (strpos('0123456789abcdef', nib) - 1) >= 4 THEN 2
                                  WHEN (strpos('0123456789abcdef', nib) - 1) >= 2 THEN 3 ELSE 4 END
          END AS rho
        FROM r_{name}),
regs_{name} AS (SELECT idx, max(rho) AS m FROM rho_{name} GROUP BY idx)"""


def _duck_hll_estimate(name: str, regs: str) -> str:
    return f"""
fullr_{name} AS (SELECT s.idx, COALESCE(a.m, 0) AS m
          FROM (SELECT unnest(range(0, 256)) AS idx) s
          LEFT JOIN {regs} a ON s.idx = a.idx),
est_{name} AS (SELECT sum((CAST(1 AS BIGINT) << (49 - m))) AS s,
               sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM fullr_{name}),
e_{name} AS (SELECT CASE WHEN e <= 640.0 AND v > 0
                        THEN 256.0 * ln(256.0 / v) ELSE e END AS e
         FROM (SELECT v, (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0
                  * 562949953421312.0 / CAST(s AS DOUBLE) AS e
               FROM est_{name}) raw_{name})"""


def _duck_hll_algebra_sql() -> str:
    return f"""
WITH {_duck_hll_chain('a', "event_type = 'click' AND value >= 120")},
{_duck_hll_chain('b', "event_type = 'view' AND value >= 120")},
regs_u AS (SELECT idx, max(m) AS m FROM
           (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b) z GROUP BY idx),
{_duck_hll_estimate('a2', 'regs_a')},
{_duck_hll_estimate('b2', 'regs_b')},
{_duck_hll_estimate('u', 'regs_u')},
flags AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'click' AND value >= 120 THEN 1 ELSE 0 END) AS fa,
    max(CASE WHEN event_type = 'view' AND value >= 120 THEN 1 ELSE 0 END) AS fb
  FROM events WHERE event_type IN ('click', 'view') AND value >= 120
  GROUP BY user_id),
exact AS (
  SELECT CAST(sum(fa) AS BIGINT) AS n_a,
         CAST(sum(fb) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
         CAST(count(*) AS BIGINT) AS n_union
  FROM flags)
SELECT x.n_a AS n_a_exact, x.n_b AS n_b_exact,
  x.n_union AS n_union_exact, x.n_inter AS n_inter_exact,
  floor(a.e * 100) / 100 AS hll_a,
  floor(b.e * 100) / 100 AS hll_b,
  floor(u.e * 100) / 100 AS hll_union,
  floor(greatest(CAST(0 AS DOUBLE), a.e + b.e - u.e) * 100) / 100 AS hll_inter,
  CASE WHEN x.n_inter > 0 THEN
    floor(abs(greatest(CAST(0 AS DOUBLE), a.e + b.e - u.e) - x.n_inter)
          / x.n_inter * 10000) / 10000 END AS rel_err_inter
FROM e_a2 a CROSS JOIN e_b2 b CROSS JOIN e_u u CROSS JOIN exact x
"""


@register(
    "sketch_hll_set_algebra",
    _duck_hll_algebra_sql(),
    doc="HyperLogLog SET ALGEBRA: per-segment user sketches ('click' "
    "vs 'view', each gated to high-value events so the segments "
    "genuinely partially overlap), the union estimated from a REGISTER MERGE (max per "
    "register — the mergeability property, so segment sketches "
    "computed independently compose without touching raw keys), and "
    "the intersection by inclusion-exclusion (est_A + est_B - est_U, "
    "clamped at 0) with its relative error against the exact overlap "
    "— the audience-overlap readout every analytics stack builds on "
    "sketches because the exact distinct-intersection needs a full "
    "key shuffle. One flag-pivoted pass computes all four exact "
    "readouts for calibration. Register math is the proven "
    "sketch_hll_distinct kernel (md5 index, nibble-wise ranks, "
    "exact-BIGINT register sums).",
)
def sketch_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.sketches import hll_estimate_row, hll_register_rows

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & (F.col("value") >= 120)
    )
    a_keys = events.filter(F.col("event_type") == "click").select("user_id")
    b_keys = events.filter(F.col("event_type") == "view").select("user_id")
    regs_a = (
        hll_register_rows(a_keys, "user_id")
        .groupBy("idx")
        .agg(F.max("rho").alias("m"))
    )
    regs_b = (
        hll_register_rows(b_keys, "user_id")
        .groupBy("idx")
        .agg(F.max("rho").alias("m"))
    )
    regs_u = (
        regs_a.unionAll(regs_b).groupBy("idx").agg(F.max("m").alias("m"))
    )
    ea = hll_estimate_row(spark, regs_a).select(F.col("e").alias("e_a"))
    eb = hll_estimate_row(spark, regs_b).select(F.col("e").alias("e_b"))
    eu = hll_estimate_row(spark, regs_u).select(F.col("e").alias("e_u"))

    flags = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("fa"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("fb"),
        # high-value segments: the >=120 gate (applied at load) makes
        # the two segments genuinely partial-overlap on the uniform
        # testdata instead of every user qualifying for both
    )
    exact = flags.agg(
        F.sum("fa").cast("bigint").alias("n_a"),
        F.sum("fb").cast("bigint").alias("n_b"),
        F.sum(F.expr("CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_inter"),
        F.count("*").cast("bigint").alias("n_union"),
    )
    inter_est = F.greatest(
        F.lit(0.0), F.col("e_a") + F.col("e_b") - F.col("e_u")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("n_a").alias("n_a_exact"),
            F.col("n_b").alias("n_b_exact"),
            F.col("n_union").alias("n_union_exact"),
            F.col("n_inter").alias("n_inter_exact"),
            (F.floor(F.col("e_a") * 100) / 100).alias("hll_a"),
            (F.floor(F.col("e_b") * 100) / 100).alias("hll_b"),
            (F.floor(F.col("e_u") * 100) / 100).alias("hll_union"),
            (F.floor(inter_est * 100) / 100).alias("hll_inter"),
            F.when(
                F.col("n_inter") > 0,
                F.floor(
                    F.abs(inter_est - F.col("n_inter"))
                    / F.col("n_inter")
                    * 10000
                )
                / 10000,
            ).alias("rel_err_inter"),
        )
    )


# =====================================================================
# Poisson bootstrap confidence interval (single-pass, md5-deterministic)
# =====================================================================

BOOTSTRAP_REPLICAS = 32
#: cumulative Poisson(1) CDF — shared literals so both engines bucket
#: the SAME uniform into the SAME weight
_POIS_CDF = [
    (0, "0.36787944117144233"),
    (1, "0.7357588823428847"),
    (2, "0.9196986029286058"),
    (3, "0.9810118431238462"),
    (4, "0.9963401531726563"),
    (5, "0.9994058151824183"),
    (6, "0.9999167588507119"),
]


def _bootstrap_texts() -> tuple[str, str]:
    """Poisson bootstrap (the single-pass bootstrap used at scale —
    each replica draws a Poisson(1) multiplicity per row instead of
    resampling n-of-n, so one scan serves every replica): B=32
    md5-seeded replicas of mean(o_totalprice), 95% CI from the replica
    distribution.  Sums are exact DECIMAL cents (the repo's money-sum
    rule), so replica means are aggregation-order-proof."""
    b = BOOTSTRAP_REPLICAS
    case = (
        "CASE "
        + " ".join(f"WHEN u < {t} THEN {k}" for k, t in _POIS_CDF)
        + f" ELSE {len(_POIS_CDF)} END"
    )

    def build(explode_b: str, u_expr: str, pct: str) -> str:
        return f"""
WITH drawn AS (
  SELECT b, o_totalprice, u FROM (
    SELECT o_orderkey, o_totalprice, {explode_b} AS b FROM orders) t,
    LATERAL (SELECT {u_expr} AS u)),
weighted AS (SELECT b, o_totalprice, {case} AS wt FROM drawn),
reps AS (
  SELECT b,
    CAST(sum(wt * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      / sum(wt) AS mean_b
  FROM weighted GROUP BY b),
full_mean AS (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      / count(*) AS m, CAST(count(*) AS BIGINT) AS n FROM orders),
ci AS (
  SELECT {pct.format(p="0.025")} AS lo, {pct.format(p="0.975")} AS hi,
         CAST(count(*) AS BIGINT) AS n_replicas
  FROM reps)
SELECT f.n AS n_rows, c.n_replicas,
  floor(f.m * 10000) / 10000 AS mean,
  floor(c.lo * 10000) / 10000 AS ci_lo,
  floor(c.hi * 10000) / 10000 AS ci_hi,
  floor((c.hi - c.lo) / f.m * 1000000) / 1000000 AS rel_width
FROM full_mean f CROSS JOIN ci c
"""

    key = "concat(CAST(b AS STRING), ':', CAST(o_orderkey AS STRING))"
    spark_text = build(
        "explode(sequence(0, %d))" % (b - 1),
        f"CAST(conv(substring(md5({key}), 1, 4), 16, 10) AS INT) / 65536.0",
        "percentile(mean_b, {p})",
    )
    dkey = "CAST(b AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)"
    nib = (
        "(strpos('0123456789abcdef', substr(md5(" + dkey + "), {i}, 1)) - 1)"
    )
    duck_u = (
        f"({nib.format(i=1)} * 4096 + {nib.format(i=2)} * 256 + "
        f"{nib.format(i=3)} * 16 + {nib.format(i=4)}) / 65536.0"
    )
    duck_text = build(
        "unnest(generate_series(0, %d))" % (b - 1),
        duck_u,
        "quantile_cont(mean_b, {p})",
    )
    return spark_text, duck_text


_BOOTSTRAP_SPARK, _BOOTSTRAP_DUCK = _bootstrap_texts()

sql_query(
    "stats_poisson_bootstrap_ci",
    _BOOTSTRAP_SPARK,
    _BOOTSTRAP_DUCK,
    doc="Poisson bootstrap 95% CI for mean(o_totalprice) — the "
    "bootstrap that actually runs at scale (Chamandy et al., Google "
    "2012): instead of resampling n-of-n per replica (impossible "
    "without global coordination), each row draws a Poisson(1) "
    f"multiplicity per replica from an md5-seeded uniform, so ONE "
    f"scan serves all {BOOTSTRAP_REPLICAS} replicas and the shuffle "
    "is B skinny (replica, sum, count) partials. Replica sums use "
    "exact DECIMAL cents (aggregation-order-proof); the CI is the "
    "2.5/97.5 interpolated percentile of the replica means. "
    "Deterministic end-to-end — the md5 seeding makes the 'random' "
    "resample oracle-reproducible, which is exactly how a production "
    "pipeline makes bootstrap CIs replayable across retries.",
)


# =====================================================================
# Dedup threshold sensitivity sweep (one candidate pass, N readouts)
# =====================================================================

DEDUP_SWEEP_THRESHOLDS = [0.9, 0.95, 0.98]


def _duck_threshold_sweep_sql() -> str:
    cts = _duck_minhash_pair_ctes()
    th = ", ".join(str(t) for t in DEDUP_SWEEP_THRESHOLDS)
    jac = (
        "floor(len(list_intersect(da.sh, db.sh))::DOUBLE / "
        "(len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) "
        "* 10000) / 10000"
    )
    return f"""
WITH {cts},
jc AS (
  SELECT id_a, id_b, {jac} AS j
  FROM cand JOIN docs da ON da.doc_id = id_a JOIN docs db ON db.doc_id = id_b),
th AS (SELECT unnest([{th}]) AS threshold),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT t.threshold,
  CAST(count(j.j) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT j.id_b) AS BIGINT) AS n_docs_dropped,
  floor((d.n - count(DISTINCT j.id_b)) / d.n * 1000000) / 1000000 AS survival
FROM th t LEFT JOIN jc j ON j.j >= t.threshold CROSS JOIN nd d
GROUP BY t.threshold, d.n ORDER BY t.threshold
"""


@register(
    "dedup_minhash_threshold_sweep",
    _duck_threshold_sweep_sql(),
    doc="Dedup threshold-sensitivity curve: exact Jaccard is computed "
    "ONCE per LSH candidate, then every threshold in "
    f"{DEDUP_SWEEP_THRESHOLDS} reads pair volume, docs-dropped (the "
    "keep-lowest-id policy's loser count) and corpus survival off the "
    "same verified set — the tuning readout that tells you what a "
    "threshold change would do to the corpus BEFORE committing to the "
    "full dedup run. Candidate recall is the banded index's (pairs "
    "below its sensitivity curve are absent at every threshold "
    "alike). One feature-table pass + one candidate verify; the sweep "
    "itself is O(thresholds x verified pairs) on a tiny frame.",
)
def dedup_minhash_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.dedup import minhash_feature_table, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    feat = minhash_feature_table(
        docs, "doc_id", "text", MINHASH_HASHES, SHINGLE_N
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", MINHASH_HASHES, MINHASH_BANDS, SHINGLE_N,
        threshold=0.0, feat=feat,
    )
    th = spark.createDataFrame(
        [(t,) for t in DEDUP_SWEEP_THRESHOLDS], "threshold double"
    )
    nd = docs.agg(F.count("*").cast("double").alias("n"))
    per = (
        th.join(pairs, pairs["jaccard"] >= th["threshold"], "left")
        .groupBy("threshold")
        .agg(
            F.count("jaccard").cast("bigint").alias("n_pairs"),
            F.count_distinct("id_b").cast("bigint").alias("n_docs_dropped"),
        )
    )
    return (
        per.crossJoin(F.broadcast(nd))
        .select(
            "threshold",
            "n_pairs",
            "n_docs_dropped",
            (
                F.floor(
                    (F.col("n") - F.col("n_docs_dropped")) / F.col("n") * 1000000
                )
                / 1000000
            ).alias("survival"),
        )
        .orderBy("threshold")
    )


# =====================================================================
# Matryoshka dimension sweep (recall@k vs prefix width)
# =====================================================================

MRL_SWEEP_DIMS = [8, 16, 32, 64]


def _matryoshka_sweep_texts() -> tuple[str, str]:
    from .operators.similarity import cosine_expr
    from .query_catalog_ml import ANN_K, ANN_QUERY_IDS, _duck_cos

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)

    def build(cos_for_dim, k: int) -> str:
        tops = []
        finals = []
        for d in MRL_SWEEP_DIMS:
            tops.append(
                f"""top_{d} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
      row_number() OVER (PARTITION BY q.query_id
                         ORDER BY {cos_for_dim(d)} DESC, c.vec_id) AS r
    FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id) s_{d}
  WHERE r <= {k})"""
            )
            finals.append(
                f"""SELECT CAST({d} AS BIGINT) AS dims, e.query_id,
  CAST(count(t.vec_id) AS BIGINT) AS n_hits,
  floor(count(t.vec_id) / CAST({k} AS DOUBLE) * 10000) / 10000 AS recall_at_k
FROM exact e LEFT JOIN top_{d} t
  ON e.query_id = t.query_id AND e.vec_id = t.vec_id
GROUP BY e.query_id"""
            )
        exact = f"""exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
      row_number() OVER (PARTITION BY q.query_id
                         ORDER BY {cos_for_dim(None)} DESC, c.vec_id) AS r
    FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id) sx
  WHERE r <= {k})"""
        return (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qvec "
            f"FROM embeddings WHERE vec_id IN ({ids})),\n"
            + exact
            + ",\n"
            + ",\n".join(tops)
            + "\nSELECT * FROM (\n"
            + "\nUNION ALL\n".join(finals)
            + "\n) u ORDER BY dims, query_id"
        )

    def spark_cos(d):
        if d is None:
            return cosine_expr("c.embedding", "q.qvec")
        return cosine_expr(
            f"slice(c.embedding, 1, {d})", f"slice(q.qvec, 1, {d})"
        )

    def duck_cos(d):
        if d is None:
            return _duck_cos("c.embedding", "q.qvec")
        return _duck_cos(f"(c.embedding[1:{d}])", f"(q.qvec[1:{d}])")

    return build(spark_cos, ANN_K), build(duck_cos, ANN_K)


sql_query(
    "ann_matryoshka_dim_sweep",
    lambda: _matryoshka_sweep_texts()[0],  # lazy: embeds ml's cosine
    lambda: _matryoshka_sweep_texts()[1],
    doc="Matryoshka accuracy-vs-cost curve: recall@k of prefix-"
    f"dimension cosine ranking ({MRL_SWEEP_DIMS} of 64 components) "
    "against the full-dimension exact top-k, per query — the measured "
    "tradeoff behind choosing the coarse-pass width in "
    "ann_matryoshka_rerank_topk (64 dims is the sanity anchor: recall "
    "1.0 by construction). Each width is one corpus-linear scoring "
    "pass folding only its prefix (at 100 TB each pass reads a stored "
    "prefix column, so cost really is proportional to width); the "
    "recall join touches queries x k rows.",
)


# =====================================================================
# Dedup loss attribution by source
# =====================================================================


def _duck_dedup_by_source_sql() -> str:
    cts = _duck_minhash_pair_ctes()
    return f"""
WITH {cts},
losers AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
SELECT d.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(l.doc_id) AS BIGINT) AS n_dropped,
  floor(CAST(count(l.doc_id) AS DOUBLE) / count(*) * 10000) / 10000
    AS drop_rate
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
GROUP BY d.source ORDER BY d.source
"""


@register(
    "corpus_dedup_rate_by_source",
    _duck_dedup_by_source_sql(),
    doc="Dedup-loss ATTRIBUTION: the MinHash keep-lowest-id loser set "
    "joined back to document provenance, per-source doc counts / "
    "drops / drop rate — the observability readout that catches a "
    "crawler or connector flooding the corpus with near-duplicates "
    "(a spiking per-source drop rate) before it skews the training "
    "mix. Reuses the persisted feature table and banded candidate "
    "index; attribution itself is one UN-HINTED left join (the loser "
    "set is 20-50% of a real web corpus — never force a broadcast of "
    "it; AQE picks the strategy, matching drop_near_duplicates' "
    "left_anti) + a groupBy(source).",
)
def corpus_dedup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.dedup import minhash_feature_table, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    feat = minhash_feature_table(
        docs, "doc_id", "text", MINHASH_HASHES, SHINGLE_N
    )
    losers = (
        minhash_lsh_pairs(
            docs, "doc_id", "text", MINHASH_HASHES, MINHASH_BANDS,
            SHINGLE_N, JACCARD_THRESHOLD, feat=feat,
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("dropped", F.lit(1))
    )
    return (
        # no broadcast hint: the loser set is unbounded (a large share
        # of every near-dup-heavy corpus) — let AQE pick the strategy
        docs.join(losers, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("dropped").cast("bigint").alias("n_dropped"),
            (
                F.floor(
                    F.count("dropped").cast("double") / F.count("*") * 10000
                )
                / 10000
            ).alias("drop_rate"),
        )
        .orderBy("source")
    )


# =====================================================================
# DoReMi-style domain reweighting (excess loss → exponentiated gradient)
# =====================================================================

#: EG step size and uniform-smoothing mass (DoReMi's eta / c)
DOREMI_ETA = 1.0
DOREMI_SMOOTH = 0.2
#: fixed-point scale for order-independent NLL sums
_NLL_MICRO = 1_000_000


@register(
    "corpus_doremi_proxy_weights",
    f"""
WITH docs AS (SELECT source, string_split(text, ' ') AS t FROM documents),
toks AS (SELECT source, unnest(t) AS w FROM docs),
uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
ref AS (SELECT source,
          sum(CAST(floor(-ln(u.c / tt.n) * {_NLL_MICRO}) AS BIGINT)) AS s_micro,
          count(*) AS n_tok
        FROM toks t JOIN uni u ON t.w = u.w CROSS JOIN tot tt
        GROUP BY source),
bg AS (SELECT source,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i])) AS w1,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS big
       FROM docs WHERE len(t) >= 2),
cnt AS (SELECT big, CAST(count(*) AS DOUBLE) AS c FROM bg GROUP BY big),
ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS cw FROM bg GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
prox AS (SELECT source,
           sum(CAST(floor(-ln((c.c + {BIGRAM_ADD_K}) /
                 (x.cw + {BIGRAM_ADD_K} * s.v)) * {_NLL_MICRO}) AS BIGINT))
             AS s_micro,
           count(*) AS n_big
         FROM bg b JOIN cnt c ON b.big = c.big
         JOIN ctx x ON b.w1 = x.w1 CROSS JOIN voc s
         GROUP BY source),
dom AS (SELECT r.source,
          CAST(r.s_micro AS DOUBLE) / r.n_tok / {_NLL_MICRO} AS ref_loss,
          CAST(p.s_micro AS DOUBLE) / p.n_big / {_NLL_MICRO} AS proxy_loss,
          r.n_tok
        FROM ref r JOIN prox p ON r.source = p.source),
ex AS (SELECT source, ref_loss, proxy_loss, n_tok,
         greatest(0.0, proxy_loss - ref_loss) AS excess,
         exp({DOREMI_ETA} * greatest(0.0, proxy_loss - ref_loss)) AS w
       FROM dom),
tw AS (SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b) AS sw,
              CAST(count(*) AS DOUBLE) AS k FROM ex)
SELECT source,
  CAST(n_tok AS BIGINT) AS n_tokens,
  floor(ref_loss * 10000) / 10000 AS ref_loss,
  floor(proxy_loss * 10000) / 10000 AS proxy_loss,
  floor(excess * 10000) / 10000 AS excess_loss,
  floor(((1 - {DOREMI_SMOOTH}) * w / tw.sw + {DOREMI_SMOOTH} / tw.k)
        * 10000) / 10000 AS alpha
FROM ex CROSS JOIN tw
ORDER BY source
""",
    doc="DoReMi-style domain reweighting (Xie et al. 2023), the "
    "deterministic one-EG-step proxy: per-domain (source) EXCESS LOSS "
    "= mean per-position bigram NLL (the stronger 'proxy' LM) minus "
    "mean per-token unigram surprisal (the 'reference'), clamped at "
    "0; one exponentiated-gradient step from uniform gives "
    "w_d = exp(eta * excess_d), smoothed alpha_d = (1-c) * w_d / sum_w "
    "+ c/k — the domain-mixture readout a DoReMi run feeds the big "
    "training job (here: arithmetic over the corpus-trained LMs, not "
    "the proxy-training loop — documented honestly). Cross-engine "
    "determinism: every per-position NLL is floored to an exact "
    "integer micro-nat and domain losses are INTEGER sums (order-"
    "independent — a float avg over 10^5+ positions would flip floor "
    "boundaries between Spark's parallel and DuckDB's sequential "
    "association); sum_w over the k domains is an order-deterministic "
    "sorted fold (the corpus_temperature_mix pattern). Scale shape: "
    "tokenize once (persisted), two count tables + two scoring "
    "equi-joins — the text_bigram_perplexity plan plus a unigram "
    "pass; per-domain rollups are exact-integer map-side-combinable "
    "aggregations; the k-domain EG step is a 1-row broadcast.",
)
def corpus_doremi_proxy_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("t")
    )
    docs.persist()
    toks = docs.select("source", F.explode("t").alias("w"))
    toks.persist()
    uni = toks.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    tot = toks.agg(F.count("*").cast("double").alias("n"))
    micro = F.lit(_NLL_MICRO)
    ref = (
        toks.join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(-F.log(F.col("c") / F.col("n")) * micro)
            .cast("bigint")
            .alias("nll_micro"),
        )
        .groupBy("source")
        .agg(
            F.sum("nll_micro").alias("s_micro"),
            F.count("*").alias("n_tok"),
        )
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "concat(element_at(t, i), ' ', element_at(t, i + 1))"
                    " AS big))"
                )
            ).alias("p"),
        )
        .select("source", "p.w1", "p.big")
    )
    bg.persist()
    cnt = bg.groupBy("big").agg(F.count("*").cast("double").alias("c"))
    ctx = bg.groupBy("w1").agg(F.count("*").cast("double").alias("cw"))
    voc = toks.agg(F.count_distinct("w").cast("double").alias("v"))
    prox = (
        bg.join(cnt, "big")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "source",
            F.floor(
                -F.log(
                    (F.col("c") + BIGRAM_ADD_K)
                    / (F.col("cw") + BIGRAM_ADD_K * F.col("v"))
                )
                * micro
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
        .groupBy("source")
        .agg(
            F.sum("nll_micro").alias("s_micro"),
            F.count("*").alias("n_big"),
        )
    )
    dom = ref.alias("r").join(
        prox.alias("p"), "source"
    ).select(
        "source",
        (F.col("r.s_micro").cast("double") / F.col("r.n_tok") / micro).alias(
            "ref_loss"
        ),
        (F.col("p.s_micro").cast("double") / F.col("p.n_big") / micro).alias(
            "proxy_loss"
        ),
        F.col("r.n_tok").alias("n_tok"),
    )
    ex = dom.withColumn(
        "excess", F.greatest(F.lit(0.0), F.col("proxy_loss") - F.col("ref_loss"))
    ).withColumn("w", F.exp(F.lit(DOREMI_ETA) * F.col("excess")))
    # order-deterministic k-domain fold (BNLJ_OK: 1-row scalar join)
    tw = ex.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0),
            lambda a, s: a + s["w"],
        ).alias("sw"),
        F.count("*").cast("double").alias("k"),
    )
    return (
        ex.crossJoin(F.broadcast(tw))
        .select(
            "source",
            F.col("n_tok").cast("bigint").alias("n_tokens"),
            (F.floor(F.col("ref_loss") * 10000) / 10000).alias("ref_loss"),
            (F.floor(F.col("proxy_loss") * 10000) / 10000).alias(
                "proxy_loss"
            ),
            (F.floor(F.col("excess") * 10000) / 10000).alias("excess_loss"),
            (
                F.floor(
                    (
                        (1 - DOREMI_SMOOTH) * F.col("w") / F.col("sw")
                        + DOREMI_SMOOTH / F.col("k")
                    )
                    * 10000
                )
                / 10000
            ).alias("alpha"),
        )
        .orderBy("source")
    )


@register(
    "curate_rho_loss_selection",
    f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
toks AS (SELECT doc_id, unnest(t) AS w FROM docs),
uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
ref AS (SELECT doc_id,
          sum(CAST(floor(-ln(u.c / tt.n) * {_NLL_MICRO}) AS BIGINT)) AS s,
          count(*) AS n
        FROM toks t JOIN uni u ON t.w = u.w CROSS JOIN tot tt
        GROUP BY doc_id),
bg AS (SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i])) AS w1,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS big
       FROM docs WHERE len(t) >= 2),
cnt AS (SELECT big, CAST(count(*) AS DOUBLE) AS c FROM bg GROUP BY big),
ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS cw FROM bg GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
prox AS (SELECT doc_id,
           sum(CAST(floor(-ln((c.c + {BIGRAM_ADD_K}) /
                 (x.cw + {BIGRAM_ADD_K} * s.v)) * {_NLL_MICRO}) AS BIGINT))
             AS s,
           count(*) AS n
         FROM bg b JOIN cnt c ON b.big = c.big
         JOIN ctx x ON b.w1 = x.w1 CROSS JOIN voc s
         GROUP BY doc_id),
dpd AS (SELECT r.doc_id,
          CAST(floor(CAST(p.s AS DOUBLE) / p.n) AS BIGINT)
            - CAST(floor(CAST(r.s AS DOUBLE) / r.n) AS BIGINT) AS red
        FROM ref r JOIN prox p ON r.doc_id = p.doc_id),
binned AS (SELECT doc_id, red,
             ntile(4) OVER (ORDER BY red DESC, doc_id) AS bucket
           FROM dpd)
SELECT bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(red) AS BIGINT) AS sum_red_micro,
  floor(CAST(sum(red) AS DOUBLE) / count(*) / 100) / 10000
    AS avg_reducible,
  bucket = 1 AS selected
FROM binned GROUP BY bucket ORDER BY bucket
""",
    doc="RHO-loss learnability selection (Mindermann et al., ICML "
    "2022), the deterministic corpus-LM proxy: per-document REDUCIBLE "
    "loss = mean bigram-LM NLL (the training-model proxy) minus mean "
    "unigram surprisal (the holdout/reference model); documents "
    "quartiled on it (highest = most learnable-but-not-yet-learned) "
    "and the top quartile marked selected — the doc-level companion "
    "to corpus_doremi_proxy_weights' domain-level EG step (selection "
    "vs reweighting, the two standard uses of excess loss in data "
    "curation). Determinism: per-doc losses are exact integer "
    "micro-nats (floored integer division of integer NLL sums), the "
    "quartile key is a pure BIGINT (no float ordering hazard), and "
    "the quartile itself is exact_ntile — distributed, bit-identical "
    "to the oracle's NTILE, no single-task funnel over the per-doc "
    "frame. Scale shape: the bigram-perplexity plan plus a unigram "
    "pass (tokenize once, persisted; count tables hash-aggregate; "
    "scoring equi-joins), then an O(docs) integer rollup.",
)
def curate_rho_loss_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.layout import exact_ntile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    docs.persist()
    toks = docs.select("doc_id", F.explode("t").alias("w"))
    toks.persist()
    uni = toks.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    tot = toks.agg(F.count("*").cast("double").alias("n"))
    micro = F.lit(_NLL_MICRO)
    ref = (
        toks.join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.floor(-F.log(F.col("c") / F.col("n")) * micro)
            .cast("bigint")
            .alias("m"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("s"), F.count("*").alias("n"))
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "concat(element_at(t, i), ' ', element_at(t, i + 1))"
                    " AS big))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.big")
    )
    bg.persist()  # cnt, ctx AND the scoring join read it — explode once
    cnt = bg.groupBy("big").agg(F.count("*").cast("double").alias("c"))
    ctx = bg.groupBy("w1").agg(F.count("*").cast("double").alias("cw"))
    voc = toks.agg(F.count_distinct("w").cast("double").alias("v"))
    prox = (
        bg.join(cnt, "big")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "doc_id",
            F.floor(
                -F.log(
                    (F.col("c") + BIGRAM_ADD_K)
                    / (F.col("cw") + BIGRAM_ADD_K * F.col("v"))
                )
                * micro
            )
            .cast("bigint")
            .alias("m"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("s"), F.count("*").alias("n"))
    )
    dpd = ref.alias("r").join(prox.alias("p"), "doc_id").select(
        "doc_id",
        (
            F.floor(F.col("p.s").cast("double") / F.col("p.n")).cast("bigint")
            - F.floor(F.col("r.s").cast("double") / F.col("r.n")).cast(
                "bigint"
            )
        ).alias("red"),
    )
    binned = exact_ntile(
        dpd, [F.col("red").desc(), F.col("doc_id")], 4, out="bucket"
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("red").cast("bigint").alias("sum_red_micro"),
            (
                F.floor(
                    F.sum("red").cast("double") / F.count("*") / 100
                )
                / 10000
            ).alias("avg_reducible"),
        )
        .withColumn("selected", F.col("bucket") == 1)
        .orderBy("bucket")
    )
