"""Training-data-pipeline catalog entries (SURVEY.md §7 M4):
deduplication, similarity search, and text analysis over the
``documents`` and ``embeddings`` tables — each paired with a DuckDB
oracle that reproduces the algorithm bit-for-bit (md5-based hashing,
explicit double folds, deterministic tiebreaks).

Registered into the same ``_CATALOG`` as ``query_catalog``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (
    BPE_TOKEN_RE,
    QUALITY_STOPWORDS,
    distinct_shingles,
    duck_distinct_shingles,
    duck_lang_id,
    duck_minhash_signature,
    duck_simhash_bits,
    duck_word_ngrams,
    fingerprint_md5,
    fingerprint_min_shingle,
    lang_id,
    quality_features,
    token_count_bpe,
    token_count_ws,
)
from .operators.dedup import (
    dedup_exact,
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    embedding_neardup_pairs_banded,
    hyperplanes,
    lsh_bucket_topk,
)
from .query_catalog import register, sql_query
from .query_oracle_shared import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_HASHES,
    QUALITY_MIN,
    SHINGLE_N,
    _duck_minhash_pair_ctes,
    bigram_ppl_duck_sql,
    values_oracle as _values_oracle,
)
from .sources.registry import load_table

# ---- shared constants (Spark impl and oracle MUST agree) -------------

#: r12: run curate_ccnet_corpus's minhash feature-table build on a
#: background thread overlapping the perplexity pipeline's eager
#: checkpoint (guide §2.6).  Results identical either way; the flag
#: exists so the overlap could be measured per scale — see
#: OPTIMIZATION_r12.md for the recorded decision.
CCNET_OVERLAP_FEAT = True

ANN_QUERY_IDS = [0, 1, 2]
ANN_K = 5
LSH_PLANES = 4
EMB_DIMS = 64
NEARDUP_COS_THRESHOLD = 0.95
# banded variant: 192 sign bits in 12 bands of 16.  Band key domains
# must stay FINE relative to corpus size — the same lesson three
# rounds running, one scale decade apart each time: r5 found 4-bit
# bands (16 values) quadratic at sf1 (36 s), moved to 8-bit; r6 found
# 8-bit bands (256 values) quadratic at sf10 (200k vectors put ~780
# in every bucket → ~300M candidates; the run filled the disk with
# shuffle spill and DIED); r7 ran fixed 12×16-bit, which would have
# saturated at the NEXT decade (~10M vectors).  r8 applies the law
# CONTINUOUSLY instead of re-tuning per decade: a fixed 384-plane
# sign pool, band width r = clamp(ceil(log2(N)), 16, 24) from parquet
# footer counts, bands = floor(384/r) — see _banded_geometry for the
# recall tiers and the "raise the pool linearly past 16M vectors"
# knob.
NEARDUP_TOTAL_PLANES = 384
NEARDUP_MIN_BAND_BITS = 16
NEARDUP_MAX_BAND_BITS = 24


# ---- DuckDB snippet builders ----------------------------------------


def _duck_cos(a: str, b: str) -> str:
    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({x})), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), "
            f"(acc, v) -> acc + v)"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _duck_bucket(vec: str, planes: int = LSH_PLANES) -> str:
    hp = hyperplanes(planes, EMB_DIMS)
    signs = []
    for row in hp:
        lit = "[" + ", ".join(repr(x) for x in row) + "]"
        d = (
            f"list_reduce(list_transform(generate_series(1, len({vec})), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]), "
            f"(acc, v) -> acc + v)"
        )
        signs.append(f"CASE WHEN {d} >= 0 THEN '+' ELSE '-' END")
    return "concat(" + ", ".join(signs) + ")"


# =====================================================================
# Text analysis
# =====================================================================


@register(
    "text_token_counts",
    "SELECT doc_id, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws, "
    f"CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_tokens_bpe "
    "FROM documents",
    doc="Token counting: whitespace split + BPE-ish regex extractor, "
    "pure Catalyst expressions (no UDF).",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("bigint").alias("n_tokens_ws"),
        token_count_bpe("text").cast("bigint").alias("n_tokens_bpe"),
    )


def _duck_quality_sql() -> str:
    toks = "string_split(text, ' ')"
    n_chars = "length(text)"
    n_tokens = f"len({toks})"
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    punct = "length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))"
    return (
        "SELECT doc_id, "
        f"CAST({n_chars} AS BIGINT) AS n_chars_m, "
        f"CAST({n_tokens} AS BIGINT) AS n_tokens, "
        f"floor(((CAST({n_chars} AS DOUBLE) - ({n_tokens} - 1)) / {n_tokens}) * 10000) / 10000 AS avg_token_len, "
        f"floor((CAST({punct} AS DOUBLE) / {n_chars}) * 10000) / 10000 AS punct_ratio, "
        f"floor((CAST(len(list_filter({toks}, t -> t IN ({stop_list}))) AS DOUBLE) / {n_tokens}) * 10000) / 10000 AS stopword_ratio, "
        f"floor((CAST(len(list_distinct({toks})) AS DOUBLE) / {n_tokens}) * 10000) / 10000 AS uniq_token_ratio, "
        f"floor((least(1.0, greatest(0.0, "
        f"0.4 * least(1.0, CAST({n_tokens} AS DOUBLE) / 64) "
        f"+ 0.4 * (CAST(len(list_distinct({toks})) AS DOUBLE) / {n_tokens}) "
        f"+ 0.2 * (1.0 - CAST({punct} AS DOUBLE) / {n_chars})))) * 10000) / 10000 AS quality_score "
        "FROM documents"
    )


@register(
    "text_quality_scores",
    _duck_quality_sql(),
    doc="Quality scoring: length/punctuation/stopword/uniqueness features "
    "+ composite [0,1] score, all JVM-side expressions.",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return df.select(
        "doc_id",
        feats["n_chars_m"].cast("bigint").alias("n_chars_m"),
        feats["n_tokens"].cast("bigint").alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["uniq_token_ratio"].alias("uniq_token_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


@register(
    "text_lang_id",
    f"SELECT doc_id, lang, {duck_lang_id('text')} AS lang_pred, "
    f"CAST(lang = {duck_lang_id('text')} AS BOOLEAN) AS is_match FROM documents",
    doc="Language-ID n-gram/stopword heuristic; deterministic marker "
    "CASE, identical in both engines.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    pred = lang_id("text")
    return df.select(
        "doc_id", "lang", pred.alias("lang_pred"), (F.col("lang") == pred).alias("is_match")
    )


@register(
    "text_fingerprints",
    "SELECT doc_id, md5(trim(text)) AS fp_md5, "
    "CASE WHEN len(string_split(text, ' ')) >= 4 THEN "
    "list_min(list_transform(generate_series(1, len(string_split(text, ' ')) - 3), "
    "i -> md5(array_to_string(string_split(text, ' ')[i:i+3], ' ')))) "
    "ELSE md5(trim(text)) END AS fp_shingle FROM documents",
    doc="Document fingerprinting: whole-doc md5 + min-shingle "
    "(1-permutation MinHash) content fingerprint.",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp_md5"),
        fingerprint_min_shingle("text", 4).alias("fp_shingle"),
    )


# =====================================================================
# Deduplication
# =====================================================================


@register(
    "dedup_exact_text",
    "SELECT doc_id, lang, source, n_chars FROM ("
    "SELECT doc_id, lang, source, n_chars, "
    "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents) "
    "WHERE rn = 1",
    doc="Exact dedup: hash-groupBy on content, deterministic survivor "
    "(lowest doc_id) — one shuffle at any scale.",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return dedup_exact(df, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


#: skew guard for the shingle self-join: shingles shared by more than
#: this many docs are stopword-like (no discriminative signal) and, at
#: scale, each contributes O(df^2) join rows. Scaling rule: keep the cap
#: a small multiple of the largest expected duplicate-cluster size —
#: true near-dup pairs still share plenty of sub-cap shingles, while a
#: corpus-wide shingle (df ~ N) is pruned before it can produce ~N^2
#: rows. 1000 at test scale; at 100 TB set via the same constant.
NGRAM_MAX_SHINGLE_DF = 1000


def _duck_jaccard_sql() -> str:
    sh = duck_distinct_shingles("text", SHINGLE_N)
    return f"""
WITH docs AS (SELECT doc_id, {sh} AS sh FROM documents),
ex0 AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
good AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_SHINGLE_DF}),
ex AS (SELECT ex0.doc_id, ex0.shingle FROM ex0 JOIN good USING (shingle)),
counts AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, common,
  CAST(ca.n_sh AS BIGINT) AS n_a, CAST(cb.n_sh AS BIGINT) AS n_b,
  floor(common::DOUBLE / (ca.n_sh + cb.n_sh - common) * 10000) / 10000 AS jaccard
FROM pairs
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE floor(common::DOUBLE / (ca.n_sh + cb.n_sh - common) * 10000) / 10000 >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard_pairs",
    _duck_jaccard_sql(),
    doc="n-gram Jaccard near-dup pairs via shingle-explode self-join "
    "(shuffle on shingle, never quadratic in docs); df-capped shingles "
    f"(max df {NGRAM_MAX_SHINGLE_DF}) bound the worst-key skew, "
    "mirrored in the oracle.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(
        df,
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        max_shingle_df=NGRAM_MAX_SHINGLE_DF,
    )
    return out.select(
        "id_a",
        "id_b",
        "common",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "jaccard",
    )


def _duck_minhash_lsh_sql() -> str:
    return f"WITH {_duck_minhash_pair_ctes()}\nSELECT id_a, id_b, jaccard FROM pairs"


def _duck_minhash_error_sql() -> str:
    """MinHash estimate-vs-exact readout over ALL LSH candidates
    (no threshold): reuses the shared sigs/cand/docs CTE chain."""
    jac = (
        "floor(len(list_intersect(da.sh, db.sh))::DOUBLE / "
        "(len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) "
        "* 10000) / 10000"
    )
    est = (
        f"floor(len(list_filter(list_transform(generate_series(1, "
        f"{MINHASH_HASHES}), i -> sa.sig[i] = sb.sig[i]), x -> x))::DOUBLE "
        f"/ {MINHASH_HASHES} * 10000) / 10000"
    )
    return f"""
WITH {_duck_minhash_pair_ctes()},
errs AS (
  SELECT c.id_a, c.id_b, {est} AS est_jaccard, {jac} AS exact_jaccard
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b
  JOIN docs da ON da.doc_id = c.id_a
  JOIN docs db ON db.doc_id = c.id_b)
SELECT id_a, id_b, est_jaccard, exact_jaccard,
  floor(abs(est_jaccard - exact_jaccard) * 10000) / 10000 AS abs_err
FROM errs
"""


@register(
    "dedup_minhash_estimate_error",
    _duck_minhash_error_sql(),
    doc="MinHash sketch-accuracy readout: for every LSH candidate "
    "pair (no threshold), the signature-slot agreement fraction (the "
    "unbiased MinHash Jaccard estimator) next to the exact "
    "shingle-set Jaccard and their absolute error — the calibration "
    "data that justifies a chosen (num_hashes, bands) geometry before "
    "trusting the sketch at 100 TB ('measure, don't guess' applied to "
    "the dedup index, the dedup-side sibling of ann_recall_eval). "
    "Candidates come from the banded index (linear shuffle); the "
    "verify join touches candidates only.",
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_feature_table, minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    feat = minhash_feature_table(
        docs, "doc_id", "text", MINHASH_HASHES, SHINGLE_N
    )
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", MINHASH_HASHES, MINHASH_BANDS, SHINGLE_N,
        feat=feat,
    )
    fa = feat.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    fb = feat.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    exact = (
        F.floor(
            inter
            / (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b")))
            * 10000
        )
        / 10000
    )
    est = (
        F.floor(
            F.expr(
                "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
            ).cast("double")
            / MINHASH_HASHES
            * 10000
        )
        / 10000
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a", "id_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
        )
        .withColumn(
            "abs_err",
            F.floor(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")) * 10000)
            / 10000,
        )
    )


@register(
    "dedup_minhash_lsh_pairs",
    _duck_minhash_lsh_sql(),
    doc="MinHash+LSH near-dup: md5-lexicographic MinHash signatures, "
    f"{MINHASH_BANDS} bands × {MINHASH_HASHES // MINHASH_BANDS} rows, "
    "bucket equi-join for candidates, exact-Jaccard verification.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        df,
        "doc_id",
        "text",
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
    )


# the newest 25% of docs (md5 bucket < 64/256) play the "daily batch"
# arriving against the already-deduped 75% "base corpus"
INCR_BATCH_BUCKETS = 64

_DUCK_DOC_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
)


def _duck_incremental_minhash_sql() -> str:
    """Oracle: the FULL pair set (same signature CTEs) filtered to
    pairs touching the batch — definitionally what incremental dedup
    must return."""
    return f"""
WITH {_duck_minhash_pair_ctes()},
member AS (
  SELECT doc_id, {_DUCK_DOC_BUCKET} < {INCR_BATCH_BUCKETS} AS is_batch
  FROM documents)
SELECT p.id_a, p.id_b, p.jaccard,
  CASE WHEN ma.is_batch AND mb.is_batch THEN 'batch-batch'
       ELSE 'base-batch' END AS pair_kind
FROM pairs p
JOIN member ma ON ma.doc_id = p.id_a
JOIN member mb ON mb.doc_id = p.id_b
WHERE ma.is_batch OR mb.is_batch
"""


@register(
    "dedup_incremental_minhash",
    _duck_incremental_minhash_sql(),
    doc="Incremental near-dup: a new 25% batch deduped against the "
    "persisted banded-signature index of the 75% base corpus "
    "(batch×base bucket join + batch×batch self-join, base×base never "
    "generated) — the O(|batch|) form a 100 TB corpus requires; "
    "result proven equal to the full operator minus base×base pairs.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.chunking import hash_bucket_256

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket_256(F.col("doc_id"))
    return incremental_minhash_pairs(
        docs.filter(bucket >= INCR_BATCH_BUCKETS),
        docs.filter(bucket < INCR_BATCH_BUCKETS),
        "doc_id",
        "text",
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
    )


def _duck_dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_minhash_pair_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT re.node, e.v FROM reach re JOIN edges e ON re.r = e.u)
SELECT node AS doc_id, least(node, min(r)) AS cluster_id
FROM reach GROUP BY node
"""


@register(
    "dedup_duplicate_clusters",
    _duck_dup_clusters_sql(),
    doc="Transitive near-dup clusters: distributed min-label "
    "propagation (large-star/small-star CC) over the verified "
    "MinHash-LSH pair graph; oracle is DuckDB's recursive transitive "
    "closure — an iterative distributed algorithm with a full SQL "
    "differential check.",
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import duplicate_clusters

    df = load_table(spark, sf_dir, "documents")
    return duplicate_clusters(
        df,
        "doc_id",
        "text",
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
    )


@register(
    "dedup_simhash_signatures",
    f"SELECT doc_id, {duck_simhash_bits('text', 16)} AS simhash FROM documents",
    doc="SimHash 16-bit signatures from md5 nibble-parity majority "
    "vote — pure expressions, identical in both engines.",
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return simhash_signatures(df, "doc_id", "text", 16)


def _duck_emb_neardup_sql() -> str:
    cos = _duck_cos("ea", "eb")
    return f"""
WITH e AS (SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket FROM embeddings),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round({cos}, 6) AS cos_sim
FROM cand WHERE {cos} >= {NEARDUP_COS_THRESHOLD}
"""


@register(
    "dedup_embedding_cosine_pairs",
    _duck_emb_neardup_sql(),
    doc="Embedding near-dup pairs: LSH sign-bucket candidate pruning + "
    f"exact cosine ≥ {NEARDUP_COS_THRESHOLD} verification.",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        df,
        "vec_id",
        "embedding",
        threshold=NEARDUP_COS_THRESHOLD,
        planes=LSH_PLANES,
        dims=EMB_DIMS,
    )


def _banded_geometry(n: int) -> tuple[int, int]:
    """Corpus-adaptive band geometry over a FIXED pool of
    ``NEARDUP_TOTAL_PLANES`` sign bits: band width r =
    clamp(ceil(log2(N)), 16, 24) — the "key domain scales with
    log2(corpus)" law that three rounds of sf-decade offenders all
    converged on, now applied continuously instead of re-tuned by
    hand each decade — and bands = floor(total/r) (every unused bit
    is recall left on the table).  Expected per-band bucket
    population N/2^r stays ≤ ~1, so candidate volume ≈ bands·N²/2^r
    tracks ~bands·N instead of growing quadratically between manual
    retunes.  Recall at cos≥0.95 (p=0.8987 per plane):
    r16×24 ≈ 0.992, r18×21 ≈ 0.964, r20×19 ≈ 0.91, r24×16 ≈ 0.72 —
    past ~16M vectors raise NEARDUP_TOTAL_PLANES (linear signature
    cost) to recover the top tiers.  Bit-parity with the scalar chain
    in the oracle SQL."""
    import math

    r = min(
        NEARDUP_MAX_BAND_BITS,
        max(NEARDUP_MIN_BAND_BITS, math.ceil(math.log2(max(n, 2)))),
    )
    return r, NEARDUP_TOTAL_PLANES // r


def _duck_emb_neardup_banded_sql() -> str:
    cos = _duck_cos("ea", "eb")
    return f"""
WITH g AS (
  SELECT r, CAST(floor({NEARDUP_TOTAL_PLANES}.0 / r) AS BIGINT) AS bands
  FROM (SELECT least({NEARDUP_MAX_BAND_BITS}, greatest({NEARDUP_MIN_BAND_BITS},
          CAST(ceil(log2(count(*))) AS BIGINT))) AS r FROM embeddings)),
e AS MATERIALIZED (SELECT vec_id, embedding,
           {_duck_bucket('embedding', NEARDUP_TOTAL_PLANES)} AS sig FROM embeddings),
bt AS (SELECT unnest(generate_series(0, (SELECT bands FROM g) - 1)) AS band),
banded AS MATERIALIZED (
  SELECT vec_id, embedding, band,
         substr(sig, band * (SELECT r FROM g) + 1, (SELECT r FROM g)) AS key
  FROM e, bt),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT id_a, id_b, round({cos}, 6) AS cos_sim
FROM cand WHERE {cos} >= {NEARDUP_COS_THRESHOLD}
"""


@register(
    "dedup_embedding_cosine_pairs_banded",
    _duck_emb_neardup_banded_sql(),
    doc="Banded-LSH embedding near-dup with CORPUS-ADAPTIVE geometry "
    f"(r8): a fixed {NEARDUP_TOTAL_PLANES}-plane sign pool split into "
    "bands of r = clamp(ceil(log2(N)), 16, 24) bits, bands = "
    "floor(total/r), N from parquet footers — the band-domain law "
    "(8-bit bands went quadratic at sf1, 16-bit would at ~10M "
    "vectors) applied continuously instead of re-tuned per decade; "
    "recall 0.99 -> 0.91 across the tiers at cos>=0.95. The candidate "
    "stream carries ONLY id pairs through its dedup shuffle (~16 B/"
    "row, not two 64-float vectors); vectors re-join once per "
    "surviving pair for the exact-cosine verify. Oracle computes the "
    "same (r, bands) as SQL scalars over the same fixed plane pool.",
)
def dedup_embedding_cosine_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.registry import table_row_count

    df = load_table(spark, sf_dir, "embeddings")
    r, bands = _banded_geometry(table_row_count(sf_dir, "embeddings"))
    return embedding_neardup_pairs_banded(
        df,
        "vec_id",
        "embedding",
        threshold=NEARDUP_COS_THRESHOLD,
        planes=r * bands,
        bands=bands,
        dims=EMB_DIMS,
    )


@register(
    "embedding_quantize_int8",
    """
SELECT vec_id, floor(maxabs * 1000000) / 1000000 AS scale,
  array_to_string(list_transform(embedding, x ->
    CAST(CAST(floor(CAST(x AS DOUBLE) / maxabs * 127 + 0.5) AS INT) AS VARCHAR)), ',') AS q
FROM (SELECT vec_id, embedding,
      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        (acc, v) -> greatest(acc, v)) AS maxabs
      FROM embeddings) t
WHERE maxabs > 0
""",
    doc="Symmetric per-vector int8 quantization (4x storage cut for "
    "the ANN candidate tier): scale = max|x|, q = floor(x/scale*127 "
    "+ 0.5) — floor-based rounding is engine-identical where round() "
    "half-ties are not.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import quantize_embeddings_int8

    df = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings_int8(df, "vec_id", "embedding")


# =====================================================================
# Similarity search (ANN)
# =====================================================================


def _duck_ann_sql(bucketed: bool) -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = _duck_cos("qvec", "embedding")
    if bucketed:
        src = f"(SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket FROM embeddings)"
        joined = (
            f"SELECT q.vec_id AS query_id, c.vec_id, q.embedding AS qvec, c.embedding "
            f"FROM {src} c JOIN {src} q ON c.bucket = q.bucket "
            f"AND q.vec_id IN ({ids}) AND c.vec_id <> q.vec_id"
        )
    else:
        joined = (
            f"SELECT q.vec_id AS query_id, c.vec_id, q.embedding AS qvec, c.embedding "
            f"FROM embeddings c, embeddings q "
            f"WHERE q.vec_id IN ({ids}) AND c.vec_id <> q.vec_id"
        )
    return f"""
WITH scored AS (
  SELECT query_id, vec_id, {cos} AS cos_full FROM ({joined}))
SELECT query_id, vec_id, round(cos_full, 6) AS cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_cosine_topk",
    _duck_ann_sql(bucketed=False),
    doc="Exact brute-force cosine top-k per query vector (broadcast "
    "query set, single corpus scan) — the ANN correctness baseline.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(df, "vec_id", "embedding", ANN_QUERY_IDS, ANN_K)


@register(
    "ann_lsh_bucket_topk",
    _duck_ann_sql(bucketed=True),
    doc="Approximate top-k within the query's deterministic "
    "hyperplane-sign LSH bucket — the scale path (join replaces the "
    "cross product).",
)
def ann_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(
        df, "vec_id", "embedding", ANN_QUERY_IDS, ANN_K, LSH_PLANES, EMB_DIMS
    )


MULTIPROBE_BITS = 2


def _duck_plane_dots(vec: str, planes: int = LSH_PLANES) -> str:
    hp = hyperplanes(planes, EMB_DIMS)
    dots = []
    for row in hp:
        lit = "[" + ", ".join(repr(x) for x in row) + "]"
        dots.append(
            f"list_reduce(list_transform(generate_series(1, len({vec})), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]), "
            f"(acc, v) -> acc + v)"
        )
    return "[" + ", ".join(dots) + "]"


def _duck_multiprobe_sql(planes: int = LSH_PLANES, nprobe_bits: int = MULTIPROBE_BITS) -> str:
    """Query-directed multiprobe oracle: same probe construction as
    ``with_multiprobe_buckets`` — own sign bucket + Hamming-1 flips of
    the ``nprobe_bits`` least-confident bits (ties by plane index)."""
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = _duck_cos("qvec", "embedding")
    flip = (
        "list_transform("
        f"list_sort(list_transform(generate_series(1, {planes}), "
        "j -> {'a': abs(dots[j]), 'j': j}))"
        f"[1:{nprobe_bits}], s -> "
        "substr(sig, 1, s.j - 1) || "
        "(CASE WHEN substr(sig, s.j, 1) = '+' THEN '-' ELSE '+' END) || "
        f"substr(sig, s.j + 1, {planes}))"
    )
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_duck_bucket("embedding", planes)} AS bucket FROM embeddings),
qdots AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS sig,
         {_duck_plane_dots("embedding", planes)} AS dots
  FROM bucketed WHERE vec_id IN ({ids})),
qprobes AS (
  SELECT query_id, qvec, unnest(list_distinct(list_concat([sig], {flip}))) AS bucket
  FROM qdots),
scored AS (
  SELECT q.query_id, c.vec_id, {cos} AS cos_full
  FROM bucketed c JOIN qprobes q ON c.bucket = q.bucket
  WHERE c.vec_id <> q.query_id)
SELECT query_id, vec_id, round(cos_full, 6) AS cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_lsh_multiprobe_topk",
    _duck_multiprobe_sql(),
    doc="Multiprobe LSH top-k: each query probes its own sign bucket "
    f"plus the {MULTIPROBE_BITS} least-confident Hamming-distance-1 "
    "buckets (query-directed multiprobe — smallest |dot| bits flip "
    "first, deterministic tiebreak by plane index). Recovers most of "
    "the recall a single bucket loses for 1+bits lookups instead of "
    "doubled hash tables.",
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import lsh_multiprobe_topk

    df = load_table(spark, sf_dir, "embeddings")
    return lsh_multiprobe_topk(
        df, "vec_id", "embedding", ANN_QUERY_IDS, ANN_K,
        LSH_PLANES, EMB_DIMS, nprobe_bits=MULTIPROBE_BITS,
    )


# =====================================================================
# Multimodal columns (binary payload + typed metadata; stubbed codecs)
# The kernels are mapInPandas (not SQL-expressible), but the synthetic
# asset table is a DETERMINISTIC pure function, so each entry gets a
# golden VALUES oracle computed by running the same pure codec
# functions driver-side at registration time — the driver compare then
# verifies the distributed Arrow path reproduces the local reference
# computation bit-for-bit (incl. a real PNG encode→decode round trip).
# =====================================================================

import hashlib as _hashlib  # noqa: E402

from .operators.multimodal import (  # noqa: E402
    audio_feature_values,
    decode_image_meta,
    extract_features,
    make_synthetic_assets,
    media_meta,
    pseudo_feature,
    resize_image_bytes,
    synthetic_asset_rows,
    synthetic_audio_samples,
    synthetic_image_dims,
    synthetic_video_frames,
)

_MM_N_ASSETS = 64





def _mm_meta_golden() -> list[tuple]:
    """Expected decode_image_meta output, re-derived from the generator
    SPEC (intended dims per ``synthetic_image_dims``), not the decoder
    — so the oracle genuinely checks the encode→decode round trip."""
    out = []
    for asset_id, media, payload, n_bytes, _uri in synthetic_asset_rows(_MM_N_ASSETS):
        if media == "image":
            w, h = synthetic_image_dims(asset_id)
            fmt: str | None = "png"
        else:
            w, h = None, None
            fmt = "wav" if media == "audio" else "fram"
        out.append(
            (
                asset_id,
                media,
                n_bytes,
                fmt,
                -1 if w is None else w,
                -1 if h is None else h,
                _hashlib.md5(payload).hexdigest(),
            )
        )
    return out


@register(
    "mm_decode_image_meta",
    _values_oracle(
        _mm_meta_golden(),
        [
            ("asset_id", "BIGINT"),
            ("media_type", "VARCHAR"),
            ("n_bytes", "BIGINT"),
            ("format", "VARCHAR"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("payload_md5", "VARCHAR"),
        ],
    ),
    doc="Multimodal metadata decode: real PNG IHDR parse (CRC-checked) "
    "+ WAV/FRAM container sniffing via Arrow-batched mapInPandas; "
    "oracle = golden rows from the generator spec, so the round trip "
    "(stdlib PNG encode → distributed decode) is what's verified.",
)
def mm_decode_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = make_synthetic_assets(spark, _MM_N_ASSETS)
    meta = decode_image_meta(assets)
    return meta.select(
        "asset_id",
        "media_type",
        "n_bytes",
        "format",
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        "payload_md5",
    )


@register(
    "mm_decode_jpeg_meta",
    _values_oracle(
        [(i, "jpeg", *synthetic_image_dims(i)) for i in range(8)],
        [
            ("asset_id", "BIGINT"),
            ("format", "VARCHAR"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
        ],
    ),
    doc="JPEG-bytes-in-a-binary-column metadata decode (closes the "
    "metadata half of the r7 JPEG gap): real baseline JPEGs are "
    "encoded JVM-side (javax.imageio), loaded as a BINARY COLUMN via "
    "the binaryFile source, and their dims parsed by the dependency-"
    "free SOF marker walk (operators.multimodal.jpeg_parse_meta) "
    "inside the same Arrow-batched mapInPandas kernel as the PNG "
    "tier. Golden oracle = the generator SPEC dims, so the "
    "encode→decode round trip is what's verified. Pixel decode stays "
    "Pillow-gated (decode_jpeg_pixels; import probe 2026-08-15: "
    "absent here).",
)
def mm_decode_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators.multimodal import write_jpeg_fixtures

    out_dir = tempfile.mkdtemp(prefix="mm-jpeg-")
    write_jpeg_fixtures(spark, out_dir, n=8)
    assets = (
        spark.read.format("binaryFile")
        .load(out_dir + "/*.jpg")
        .select(
            F.regexp_extract(F.col("path"), r"img-(\d+)\.jpg", 1)
            .cast("bigint")
            .alias("asset_id"),
            F.lit("image").alias("media_type"),
            F.col("content").alias("payload"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.col("path").alias("source_uri"),
        )
    )
    meta = decode_image_meta(assets)
    return meta.select("asset_id", "format", "width", "height")


def _mm_features_golden() -> list[tuple]:
    # micro-scaled ints: feature values are exact-6dp doubles, so
    # round(v*1e6) is integral in both engines (no float formatting)
    return [
        (
            asset_id,
            media,
            ",".join(str(round(v * 1e6)) for v in pseudo_feature(payload, 16)),
        )
        for asset_id, media, payload, _n, _u in synthetic_asset_rows(_MM_N_ASSETS)
    ]


@register(
    "mm_extract_features",
    _values_oracle(
        _mm_features_golden(),
        [
            ("asset_id", "BIGINT"),
            ("media_type", "VARCHAR"),
            ("feature_csv", "VARCHAR"),
        ],
    ),
    doc="Multimodal feature extraction: deterministic md5-seeded "
    "pseudo-embeddings with the schema/batch shape of a real extractor "
    "(see real_decode_backend for the swap-in point). The vector is "
    "emitted as a comma-joined string so both engines hash it "
    "identically — list cells are unhashable in pandas.",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = make_synthetic_assets(spark, _MM_N_ASSETS)
    feats = extract_features(assets, dims=16)
    return feats.select(
        "asset_id",
        "media_type",
        F.concat_ws(
            ",",
            F.transform(
                F.col("feature"),
                lambda v: F.round(v * F.lit(1e6)).cast("long").cast("string"),
            ),
        ).alias("feature_csv"),
    )


# =====================================================================
# Corpus hygiene / split utilities
# =====================================================================

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


@register(
    "text_pii_redaction",
    "SELECT doc_id, "
    f"regexp_replace(regexp_replace("
    f"concat(text, ' contact: user', CAST(doc_id AS VARCHAR), '@example.com or +1 (555) 010-', CAST(1000 + doc_id % 9000 AS VARCHAR)), "
    f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted "
    "FROM documents WHERE doc_id < 100",
    doc="PII redaction: email/phone regex scrubbing (synthetic PII "
    "appended so the patterns actually fire); pure regexp_replace, "
    "JVM-side.",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    with_pii = df.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    out = with_pii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )
    return out


@register(
    "split_train_holdout",
    "SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM ("
    "SELECT n_chars, CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 14 "
    "THEN 'train' ELSE 'holdout' END AS split FROM documents) GROUP BY split",
    doc="Deterministic hash-based train/holdout split (87.5/12.5 via "
    "first md5 nibble of the id) — reproducible across engines, runs, "
    "and cluster sizes; no RNG state.",
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1") < 14,
        F.lit("train"),
    ).otherwise(F.lit("holdout"))
    return (
        df.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "text_top_tokens",
    "SELECT token, n, rank FROM ("
    "SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank "
    "FROM (SELECT token, count(*) AS n FROM "
    "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
    "GROUP BY token)) WHERE rank <= 25",
    doc="Vocabulary statistics: global token frequencies via explode + "
    "count (map-side partial agg), deterministic top-25 via "
    "TakeOrderedAndProject — per-partition partial top-k, no "
    "single-partition global window at any scale.",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    freq = (
        df.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    # orderBy + limit plans as TakeOrderedAndProject (local top-25 per
    # partition, then a 25*P-row merge on the driver side) — unlike an
    # un-partitioned Window.orderBy, which funnels the whole vocabulary
    # through ONE task. Rank is then derived on the 25 surviving rows
    # with a broadcast self-join (25x25 nested loop, negligible).
    top = freq.orderBy(F.col("n").desc(), F.col("token").asc()).limit(25)
    a, b = top.alias("a"), top.alias("b")
    at_or_before = (F.col("b.n") > F.col("a.n")) | (
        (F.col("b.n") == F.col("a.n")) & (F.col("b.token") <= F.col("a.token"))
    )
    return (
        a.join(F.broadcast(b), at_or_before, "inner")
        .groupBy(F.col("a.token").alias("token"), F.col("a.n").alias("n"))
        .agg(F.count("*").cast("bigint").alias("rank"))
        .select("token", "n", "rank")
    )


@register(
    "salted_join_nation_volumes",
    "SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders, "
    "round(sum(o_totalprice), 2) AS volume "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name",
    doc="Skew-toolkit semantics proof: the customer->nation hop runs "
    "through salted_join (16-way deterministic key fan-out, dimension "
    "side exploded per salt) and must hash-match the plain-join "
    "oracle. round(2) not floor: the summands are 2dp-exact, so sums "
    "sit ON 2dp boundaries where floor flips on accumulation order. "
    "oracle — salting changes the physical shuffle layout, never the "
    "result.",
)
def salted_join_nation_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = salted_join(
        orders.join(customer, orders.o_custkey == customer.c_custkey),
        nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        on="c_nationkey",
        salt=16,
        big_salt_cols=["o_orderkey"],
    )
    return enriched.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("volume"),
    )


#: contamination: fraction of a doc's distinct shingles that appear in
#: the benchmark set (docs 0-9 stand in for an eval suite)
CONTAM_BENCH_MAX_ID = 10
CONTAM_MIN_OVERLAP = 0.2


def _contamination_overlap_from_shingles(sh: DataFrame) -> DataFrame:
    """Contamination overlap from a pre-tokenized ``(doc_id, sh)``
    shingle table — the decontamination consumer of a shared
    tokenization pass (VERDICT r8 item 4).  ``sh`` = array of distinct
    word shingles per doc.  The benchmark side (docs below
    ``CONTAM_BENCH_MAX_ID``) broadcasts; the corpus side is one
    explode + semi-join + groupBy, linear in corpus shingles."""
    bench = (
        sh.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    corpus_docs = sh.filter(F.col("doc_id") >= CONTAM_BENCH_MAX_ID)
    hits = (
        corpus_docs.select("doc_id", F.explode("sh").alias("shingle"))
        .join(F.broadcast(bench), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = corpus_docs.select(
        "doc_id", F.size("sh").cast("bigint").alias("n_total")
    )
    overlap = F.floor(F.col("n_hit").cast("double") / F.col("n_total") * 10000) / 10000
    return (
        totals.join(hits, "doc_id")
        .withColumn("overlap", overlap)
        .filter(F.col("overlap") >= CONTAM_MIN_OVERLAP)
        .select("doc_id", "n_hit", "n_total", "overlap")
    )


@register(
    "text_contamination_overlap",
    f"""
WITH bench AS (
  SELECT DISTINCT unnest({duck_distinct_shingles('text', SHINGLE_N)}) AS shingle
  FROM documents WHERE doc_id < {CONTAM_BENCH_MAX_ID}),
corpus AS (
  SELECT doc_id, unnest(sh) AS shingle FROM (
    SELECT doc_id, {duck_distinct_shingles('text', SHINGLE_N)} AS sh
    FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}) t),
totals AS (
  SELECT doc_id, CAST(len({duck_distinct_shingles('text', SHINGLE_N)}) AS BIGINT) AS n_total
  FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}),
hits AS (
  SELECT doc_id, count(*) AS n_hit FROM corpus
  WHERE shingle IN (SELECT shingle FROM bench) GROUP BY doc_id)
SELECT t.doc_id, h.n_hit, t.n_total,
  floor(h.n_hit::DOUBLE / t.n_total * 10000) / 10000 AS overlap
FROM totals t JOIN hits h ON t.doc_id = h.doc_id
WHERE floor(h.n_hit::DOUBLE / t.n_total * 10000) / 10000 >= {CONTAM_MIN_OVERLAP}
""",
    doc="Benchmark-contamination detection: per-doc fraction of "
    "distinct word shingles that appear in a (broadcast-small) "
    "benchmark shingle set — the LLM eval-leak check. Scale shape: "
    "the benchmark set broadcasts; the corpus side is one "
    "explode + semi-join + groupBy, linear in corpus shingles.",
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", distinct_shingles("text", SHINGLE_N).alias("sh")
    )
    return _contamination_overlap_from_shingles(sh)


@register(
    "text_intradoc_repetition",
    f"""
SELECT doc_id, n_total, n_distinct,
  floor((1 - n_distinct::DOUBLE / n_total) * 10000) / 10000 AS repetition
FROM (
  SELECT doc_id,
    CAST(len({duck_word_ngrams('text', SHINGLE_N)}) AS BIGINT) AS n_total,
    CAST(len({duck_distinct_shingles('text', SHINGLE_N)}) AS BIGINT) AS n_distinct
  FROM documents) t
WHERE n_total > 0
""",
    doc="Intra-document repetition score: 1 - distinct/total shingles "
    "(boilerplate and loop-generation detector) — pure per-row "
    "expressions, no shuffle at all.",
)
def text_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.size(word_ngrams("text", SHINGLE_N)).cast("bigint").alias("n_total"),
        F.size(distinct_shingles("text", SHINGLE_N)).cast("bigint").alias("n_distinct"),
    ).filter(F.col("n_total") > 0)
    rep = F.floor((1 - F.col("n_distinct").cast("double") / F.col("n_total")) * 10000) / 10000
    return out.withColumn("repetition", rep)


@register(
    "text_char_entropy",
    """
SELECT doc_id,
  floor(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(list_sort(list_distinct(chars)), c ->
      (CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars)) *
      log2(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars)))),
    (acc, v) -> acc + v) * 10000) / 10000 AS entropy
FROM (SELECT doc_id,
      list_transform(generate_series(1, length(text)), i -> substr(text, i, 1)) AS chars
      FROM documents WHERE length(text) > 0) t
""",
    doc="Per-document Shannon character entropy (gibberish / "
    "low-information detector): terms folded in sorted-char order so "
    "the double summation is order-deterministic in both engines.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = "transform(sequence(1, length(text)), i -> substr(text, i, 1))"
    entropy = (
        f"floor(-aggregate("
        f"transform(array_sort(array_distinct({chars})), c -> "
        f"(CAST(size(filter({chars}, x -> x = c)) AS DOUBLE) / size({chars})) * "
        f"log2(CAST(size(filter({chars}, x -> x = c)) AS DOUBLE) / size({chars}))), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) * 10000) / 10000"
    )
    return docs.filter(F.length("text") > 0).select(
        "doc_id", F.expr(entropy).alias("entropy")
    )


def _mm_frames_golden(every_nth: int = 2, max_frames: int = 4) -> list[tuple]:
    out = []
    for i in range(_MM_N_ASSETS):
        if i % 3 != 2:  # only video assets
            continue
        frames = synthetic_video_frames(i)
        for k, f in enumerate(range(0, len(frames), every_nth)):
            if k >= max_frames:
                break
            out.append((i, f, _hashlib.md5(frames[f]).hexdigest()))
    return out


@register(
    "mm_sample_frames",
    _values_oracle(
        _mm_frames_golden(),
        [
            ("asset_id", "BIGINT"),
            ("frame_idx", "INTEGER"),
            ("frame_md5", "VARCHAR"),
        ],
    ),
    doc="Video frame sampling: 1->N row fan-out through mapInPandas "
    "over the FRAM frame container; oracle = golden rows from the "
    "generator's frame spec.",
)
def mm_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import sample_frames

    assets = make_synthetic_assets(spark, _MM_N_ASSETS)
    return sample_frames(assets, every_nth=2, max_frames=4)


def _mm_audio_golden() -> list[tuple]:
    out = []
    for i in range(_MM_N_ASSETS):
        if i % 3 != 1:  # only audio assets
            continue
        n, rms, peak, zc = audio_feature_values(synthetic_audio_samples(i))
        out.append((i, n, rms, peak, zc))
    return out


@register(
    "mm_audio_features",
    _values_oracle(
        _mm_audio_golden(),
        [
            ("asset_id", "BIGINT"),
            ("n_samples", "INTEGER"),
            ("rms", "DOUBLE"),
            ("peak", "DOUBLE"),
            ("zero_crossings", "INTEGER"),
        ],
    ),
    doc="Audio featurization: real stdlib WAV decode -> numpy "
    "RMS/peak/zero-crossing per asset inside Arrow batches (librosa "
    "swap-in point for compressed codecs); oracle = the same pure "
    "feature function run on the generator's sample spec.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import audio_features

    assets = make_synthetic_assets(spark, _MM_N_ASSETS)
    return audio_features(assets)


def _mm_resize_golden(tw: int = 96, th: int = 96) -> list[tuple]:
    out = []
    for asset_id, media, payload, _n, _u in synthetic_asset_rows(_MM_N_ASSETS):
        if media != "image":
            continue
        resized = resize_image_bytes(payload, tw, th)
        out.append((asset_id, tw, th, _hashlib.md5(resized).hexdigest()))
    return out


@register(
    "mm_resize_images",
    _values_oracle(
        _mm_resize_golden(),
        [
            ("asset_id", "BIGINT"),
            ("width", "INTEGER"),
            ("height", "INTEGER"),
            ("payload_md5", "VARCHAR"),
        ],
    ),
    doc="Real image resize: PNG decode -> nearest-neighbor resample -> "
    "PNG re-encode, binary-in/binary-out through mapInPandas; oracle = "
    "md5 of the same pure resize kernel run driver-side (local-vs-"
    "distributed differential; binary column itself is not hashable).",
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import resize_images

    assets = make_synthetic_assets(spark, _MM_N_ASSETS)
    resized = resize_images(assets, 96, 96)
    return resized.select(
        "asset_id", "width", "height", F.md5(F.col("payload")).alias("payload_md5")
    )


_ROLLING_MOD = 2147483647


@register(
    "text_rolling_hash",
    "SELECT doc_id, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), "
    f"(acc, c) -> (acc * 31 + c) % {_ROLLING_MOD}) AS rhash "
    "FROM documents WHERE doc_id < 200",
    doc="Polynomial rolling hash (base 31 mod 2^31-1) over document "
    "characters — a pure sequential fold, identical in both engines.",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return df.select(
        "doc_id",
        F.expr(
            "aggregate(transform(sequence(1, length(text)), "
            "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {_ROLLING_MOD})"
        ).alias("rhash"),
    )


@register(
    "dq_checks_orders",
    "SELECT 'allowed' AS check, 'o_orderstatus' AS column, "
    "CAST(sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_violations, "
    "sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) = 0 AS passed FROM orders "
    "UNION ALL SELECT 'not_null', 'o_custkey', "
    "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
    "sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 FROM orders "
    "UNION ALL SELECT 'not_null', 'o_orderdate', "
    "CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
    "sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0 FROM orders "
    "UNION ALL SELECT 'range', 'o_totalprice', "
    "CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0 OR o_totalprice > 1000000) THEN 1 ELSE 0 END) AS BIGINT), "
    "sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0 OR o_totalprice > 1000000) THEN 1 ELSE 0 END) = 0 FROM orders "
    "UNION ALL SELECT 'unique', 'o_orderkey', "
    "CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT), "
    "count(*) = count(DISTINCT o_orderkey) FROM orders "
    "ORDER BY 1, 2",
    doc="Declarative data-quality checks (not-null / range / allowed "
    "vocabulary / unique key) evaluated in one aggregation pass.",
)
def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quality import CheckSpec, run_checks

    df = load_table(spark, sf_dir, "orders")
    spec = CheckSpec(
        not_null=["o_custkey", "o_orderdate"],
        unique=["o_orderkey"],
        ranges={"o_totalprice": (0, 1_000_000)},
        allowed={"o_orderstatus": ["F", "O", "P"]},
    )
    return run_checks(df, spec)


# =====================================================================
# Flagship composition: training-corpus curation
# =====================================================================



def _duck_curate_sql() -> str:
    rows = MINHASH_HASHES // MINHASH_BANDS
    sig = duck_minhash_signature("text", MINHASH_HASHES, SHINGLE_N)
    sh = duck_distinct_shingles("text", SHINGLE_N)
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
WITH sigs AS (SELECT doc_id, {sig} AS sig FROM documents),
banded AS (
  SELECT doc_id, b.band,
    md5(array_to_string(sig[b.band * {rows} + 1 : b.band * {rows} + {rows}], '|')) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band) b),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
docs AS (SELECT doc_id, {sh} AS sh FROM documents),
losers AS (
  SELECT DISTINCT id_b AS doc_id FROM cand
  JOIN docs da ON da.doc_id = id_a
  JOIN docs db ON db.doc_id = id_b
  WHERE floor(len(list_intersect(da.sh, db.sh))::DOUBLE /
        (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) * 10000) / 10000
        >= {JACCARD_THRESHOLD})
SELECT d.doc_id,
  CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) < 14
       THEN 'train' ELSE 'holdout' END AS split,
  {quality} AS quality_score,
  d.lang, d.source
FROM documents d
ANTI JOIN losers l ON d.doc_id = l.doc_id
WHERE {quality} >= {QUALITY_MIN}
"""


def _duck_contam_ids_sql() -> str:
    """Contaminated doc_id list (overlap >= threshold vs the benchmark
    shingle set) — the anti-join side shared by the clean-corpus and
    CCNet-pipeline oracles."""
    return f"""
  SELECT t.doc_id FROM (
    SELECT doc_id, CAST(len({duck_distinct_shingles('text', SHINGLE_N)}) AS BIGINT) AS n_total
    FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}) t
  JOIN (
    SELECT doc_id, count(*) AS n_hit FROM (
      SELECT doc_id, unnest(sh) AS shingle FROM (
        SELECT doc_id, {duck_distinct_shingles('text', SHINGLE_N)} AS sh
        FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}) x) corpus
    WHERE shingle IN (
      SELECT DISTINCT unnest({duck_distinct_shingles('text', SHINGLE_N)})
      FROM documents WHERE doc_id < {CONTAM_BENCH_MAX_ID})
    GROUP BY doc_id) h ON t.doc_id = h.doc_id
  WHERE floor(h.n_hit::DOUBLE / t.n_total * 10000) / 10000 >= {CONTAM_MIN_OVERLAP}
"""


def _duck_ccnet_sql() -> str:
    """CCNet-pipeline oracle: minhash losers + perplexity buckets +
    contamination list, composed around the documents table."""

    return f"""
WITH {_duck_minhash_pair_ctes()},
losers AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
ppl AS ({bigram_ppl_duck_sql()}),
contam AS ({_duck_contam_ids_sql()})
SELECT d.doc_id,
  CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) < 14
       THEN 'train' ELSE 'holdout' END AS split,
  d.lang, d.source, p.ppl, p.ccnet_bucket
FROM documents d
JOIN ppl p ON d.doc_id = p.doc_id
ANTI JOIN losers l ON d.doc_id = l.doc_id
ANTI JOIN contam c ON d.doc_id = c.doc_id
WHERE p.ccnet_bucket <> 'tail'
"""


@register(
    "curate_ccnet_corpus",
    _duck_ccnet_sql(),
    doc="The CCNet pipeline composed end-to-end (Wenzek et al. 2020): "
    "MinHash-LSH near-dup removal (keep-lowest-id) -> bigram-LM "
    "perplexity bucketing keeping head+middle (dropping the "
    "worst-perplexity tercile, CCNet's quality gate) -> benchmark "
    "decontamination (anti-join on the broadcast contaminated-id "
    "list) -> deterministic md5 train/holdout split. Every stage is "
    "an already-proven catalog operator; the composition is the "
    "production shape — one pass per signal, all joins keyed on "
    "doc_id.",
)
def curate_ccnet_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import drop_near_duplicates, minhash_feature_table
    from .query_catalog_analytics import bigram_perplexity_df

    docs = load_table(spark, sf_dir, "documents")
    # One tokenize, three consumers (VERDICT r8 item 4): the persisted
    # (doc_id, sh, sig) feature table feeds MinHash banding, LSH pair
    # verification, AND benchmark decontamination.  The shingle
    # explode/md5 work is the pipeline's dominant cost; sharing the
    # persisted table pays it exactly once instead of once per stage.
    feat = minhash_feature_table(
        docs, "doc_id", "text", MINHASH_HASHES, SHINGLE_N
    )
    kept = drop_near_duplicates(
        docs, "doc_id", "text",
        num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        feat=feat,
    )
    # Overlap independent jobs (guide §2.6, r12): the perplexity
    # pipeline's eager exact-ntile checkpoint and the minhash
    # feature-table materialization do not depend on each other, so
    # force the (already-persisted) feature table on a background
    # thread while the main thread runs the perplexity build — each
    # job's tail backfills the other's idle executors.  Plan and
    # results are identical: the thread only forces the persist that
    # the dedup join would otherwise force later, serially.  §2.6's
    # own caveat applies — overlap fills IDLE capacity; when both
    # phases already saturate the cluster it only adds contention —
    # so the flag records the measured decision (OPTIMIZATION_r12.md).
    if CCNET_OVERLAP_FEAT:
        import threading

        _bg_err: list[BaseException] = []

        def _materialize_feat() -> None:
            try:
                feat.count()
            except BaseException as e:  # surfaced after join
                _bg_err.append(e)

        _th = threading.Thread(target=_materialize_feat, daemon=True)
        _th.start()
        try:
            ppl = bigram_perplexity_df(spark, sf_dir).select(
                "doc_id", "ppl", "ccnet_bucket"
            )
        finally:
            _th.join()
        if _bg_err:
            raise _bg_err[0]
    else:
        ppl = bigram_perplexity_df(spark, sf_dir).select(
            "doc_id", "ppl", "ccnet_bucket"
        )
    contaminated = _contamination_overlap_from_shingles(
        feat.select("doc_id", "sh")
    ).select("doc_id")
    split = F.when(
        F.expr(
            "instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1"
        )
        < 14,
        F.lit("train"),
    ).otherwise(F.lit("holdout"))
    return (
        kept.join(ppl, "doc_id")
        .filter(F.col("ccnet_bucket") != "tail")
        .join(contaminated, "doc_id", "left_anti")
        .select(
            "doc_id", split.alias("split"), "lang", "source",
            "ppl", "ccnet_bucket",
        )
    )


def _duck_curate_clean_sql() -> str:
    """Full-pipeline oracle: curation result anti-joined against the
    benchmark-contamination list (nested WITHs are scoped per subquery)."""
    return f"""
SELECT c.* FROM ({_duck_curate_sql()}) c
ANTI JOIN (
  SELECT t.doc_id FROM (
    SELECT doc_id, CAST(len({duck_distinct_shingles('text', SHINGLE_N)}) AS BIGINT) AS n_total
    FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}) t
  JOIN (
    SELECT doc_id, count(*) AS n_hit FROM (
      SELECT doc_id, unnest(sh) AS shingle FROM (
        SELECT doc_id, {duck_distinct_shingles('text', SHINGLE_N)} AS sh
        FROM documents WHERE doc_id >= {CONTAM_BENCH_MAX_ID}) x) corpus
    WHERE shingle IN (
      SELECT DISTINCT unnest({duck_distinct_shingles('text', SHINGLE_N)})
      FROM documents WHERE doc_id < {CONTAM_BENCH_MAX_ID})
    GROUP BY doc_id) h ON t.doc_id = h.doc_id
  WHERE floor(h.n_hit::DOUBLE / t.n_total * 10000) / 10000 >= {CONTAM_MIN_OVERLAP}
) ct ON c.doc_id = ct.doc_id
"""


@register(
    "curate_clean_corpus",
    _duck_curate_clean_sql(),
    doc="The complete training-data pipeline in one plan: near-dup "
    "removal -> quality filter -> benchmark decontamination (anti-join "
    "on the broadcast-small contaminated-doc list) -> deterministic "
    "hash split.",
)
def curate_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = curate_training_corpus(spark, sf_dir)
    contaminated = text_contamination_overlap(spark, sf_dir).select("doc_id")
    return base.join(contaminated, "doc_id", "left_anti")


@register(
    "curate_training_corpus",
    _duck_curate_sql(),
    doc="End-to-end corpus curation: MinHash-LSH near-dup removal "
    "(keep-lowest-id) -> quality-score filter -> deterministic "
    "hash split.  The flagship composition of the M4 operators; every "
    "stage is the same shuffled/broadcast plan shape it would be at "
    "100 TB.",
)
def curate_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import drop_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    kept = drop_near_duplicates(
        docs, "doc_id", "text",
        num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
    )
    feats = quality_features("text")
    split = F.when(
        F.expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1") < 14,
        F.lit("train"),
    ).otherwise(F.lit("holdout"))
    return (
        kept.select(
            "doc_id",
            split.alias("split"),
            feats["quality_score"].alias("quality_score"),
            "lang",
            "source",
        )
        .filter(F.col("quality_score") >= QUALITY_MIN)
    )


# =====================================================================
# IVF similarity search (coarse quantizer + inverted lists)
# =====================================================================

IVF_NPROBE = 2


def _duck_ivf_sql() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos_cent = _duck_cos("embedding", "centroid")
    cos_full = _duck_cos("qvec", "embedding")
    return f"""
WITH ex AS (
  SELECT label, unnest(generate_series(1, len(embedding))) AS pos,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings),
cent AS (
  SELECT label AS list_label, list(c ORDER BY pos) AS centroid
  FROM (SELECT label, pos, round(avg(v), 6) AS c FROM ex GROUP BY label, pos)
  GROUP BY label),
assigned AS (
  SELECT vec_id, embedding, list_label,
    row_number() OVER (PARTITION BY vec_id ORDER BY {cos_cent} DESC, list_label) AS rn
  FROM embeddings CROSS JOIN cent),
lists AS (SELECT vec_id, embedding, list_label FROM assigned WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, embedding AS qvec, list_label
  FROM assigned WHERE vec_id IN ({ids}) AND rn <= {IVF_NPROBE}),
scored AS (
  SELECT p.query_id, l.vec_id, p.qvec, l.embedding
  FROM lists l JOIN probes p ON l.list_label = p.list_label
  WHERE l.vec_id <> p.query_id)
SELECT query_id, vec_id, round({cos_full}, 6) AS cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY {cos_full} DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_ivf_topk",
    _duck_ivf_sql(),
    doc="IVF approximate top-k: label-space coarse quantizer (rounded "
    f"centroids), nearest-centroid inverted lists, {IVF_NPROBE}-probe "
    "search — the classic ANN index structure on pure DataFrame ops.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk

    df = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        df, "vec_id", "embedding", "label",
        query_ids=ANN_QUERY_IDS, k=ANN_K, nprobe=IVF_NPROBE,
    )


KMEANS_K = 8
KMEANS_ITERS = 3


def _duck_kmeans_ctes(
    k: int | str, iters: int, source: str = "embeddings"
) -> tuple[list[str], str]:
    """The deterministic Lloyd's k-means UNROLLED into chained CTEs
    (fixed iteration count makes the loop a straight-line query),
    mirroring ``kmeans_centroids`` decision for decision: md5-seeded
    init, cosine assignment with lowest-cid tiebreak, per-dim mean
    rounded to 6 dp, empty clusters keep the previous centroid.
    Returns (ctes, name-of-final-centroid-CTE); shared by the IVF and
    SemDeDup oracles.  ``k`` may be an int or a parenthesized scalar
    subquery (corpus-adaptive cluster count); ``source`` is the train
    corpus (a sample CTE for sampled training)."""
    cos_cent = _duck_cos("embedding", "centroid")
    ctes = [
        f"""cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INTEGER) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT vec_id, embedding FROM {source}
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}))"""
    ]
    for t in range(1, iters + 1):
        prev = f"cent{t - 1}"
        ctes.append(
            f"""asg{t} AS (
  SELECT vec_id, embedding, cid
  FROM (SELECT e.vec_id, e.embedding, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_cent} DESC, c.cid) AS rn
        FROM {source} e CROSS JOIN {prev} c)
  WHERE rn = 1),
newc{t} AS (
  SELECT cid, list(c ORDER BY pos) AS centroid
  FROM (SELECT cid, pos, round(avg(v), 6) AS c
        FROM (SELECT cid, unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
              FROM asg{t})
        GROUP BY cid, pos)
  GROUP BY cid),
cent{t} AS (
  SELECT p.cid, COALESCE(n.centroid, p.centroid) AS centroid
  FROM {prev} p LEFT JOIN newc{t} n USING (cid))"""
        )
    return ctes, f"cent{iters}"


def _duck_kmeans_ivf_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """The trained-codebook IVF oracle: the shared k-means CTE chain,
    then the same probe/search as ``_duck_ivf_sql``."""
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos_cent = _duck_cos("embedding", "centroid")
    cos_full = _duck_cos("qvec", "embedding")
    ctes, final = _duck_kmeans_ctes(k, iters)
    ctes.append(
        f"""assigned AS (
  SELECT vec_id, embedding, cid AS list_label,
    row_number() OVER (PARTITION BY vec_id ORDER BY {cos_cent} DESC, cid) AS rn
  FROM embeddings CROSS JOIN {final}),
lists AS (SELECT vec_id, embedding, list_label FROM assigned WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, embedding AS qvec, list_label
  FROM assigned WHERE vec_id IN ({ids}) AND rn <= {IVF_NPROBE}),
scored AS (
  SELECT p.query_id, l.vec_id, p.qvec, l.embedding
  FROM lists l JOIN probes p ON l.list_label = p.list_label
  WHERE l.vec_id <> p.query_id)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT query_id, vec_id, round({cos_full}, 6) AS cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY {cos_full} DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_ivf_kmeans_topk",
    _duck_kmeans_ivf_sql(),
    doc="IVF top-k over a TRAINED coarse quantizer: deterministic "
    f"Lloyd's k-means (k={KMEANS_K}, {KMEANS_ITERS} fixed iterations, "
    "md5-seeded init, 6-dp centroid rounding per round) builds the "
    "codebook, then the same inverted-list probe/search as "
    "ann_ivf_topk. Train-once/assign-many: the codebook frame is "
    "computed once and broadcast. Oracle = the identical k-means "
    "unrolled into chained DuckDB CTEs.",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk, kmeans_centroids

    df = load_table(spark, sf_dir, "embeddings")
    codebook = kmeans_centroids(
        df, "vec_id", "embedding", k=KMEANS_K, iters=KMEANS_ITERS
    )
    return ivf_topk(
        df, "vec_id", "embedding",
        query_ids=ANN_QUERY_IDS, k=ANN_K, nprobe=IVF_NPROBE,
        codebook=codebook,
    )


# =====================================================================
# IVF-PQ with asymmetric distance computation (faiss IndexIVFPQ shape)
# =====================================================================


def _duck_ivfpq_sql() -> str:
    """IVF-PQ ADC oracle: the per-label centroid CTEs from
    ``_duck_ivf_sql``, residual PQ encoding with the literal
    ``pq_codebook`` (first-min tiebreak — the parity scheme proven by
    ``embedding_pq_codes``), then per-candidate ADC = Σ_s
    ||qres_s − book[s][code_s]||² with every fold in the same element
    order as the Spark ``aggregate`` chain."""
    from .functions.pq import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_codebook,
    )

    cb = pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM)
    lits = [
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in row) + "]" for row in cb[s]
        )
        + "]::DOUBLE[][]"
        for s in range(PQ_SUBSPACES)
    ]
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos_cent = _duck_cos("embedding", "centroid")
    res = (
        "list_transform(generate_series(1, len(embedding)), "
        "i -> CAST(embedding[i] AS DOUBLE) - centroid[i])"
    )
    d_exprs = ", ".join(
        f"list_transform({lits[s]}, cent -> list_reduce("
        f"list_transform(generate_series(1, {PQ_SUBDIM}), "
        f"i -> (res[{s * PQ_SUBDIM} + i] - cent[i]) * "
        f"(res[{s * PQ_SUBDIM} + i] - cent[i])), "
        f"(acc, v) -> acc + v)) AS d{s}"
        for s in range(PQ_SUBSPACES)
    )
    code_exprs = ", ".join(
        f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) AS INT) "
        f"AS code{s}"
        for s in range(PQ_SUBSPACES)
    )
    sel_cents = ", ".join(
        f"({lits[s]})[l.code{s}] AS c{s}" for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(
        f"list_reduce(list_transform(generate_series(1, {PQ_SUBDIM}), "
        f"i -> (qres[{s * PQ_SUBDIM} + i] - c{s}[i]) * "
        f"(qres[{s * PQ_SUBDIM} + i] - c{s}[i])), (acc, v) -> acc + v)"
        for s in range(PQ_SUBSPACES)
    )
    return f"""
WITH ex AS (
  SELECT label, unnest(generate_series(1, len(embedding))) AS pos,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings),
cent AS (
  SELECT label AS list_label, list(c ORDER BY pos) AS centroid
  FROM (SELECT label, pos, round(avg(v), 6) AS c FROM ex GROUP BY label, pos)
  GROUP BY label),
assigned AS (
  SELECT vec_id, embedding, list_label, centroid,
    row_number() OVER (PARTITION BY vec_id ORDER BY {cos_cent} DESC, list_label) AS rn
  FROM embeddings CROSS JOIN cent),
listsr AS (
  SELECT vec_id, list_label, {res} AS res
  FROM assigned WHERE rn = 1),
listsd AS (SELECT vec_id, list_label, {d_exprs} FROM listsr),
lists AS (SELECT vec_id, list_label, {code_exprs} FROM listsd),
probes AS (
  SELECT vec_id AS query_id, list_label, {res} AS qres
  FROM assigned WHERE vec_id IN ({ids}) AND rn <= {IVF_NPROBE}),
scored0 AS (
  SELECT p.query_id, l.vec_id, p.qres, {sel_cents}
  FROM lists l JOIN probes p ON l.list_label = p.list_label
  WHERE l.vec_id <> p.query_id),
scored AS (SELECT query_id, vec_id, ({adc}) AS adc FROM scored0)
SELECT query_id, vec_id, floor(adc * 1000000) / 1000000 AS adc_dist,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_ivf_pq_adc_topk",
    _duck_ivfpq_sql(),
    doc="IVF-PQ with asymmetric distance computation — the faiss "
    "IndexIVFPQ memory hierarchy on DataFrame ops: coarse-quantize to "
    "label-centroid inverted lists, PQ-encode the RESIDUAL x−centroid "
    "(8 subspaces × 16 md5-literal centroids → 8 4-bit codes per "
    "vector, 64× smaller than float32), probe 2 lists per query, "
    "score candidates via a per-probe ADC lookup table (subspaces × "
    "centroids squared distances computed once per probe; each "
    "candidate costs 8 element_at lookups, zero vector math). The "
    "billion-vector search layout: codes stream through a broadcast "
    "hash join on list_label touching only probed lists. Oracle "
    "reproduces centroids (6-dp rounded means), codes (first-min "
    "tiebreak) and in-order double folds bit-for-bit.",
)
def ann_ivf_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_pq_adc_topk
    from .functions.pq import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_codebook,
    )

    df = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_adc_topk(
        df,
        pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM),
        "vec_id",
        "embedding",
        "label",
        query_ids=ANN_QUERY_IDS,
        k=ANN_K,
        nprobe=IVF_NPROBE,
    )


@register(
    "ann_ivf_pq_persisted_topk",
    _duck_ivfpq_sql(),
    doc="IVF-PQ search over a PERSISTED index: build_ivfpq_index "
    "writes the (codebook, lists) halves to parquet once, the search "
    "reads them back and never touches the raw float corpus except "
    "for the 3 query vectors — the train-once/search-many shape a "
    "100 TB deployment actually runs (the lists table is ~subspaces "
    "bytes/vector, 64x smaller than the embeddings). Same oracle as "
    "ann_ivf_pq_adc_topk: the parquet round trip must be "
    "bit-lossless for this entry to stay green.",
)
def ann_ivf_pq_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _sh

    from .functions.pq import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_codebook,
    )
    from .operators.similarity import build_ivfpq_index, ivf_pq_adc_topk

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_ivfpq_{tag}"
    _sh.rmtree(base, ignore_errors=True)
    book = pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM)
    df = load_table(spark, sf_dir, "embeddings")
    codebook, lists = build_ivfpq_index(df, book)
    codebook.write.parquet(f"{base}/codebook")
    lists.write.parquet(f"{base}/lists")
    persisted = (
        spark.read.parquet(f"{base}/codebook"),
        spark.read.parquet(f"{base}/lists"),
    )
    return ivf_pq_adc_topk(
        df, book, "vec_id", "embedding", "label",
        query_ids=ANN_QUERY_IDS, k=ANN_K, nprobe=IVF_NPROBE,
        index=persisted,
    )


# =====================================================================
# Matryoshka two-stage retrieval (prefix-dims coarse pass + re-rank)
# =====================================================================

MRL_PREFIX_DIMS = 16
MRL_SHORTLIST = 25


def _duck_matryoshka_sql() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos_pre = _duck_cos("q.qpre", f"(c.embedding[1:{MRL_PREFIX_DIMS}])")
    cos_full = _duck_cos("qvec", "embedding")
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec,
         embedding[1:{MRL_PREFIX_DIMS}] AS qpre
  FROM embeddings WHERE vec_id IN ({ids})),
coarse AS (
  SELECT q.query_id, c.vec_id, q.qvec, c.embedding,
    row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {cos_pre} DESC, c.vec_id) AS sr
  FROM embeddings c, q WHERE c.vec_id <> q.query_id),
short AS (SELECT query_id, vec_id, qvec, embedding FROM coarse
          WHERE sr <= {MRL_SHORTLIST})
SELECT query_id, vec_id, round({cos_full}, 6) AS cos_sim,
  CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY {cos_full} DESC, vec_id) AS BIGINT) AS rank
FROM short
QUALIFY rank <= {ANN_K}
"""


@register(
    "ann_matryoshka_rerank_topk",
    _duck_matryoshka_sql(),
    doc="Two-stage Matryoshka retrieval (Kusupati et al. 2022): the "
    f"corpus scan scores only the first {MRL_PREFIX_DIMS} of 64 "
    "embedding components (MRL-trained embeddings front-load "
    f"information), keeps a {MRL_SHORTLIST}-candidate shortlist per "
    "query, then re-ranks the shortlist with full-dimension exact "
    "cosine. The coarse pass folds 1/4 of the arithmetic (and with "
    "the prefix stored as its own column, 1/4 of the I/O); the exact "
    "pass touches queries x shortlist rows only. Both passes use the "
    "two-phase top-k plan; the final ranking is true cosine, so the "
    "only approximation is shortlist recall.",
)
def ann_matryoshka_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import matryoshka_rerank_topk

    df = load_table(spark, sf_dir, "embeddings")
    return matryoshka_rerank_topk(
        df, "vec_id", "embedding",
        query_ids=ANN_QUERY_IDS, k=ANN_K,
        prefix_dims=MRL_PREFIX_DIMS, shortlist=MRL_SHORTLIST,
    )


# =====================================================================
# Hard-negative mining (contrastive training pairs)
# =====================================================================

HARDNEG_K_POS = 1
HARDNEG_K_NEG = 5


def _duck_hardneg_sql() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = _duck_cos("qvec", "embedding")
    return f"""
WITH a AS (
  SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
  FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT a.query_id, c.vec_id, c.label, a.qvec, c.embedding,
    CASE WHEN c.label = a.qlabel THEN 'pos' ELSE 'neg' END AS role,
    CASE WHEN c.label = a.qlabel THEN {HARDNEG_K_POS}
         ELSE {HARDNEG_K_NEG} END AS cap,
    {cos} AS cos_full
  FROM embeddings c, a WHERE c.vec_id <> a.query_id),
ranked AS (
  SELECT query_id, vec_id, label, role, cap, cos_full,
    row_number() OVER (PARTITION BY query_id, role
                       ORDER BY cos_full DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, label, role, round(cos_full, 6) AS cos_sim,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= cap
"""


@register(
    "mine_hard_negatives",
    _duck_hardneg_sql(),
    doc="Contrastive-pair mining for embedding-model training: per "
    f"anchor, the {HARDNEG_K_POS} nearest same-label vector "
    f"(positive) and the {HARDNEG_K_NEG} nearest different-label "
    "vectors (hard negatives — the closest wrong-class items a "
    "contrastive loss learns most from; ANCE-style offline mining). "
    "One broadcast-anchor corpus scan, then the two-phase top-k with "
    "role extending the ranking key. A production mining loop between "
    "epochs would swap the exact scan for the IVF probe path.",
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import hard_negative_mining

    df = load_table(spark, sf_dir, "embeddings")
    return hard_negative_mining(
        df, "vec_id", "embedding", "label",
        query_ids=ANN_QUERY_IDS, k_pos=HARDNEG_K_POS, k_neg=HARDNEG_K_NEG,
    )


# =====================================================================
# ANN recall measurement (approximate path vs exact ground truth)
# =====================================================================


def _duck_recall_sql() -> str:
    """Recall@k oracle: the brute-force and IVF oracles as subqueries,
    set-intersected per query."""
    return f"""
WITH exact AS (SELECT query_id, vec_id FROM ({_duck_ann_sql(bucketed=False)})),
approx AS (SELECT query_id, vec_id FROM ({_duck_ivf_sql()})),
perq AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id)
SELECT p.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
  floor(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / p.n_exact * 10000) / 10000
    AS recall_at_k
FROM perq p LEFT JOIN hits h ON p.query_id = h.query_id
ORDER BY p.query_id
"""


def _duck_recall_pq_sql() -> str:
    """Recall@k of the IVF-PQ ADC path vs exact ground truth — the
    quantization-loss readout (ADC approximates DISTANCES, not just
    candidate sets, so its recall differs from the probe-only IVF's)."""
    return f"""
WITH exact AS (SELECT query_id, vec_id FROM ({_duck_ann_sql(bucketed=False)})),
approx AS (SELECT query_id, vec_id FROM ({_duck_ivfpq_sql()})),
perq AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id)
SELECT p.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
  floor(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / p.n_exact * 10000) / 10000
    AS recall_at_k
FROM perq p LEFT JOIN hits h ON p.query_id = h.query_id
ORDER BY p.query_id
"""


@register(
    "ann_recall_pq_eval",
    _duck_recall_pq_sql(),
    doc="Recall@k of the IVF-PQ ADC path against the exact brute-force "
    "top-k — the quantization-loss readout that complements "
    "ann_recall_eval (probing loses candidates; PQ additionally "
    "distorts DISTANCES, so re-ranked order inside probed lists can "
    "differ too). Together the two entries decompose where an IVF-PQ "
    "deployment loses accuracy: nprobe coverage vs code distortion — "
    "the faiss tuning workflow as catalog queries.",
)
def ann_recall_pq_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.pq import (
        PQ_CENTROIDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        pq_codebook,
    )
    from .operators.similarity import brute_force_topk, ivf_pq_adc_topk

    df = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(
        df, "vec_id", "embedding", query_ids=ANN_QUERY_IDS, k=ANN_K
    ).select("query_id", "vec_id")
    approx = ivf_pq_adc_topk(
        df,
        pq_codebook(PQ_SUBSPACES, PQ_CENTROIDS, PQ_SUBDIM),
        "vec_id",
        "embedding",
        "label",
        query_ids=ANN_QUERY_IDS,
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).select("query_id", "vec_id")
    per_q = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hit_q = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        per_q.join(hit_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.floor(
                    F.coalesce("n_hits", F.lit(0)).cast("double")
                    / F.col("n_exact")
                    * 1e4
                )
                / 1e4
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


@register(
    "ann_recall_eval",
    _duck_recall_sql(),
    doc="ANN quality measurement: recall@k of the IVF probe path "
    "against the exact brute-force cosine top-k — the metric every "
    "approximate index must report before replacing an exact scan "
    "('measure, don't guess' applied to the index itself; faiss "
    "benchmarks report exactly this). Per-query hit count and "
    "floor-scaled recall via a set intersection of the two result "
    "id-sets (both rankings bit-identical across engines, so the "
    "intersection is too). Scale shape: both sides are the already-"
    "linear topk plans; the intersection joins two (queries x k)-row "
    "frames — negligible at any corpus size.",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import brute_force_topk, ivf_topk

    df = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(
        df, "vec_id", "embedding", query_ids=ANN_QUERY_IDS, k=ANN_K
    ).select("query_id", "vec_id")
    approx = ivf_topk(
        df, "vec_id", "embedding", "label",
        query_ids=ANN_QUERY_IDS, k=ANN_K, nprobe=IVF_NPROBE,
    ).select("query_id", "vec_id")
    per_q = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hit_q = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        per_q.join(hit_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.floor(
                    F.coalesce("n_hits", F.lit(0)).cast("double")
                    / F.col("n_exact")
                    * 1e4
                )
                / 1e4
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


#: low enough that the keep-decision path is exercised at the driver
#: SFs (max true pair cosine is ~0.48 at sf0.001 / ~0.51 at sf0.01 on
#: the current corpus); production corpora would run ~0.95+
SEMDEDUP_TAU = 0.35
#: FIXED target cluster width (VERDICT r7 item 1): the within-cluster
#: pairwise pass costs N x width, so a bounded width makes it LINEAR
#: in the corpus — the paper's own regime (it fixes k/N). The r7
#: policy k = sqrt(N/8) let width grow as sqrt(8N) (pair pass ~N^1.5,
#: measured 11.4x for 10x data at sf10); the cluster COUNT now grows
#: as k = N/128 instead, and the new quadratic-in-waiting — single-
#: level assignment scoring all k centroids per vector — is killed by
#: a two-level quantizer: k1 = ceil(sqrt(k)) coarse cells x
#: k2 = ceil(k/k1) sub-centroids, every stage O(N * (k1 + k2)).
SEMDEDUP_TARGET_CLUSTER = 128
#: codebook train-sample cap (the paper trains its quantizer on a
#: subset too): full corpus at the driver SFs (N <= 25600 there, so
#: parity is over the exact same computation), clipped at scale where
#: the train cross-joins would otherwise dominate
SEMDEDUP_TRAIN_SAMPLE = 25600
#: (k, k1, k2) as DuckDB scalar expressions — MUST mirror
#: ``_semdedup_split`` arithmetic exactly (128.0 divisor is a power of
#: two, so N/128.0 is exact in binary FP; sqrt/ceil both double)
SEMDEDUP_PK_CTE = """pk AS (
  SELECT k, k1, CAST(ceil(CAST(k AS DOUBLE) / k1) AS BIGINT) AS k2
  FROM (SELECT k, CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) AS k1
        FROM (SELECT greatest(8, CAST(ceil(count(*) / 128.0) AS BIGINT)) AS k
              FROM embeddings)))"""


def _semdedup_split(n: int) -> tuple[int, int]:
    """(k1, k2) for corpus size ``n``: cluster count k = max(8,
    ceil(n / SEMDEDUP_TARGET_CLUSTER)) split into k1 = ceil(sqrt(k))
    coarse cells of k2 = ceil(k/k1) sub-centroids.  Bit-parity with
    ``SEMDEDUP_PK_CTE``."""
    import math

    k = max(8, math.ceil(n / float(SEMDEDUP_TARGET_CLUSTER)))
    k1 = int(math.ceil(math.sqrt(float(k))))
    k2 = int(math.ceil(k / k1))
    return k1, k2


#: vec_id analog of _DUCK_DOC_BUCKET (hash_bucket_256 on the id)
_DUCK_VEC_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1))"
)


def _duck_semdedup_sql(
    iters: int = KMEANS_ITERS,
    tau: float = SEMDEDUP_TAU,
    train_where: str | None = None,
    incremental: bool = False,
) -> str:
    """Two-level SemDeDup oracle mirroring
    ``operators.similarity.semantic_dedup_two_level`` decision for
    decision: md5-sampled train corpus; coarse Lloyd's chain (k1 from
    ``pk``); sample pinned to coarse cells; per-cell fine Lloyd's
    (k2 md5-ordered seeds per cell, coarse-centroid fallback for
    member-less cells, grouped 6-dp-rounded mean updates); full-corpus
    coarse-then-fine argmax (cid = ccid*k2 + scid); keep-the-outlier
    on 6-dp-rounded pair cosines."""
    cos_cent = _duck_cos("embedding", "centroid")
    cos_se = _duck_cos("s.embedding", "c.centroid")
    cos_pair = _duck_cos("a.embedding", "b.embedding")
    ctes, coarse = _duck_kmeans_ctes(
        "(SELECT k1 FROM pk)", iters, source="samp"
    )
    where = f"WHERE {train_where}\n  " if train_where else ""
    ctes.insert(
        0,
        f"""samp AS (
  SELECT vec_id, embedding FROM embeddings
  {where}ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {SEMDEDUP_TRAIN_SAMPLE})""",
    )
    ctes.insert(1, SEMDEDUP_PK_CTE)
    # sample -> coarse cell (pinned for the whole fine train), then the
    # per-cell fine Lloyd's chain: same unrolled shape as the coarse
    # chain with (ccid, scid) as the compound key
    ctes.append(
        f"""sasg AS (
  SELECT vec_id, embedding, ccid
  FROM (SELECT s.vec_id, s.embedding, c.cid AS ccid,
          row_number() OVER (PARTITION BY s.vec_id ORDER BY {cos_se} DESC, c.cid) AS rn
        FROM samp s CROSS JOIN {coarse} c)
  WHERE rn = 1),
fseed AS (
  SELECT ccid,
         CAST(row_number() OVER (PARTITION BY ccid ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INTEGER) AS scid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM sasg
  QUALIFY row_number() OVER (PARTITION BY ccid ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= (SELECT k2 FROM pk)),
fcent0 AS (
  SELECT * FROM fseed
  UNION ALL
  SELECT cid AS ccid, CAST(0 AS INTEGER) AS scid, centroid
  FROM {coarse}
  WHERE cid NOT IN (SELECT DISTINCT ccid FROM fseed))"""
    )
    for t in range(1, iters + 1):
        prev = f"fcent{t - 1}"
        ctes.append(
            f"""fasg{t} AS (
  SELECT vec_id, embedding, ccid, scid
  FROM (SELECT s.vec_id, s.embedding, s.ccid, c.scid,
          row_number() OVER (PARTITION BY s.vec_id ORDER BY {cos_se} DESC, c.scid) AS rn
        FROM sasg s JOIN {prev} c ON s.ccid = c.ccid)
  WHERE rn = 1),
fnew{t} AS (
  SELECT ccid, scid, list(c ORDER BY pos) AS centroid
  FROM (SELECT ccid, scid, pos, round(avg(v), 6) AS c
        FROM (SELECT ccid, scid, unnest(generate_series(1, len(embedding))) AS pos,
                     unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
              FROM fasg{t})
        GROUP BY ccid, scid, pos)
  GROUP BY ccid, scid),
fcent{t} AS (
  SELECT p.ccid, p.scid, COALESCE(n.centroid, p.centroid) AS centroid
  FROM {prev} p LEFT JOIN fnew{t} n USING (ccid, scid))"""
        )
    fine = f"fcent{iters}"
    ctes.append(
        f"""casg AS (
  SELECT vec_id, embedding, ccid
  FROM (SELECT e.vec_id, e.embedding, c.cid AS ccid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_cent} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN {coarse} c)
  WHERE rn = 1),
asg AS (
  SELECT vec_id, embedding,
         (CAST(ccid AS BIGINT) * (SELECT k2 FROM pk) + scid) AS cid,
         round(cos_c, 6) AS cent_cos
  FROM (SELECT s.vec_id, s.embedding, s.ccid, c.scid, {cos_se} AS cos_c,
          row_number() OVER (PARTITION BY s.vec_id ORDER BY {cos_se} DESC, c.scid) AS rn
        FROM casg s JOIN {fine} c ON s.ccid = c.ccid)
  WHERE rn = 1)"""
    )
    ctes.append(
        f"""dropped AS (
  SELECT DISTINCT a.vec_id
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  WHERE round({cos_pair}, 6) >= {tau}
    AND (b.cent_cos < a.cent_cos
         OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id)))"""
        if not incremental
        # incremental: a must be a BATCH vector; a base-side duplicate
        # drops it unconditionally (the corpus already holds that
        # content), batch-side ones via the keep-the-outlier rule
        else f"""member AS (
  SELECT vec_id, {_DUCK_VEC_BUCKET} < {INCR_BATCH_BUCKETS} AS is_batch
  FROM embeddings),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM asg a
  JOIN member ma ON ma.vec_id = a.vec_id AND ma.is_batch
  JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  JOIN member mb ON mb.vec_id = b.vec_id
  WHERE round({cos_pair}, 6) >= {tau}
    AND (NOT mb.is_batch
         OR b.cent_cos < a.cent_cos
         OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id)))"""
    )
    body = ",\n".join(ctes)
    if incremental:
        return f"""
WITH {body}
SELECT a.vec_id, a.cid, a.cent_cos, (d.vec_id IS NULL) AS kept
FROM asg a
JOIN member m ON m.vec_id = a.vec_id AND m.is_batch
LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""
    return f"""
WITH {body}
SELECT a.vec_id, a.cid, a.cent_cos, (d.vec_id IS NULL) AS kept
FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


@register(
    "dedup_semdedup_embeddings",
    _duck_semdedup_sql(),
    doc="SemDeDup (Abbas et al. 2023) with a two-level quantizer: "
    "cluster count k = max(8, ceil(N/128)) holds cluster WIDTH fixed "
    "(pair pass linear in N, the paper's own k∝N regime), split into "
    "k1=ceil(sqrt(k)) coarse cells x k2=ceil(k/k1) fine sub-centroids "
    "so assignment scores k1+k2 centroids per vector (coarse argmax, "
    "then probe-pruned fine argmax — the ivf_topk topology applied to "
    "the quantizer itself). Within each fine cluster drop every "
    f"vector with a cosine>={SEMDEDUP_TAU} duplicate that sits FURTHER "
    "from the centroid (keep-the-outlier, lowest-id tiebreak). N comes "
    "from parquet footer metadata (no counting pass). Oracle = the "
    "identical hierarchical Lloyd's unrolled into CTEs + the same "
    "rounded-cosine decision.",
)
def dedup_semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import semantic_dedup_two_level
    from .sources.registry import table_row_count

    df = load_table(spark, sf_dir, "embeddings")
    k1, k2 = _semdedup_split(table_row_count(sf_dir, "embeddings"))
    return semantic_dedup_two_level(
        df, "vec_id", "embedding",
        k1=k1, k2=k2, iters=KMEANS_ITERS, tau=SEMDEDUP_TAU,
        train_sample=SEMDEDUP_TRAIN_SAMPLE,
    )


@register(
    "dedup_semdedup_incremental",
    _duck_semdedup_sql(
        train_where=f"{_DUCK_VEC_BUCKET} >= {INCR_BATCH_BUCKETS}",
        incremental=True,
    ),
    doc="Incremental SemDeDup: a new 25% embedding batch semantically "
    "deduped against the 75% base corpus WITHOUT re-clustering or "
    "re-judging it — the embedding-space sibling of "
    "dedup_incremental_minhash. The two-level quantizer trains on the "
    "BASE's md5 sample (the persisted codebook of the existing "
    "corpus); base and batch assign coarse-then-fine; the keep "
    f"decision runs for BATCH vectors only: a cosine>={SEMDEDUP_TAU} "
    "base-side duplicate drops unconditionally (the corpus already "
    "holds that content), batch-side ones via keep-the-outlier. "
    "base x base pairs are never generated — the pair join probes the "
    "cluster index with the batch side only, O(|batch| x width). "
    "Oracle = the same hierarchical chain with base-trained sample "
    "and membership-aware drop rule.",
)
def dedup_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.chunking import hash_bucket_256
    from .operators.similarity import semantic_dedup_incremental
    from .sources.registry import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = hash_bucket_256(F.col("vec_id"))
    k1, k2 = _semdedup_split(table_row_count(sf_dir, "embeddings"))
    return semantic_dedup_incremental(
        emb.filter(bucket >= INCR_BATCH_BUCKETS),
        emb.filter(bucket < INCR_BATCH_BUCKETS),
        "vec_id", "embedding",
        k1=k1, k2=k2, iters=KMEANS_ITERS, tau=SEMDEDUP_TAU,
        train_sample=SEMDEDUP_TRAIN_SAMPLE,
    )


# =====================================================================
# Streaming operators, batch-equivalent driver entries (§7 M5)
# Structured Streaming transformations are identical in batch mode (the
# stream-vs-batch pytest in tests/test_streaming.py proves equivalence);
# these entries run the SAME functions on the batch events table so the
# streaming surface gets driver CORRECTNESS rows.
# =====================================================================


@register(
    "streaming_neardup_batch",
    f"""
WITH sig AS (
  SELECT event_id, user_id, event_type,
         {duck_simhash_bits("props", 16)} AS _sig
  FROM events)
SELECT event_id, user_id, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY _sig ORDER BY event_id) AS rn FROM sig)
WHERE rn = 1
""",
    doc="Batch replay of streaming_neardup (SimHash-collision dedup "
    "with watermark-bounded state in stream mode): same function, "
    "deterministic min-event_id survivor per signature. The "
    "stream-vs-batch test proves mode equivalence; this entry gives "
    "the streaming operator a driver-checkable form.",
)
def streaming_neardup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.events import streaming_neardup

    events = load_table(spark, sf_dir, "events")
    kept = streaming_neardup(
        events, text_col="props", ts_col="ts", num_bits=16,
        batch_tiebreak="event_id",
    )
    return kept.select("event_id", "user_id", "event_type")


@register(
    "stream_enrich_events_batch",
    """
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
       round(e.value, 2) AS value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
""",
    doc="Batch form of enrich_with_dimension (stream-static broadcast "
    "join: the dimension snapshot is broadcast, the event stream never "
    "shuffles — the only sane shape when the stream side is 100 TB/day). "
    "Left join keeps events with no dimension row.",
)
def stream_enrich_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.events import enrich_with_dimension

    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    enriched = enrich_with_dimension(
        events, dim, on="user_id", dim_cols=["c_name", "c_mktsegment"]
    )
    return enriched.select(
        "event_id", "user_id", "c_name", "c_mktsegment",
        F.round("value", 2).alias("value"),
    )



# ---- round-4 additions: cluster representatives + sequence packing ----


def _duck_cluster_reps_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_minhash_pair_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT re.node, e.v FROM reach re JOIN edges e ON re.r = e.u),
clusters AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
  FROM reach GROUP BY node),
q AS (SELECT doc_id, quality_score FROM ({_duck_quality_sql()}) t),
ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality_score,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN q USING (doc_id))
SELECT cluster_id, doc_id AS rep_doc_id, quality_score AS rep_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rn = 1
"""


@register(
    "dedup_cluster_representatives",
    _duck_cluster_reps_sql(),
    doc="Canonical-document selection: for each near-dup cluster keep the "
    "highest-quality member (composite quality score, min-doc_id "
    "tiebreak) — the step after clustering in a real dedup pipeline "
    "(which copy of the page do we train on?). Spark side is one "
    "map-side-combinable max_by over the cluster labels joined to the "
    "quality projection; oracle recomputes clusters via recursive "
    "transitive closure + a rank window.",
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import duplicate_clusters

    df = load_table(spark, sf_dir, "documents")
    clusters = duplicate_clusters(
        df,
        "doc_id",
        "text",
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
    )
    quality = df.select(
        "doc_id", quality_features("text")["quality_score"].alias("quality_score")
    )
    # max_by with (quality, -doc_id) order: best quality wins, lowest
    # doc_id breaks ties — partial aggregates combine map-side, so the
    # shuffle carries one row per cluster, not per member
    ord_ = F.struct(F.col("quality_score"), (-F.col("doc_id")).alias("_nd"))
    return (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("doc_id").alias("d"), F.col("quality_score").alias("q")
                ),
                ord_,
            ).alias("_m"),
            F.count("*").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("_m.d").alias("rep_doc_id"),
            F.col("_m.q").alias("rep_quality"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


PACK_TOKEN_BUDGET = 256

_PACK_SQL_TMPL = """
SELECT lang, doc_id, n_tokens,
       CAST(floor(cum_excl / {budget}) AS BIGINT) AS pack_id
FROM (
  SELECT lang, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           AS cum_excl
  FROM (SELECT lang, doc_id,
               CAST({n_tokens_expr} AS BIGINT) AS n_tokens
        FROM documents) t0
) t1
"""


@register(
    "pack_sequences_greedy",
    _PACK_SQL_TMPL.format(
        budget=PACK_TOKEN_BUDGET,
        n_tokens_expr="len(string_split(text, ' '))",
    ),
    doc="Sequence packing for pretraining batches: within each lang "
    "shard, docs (in doc_id order) are packed next-fit into bins of "
    f"~{PACK_TOKEN_BUDGET} tokens — pack_id = floor(exclusive-cumsum / "
    "budget). One window per shard (single hash shuffle on lang, "
    "linear); the same contiguous-fill definition runs in both "
    "engines, so the assignment is hash-checkable. At 100 TB the "
    "lang shard is replaced by (lang, file-split) to keep window "
    "partitions bounded.",
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        "lang",
        "doc_id",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("double")
            / PACK_TOKEN_BUDGET
        )
        .cast("bigint")
        .alias("pack_id"),
    )


@register(
    "text_normalize_nfc",
    "SELECT doc_id, "
    "trim(regexp_replace(regexp_replace(nfc_normalize(text), "
    "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'), "
    "'\\s+', ' ', 'g')) AS text_norm, "
    "CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(text), "
    "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'), "
    "'\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm "
    "FROM documents",
    doc="Unicode NFC normalization + control-char strip + whitespace "
    "collapse — the corpus-cleaning first pass. Spark side is an "
    "Arrow-batched mapInPandas (no NFC builtin; per-batch python "
    "cost, schema-preserving narrow op); oracle is DuckDB's "
    "nfc_normalize with the same regex pipeline. Unit test covers "
    "combining marks / ligatures the synthetic corpus lacks.",
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cleaning import normalize_text_nfc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = normalize_text_nfc(docs, ["text"])
    return out.select(
        "doc_id",
        F.col("text").alias("text_norm"),
        F.length("text").cast("bigint").alias("n_chars_norm"),
    )


# =====================================================================
# Language-ID confusion matrix (heuristic prediction vs label)
# =====================================================================


@register(
    "text_langid_confusion",
    f"WITH cm AS (SELECT lang, {duck_lang_id('text')} AS lang_pred, "
    "count(*) AS n FROM documents GROUP BY 1, 2) "
    "SELECT lang, lang_pred, CAST(n AS BIGINT) AS n, "
    "floor(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) "
    "* 10000) / 10000 AS recall_share, "
    "floor(n / CAST(sum(n) OVER (PARTITION BY lang_pred) AS DOUBLE) "
    "* 10000) / 10000 AS precision_share "
    "FROM cm ORDER BY lang, lang_pred",
    doc="Confusion matrix of the n-gram-heuristic language identifier "
    "against the labeled lang column, with per-cell recall share "
    "(row-normalized) and precision share (column-normalized) — the "
    "filter-evaluation readout for any lang-gated corpus split. One "
    "|langs|^2-group aggregation over the rowwise prediction (map-side "
    "partials), then two windows over the <= 25-row matrix: scan-bound "
    "at any corpus size. functions/text.py:lang_id.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    cm = (
        docs.select("lang", lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
    w_row = Window.partitionBy("lang")
    w_col = Window.partitionBy("lang_pred")
    return cm.select(
        "lang",
        "lang_pred",
        F.col("n").cast("bigint").alias("n"),
        (
            F.floor(
                F.col("n") / F.sum("n").over(w_row).cast("double") * 10000
            )
            / 10000
        ).alias("recall_share"),
        (
            F.floor(
                F.col("n") / F.sum("n").over(w_col).cast("double") * 10000
            )
            / 10000
        ).alias("precision_share"),
    ).orderBy("lang", "lang_pred")


# =====================================================================
# SimHash near-dup pairs within Hamming distance (block-index join)
# =====================================================================

SIMHASH_HAM_MAX = 3  # pairs kept at Hamming distance <= 3 (of 64 bits)
SIMHASH_HAM_BITS = 64  # Manku WWW'07 signature width: 4 blocks x 16 bits
_SIMHASH_BLOCK = SIMHASH_HAM_BITS // 4


def _simhash_ham_sql(sig: str, exploder: str, hamming: str) -> str:
    # 4 blocks of 16 signature chars (the r4->r5 lesson, twice over:
    # block-value domains must stay fine relative to corpus size —
    # 8-bit blocks put ~n/256 docs in every bucket, which went
    # quadratic at 50k docs; 16-bit blocks give 65536 values and
    # near-singleton buckets).  Any pair within Hamming distance 3
    # agrees on at least one block (pigeonhole), so a block-value
    # equi-join yields a candidate superset; positional compare
    # verifies exactly.
    return (
        f"WITH s AS (SELECT doc_id, {sig} AS sig FROM documents), "
        f"blocks AS (SELECT doc_id, sig, i, "
        f"substr(sig, 1 + i * {_SIMHASH_BLOCK}, {_SIMHASH_BLOCK}) AS blockval "
        f"FROM (SELECT doc_id, sig, {exploder} AS i FROM s) t), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "a.sig AS sa, b.sig AS sb "
        "FROM blocks a JOIN blocks b ON a.i = b.i "
        "AND a.blockval = b.blockval AND a.doc_id < b.doc_id) "
        f"SELECT id_a, id_b, CAST({hamming} AS INT) AS hamming "
        f"FROM cand WHERE {hamming} <= {SIMHASH_HAM_MAX} "
        "ORDER BY id_a, id_b"
    )


# Spark verifies via bit_count(xor) on per-block longs (codegen); the
# oracle states the same Hamming count as a positional string compare.
_HAM_DUCK = (
    f"len(list_filter(generate_series(1, {SIMHASH_HAM_BITS}), j -> "
    "substr(sa, j, 1) <> substr(sb, j, 1)))"
)


@register(
    "dedup_simhash_hamming_pairs",
    _simhash_ham_sql(
        duck_simhash_bits("text", SIMHASH_HAM_BITS),
        "unnest(range(0, 4))",
        _HAM_DUCK,
    ),
    doc="SimHash near-duplicate pairs within Hamming distance "
    f"{SIMHASH_HAM_MAX} (Manku et al., WWW'07 block-permutation "
    f"index): the {SIMHASH_HAM_BITS}-bit signature splits into 4 "
    f"{_SIMHASH_BLOCK}-bit blocks (65536 values each — near-singleton "
    "block buckets at 100k-doc scale, where 256-value blocks went "
    "quadratic); by pigeonhole "
    "any pair within distance 3 agrees exactly on >= 1 block, so "
    "candidates come from a (block-index, block-value) equi-join — "
    "shuffle volume is docs x 4, never docs^2 — and a positional "
    "compare of the bit-strings verifies exactly. Extends the "
    "exact-collision simhash groups entry to the fuzzy radius the "
    "algorithm was designed for; signatures and verification are "
    "identical expressions in both engines.",
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    # NOTE (r5, measured): a vocabulary-first build (hash bits once per
    # DISTINCT token, join back, multiset-majority) was tried here and
    # is 4x SLOWER at sf1 (66.9 s vs 15.7 s) — exploding the occurrence
    # stream and shuffling it through distinct + join + 65-column agg
    # costs far more than recomputing 64 codegen parity ops per
    # occurrence. Signature compute stays expression-side: zero
    # shuffles, embarrassingly parallel, linear in corpus size.
    sigs = simhash_signatures(df, "doc_id", "text", SIMHASH_HAM_BITS).select(
        "doc_id", F.col("simhash").alias("sig")
    )
    # one long per 16-bit block, decoded once per doc: the Hamming
    # verify becomes pure codegen bit_count(xor) arithmetic on 4 longs
    # instead of an interpreted 64-element higher-order filter per
    # candidate row (HOF lambdas do not codegen; at 4M candidate rows
    # that interpretation was the entry's largest cost at sf1).
    ints = [
        F.expr(
            f"CAST(conv(substr(sig, 1 + {k} * {_SIMHASH_BLOCK}, {_SIMHASH_BLOCK}), 2, 10) AS BIGINT)"
        ).alias(f"s{k}")
        for k in range(4)
    ]
    blocks = sigs.select(
        "doc_id",
        "sig",
        *ints,
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    ).withColumn(
        "blockval", F.expr(f"substr(sig, 1 + i * {_SIMHASH_BLOCK}, {_SIMHASH_BLOCK})")
    ).drop("sig")
    # persist: the self-join would otherwise evaluate the 64-bit
    # signature expression (the entry's most expensive leg) once per
    # side; 50k cached rows of ~100 B is nothing.
    blocks = blocks.persist()
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = a.join(
        b,
        (F.col("a.i") == F.col("b.i"))
        & (F.col("a.blockval") == F.col("b.blockval"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        *[F.col(f"a.s{k}").alias(f"a{k}") for k in range(4)],
        *[F.col(f"b.s{k}").alias(f"b{k}") for k in range(4)],
    )
    # verify FIRST, dedup after: on a common-vocabulary corpus the
    # per-bit majorities are biased, so block collisions run to
    # millions of candidate rows (measured 4M at sf1) of which only
    # hundreds survive Hamming <= 3 — a distinct() before the verify
    # shuffles all of them with their 64-char signatures (5.4 s at
    # sf1), while the Hamming filter is an in-stage codegen pass and
    # the post-filter dedup shuffles only true pairs.  A pair that
    # agrees on several blocks verifies identically each time, so the
    # output set is unchanged.
    ham = F.expr(
        " + ".join(f"bit_count(a{k} ^ b{k})" for k in range(4))
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


_JPEG_N = 12


def _mm_jpeg_golden() -> list[tuple]:
    """Expected image-source readout, re-derived from the generator
    SPEC: JPEG is lossy in VALUES but exact in GEOMETRY, so dims,
    channel count (ImageIO decodes baseline JPEG to 3-channel BGR,
    OpenCV mode 16) and the decoded buffer size h*w*3 are all
    deterministic — pixel bytes are codec-version-dependent and
    deliberately not asserted."""
    from .operators.multimodal import synthetic_image_dims

    rows = []
    for i in range(_JPEG_N):
        w, h = synthetic_image_dims(i)
        rows.append((i, h, w, 3, h * w * 3))
    return rows


@register(
    "mm_jpeg_image_source",
    _values_oracle(
        _mm_jpeg_golden(),
        [
            ("asset_id", "BIGINT"),
            ("height", "INTEGER"),
            ("width", "INTEGER"),
            ("n_channels", "INTEGER"),
            ("decoded_bytes", "BIGINT"),
        ],
    ),
    doc="REAL JPEG decode, distributed: baseline JPEGs are encoded "
    "from the synthetic pixel fields via the JVM's javax.imageio "
    "(operators/multimodal.py:write_jpeg_fixtures, driver-side "
    "fixture utility), then read back through Spark's built-in image "
    "data source — executor-side ImageIO decode, zero Python in the "
    "decode path (read_images_jvm). The oracle re-derives geometry "
    "from the generator spec: dims survive the lossy codec exactly, "
    "ImageIO yields 3-channel BGR, and the decoded buffer is h*w*3 "
    "bytes. This closes the JPEG ingestion half of the codec "
    "boundary; JPEG bytes inside a binary column remain the "
    "documented Pillow swap-in.",
)
def mm_jpeg_image_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .operators.multimodal import read_images_jvm, write_jpeg_fixtures

    d = tempfile.mkdtemp(prefix="mm-jpeg-")
    write_jpeg_fixtures(spark, d, _JPEG_N)
    imgs = read_images_jvm(spark, d)
    return imgs.select(
        F.regexp_extract("origin", r"img-(\d+)\.jpg", 1)
        .cast("bigint")
        .alias("asset_id"),
        "height",
        "width",
        "n_channels",
        F.length("data").cast("bigint").alias("decoded_bytes"),
    )


@register(
    "events_variant_json_stats",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE json_valid(props)
GROUP BY event_type
""",
    doc="Semi-structured analytics through Spark 4's VARIANT type: "
    "try_parse_json(props) binary-encodes the payload ONCE per row and "
    "try_variant_get extracts a typed field from the encoded form — "
    "the published fast path for JSON-heavy pipelines (get_json_object "
    "re-parses the string per extraction; VARIANT amortizes the parse "
    "across every field touched, the difference between one and N "
    "parses per row on a metadata-rich training corpus). Malformed "
    "payloads turn into NULLs, never errors (try_ semantics), matching "
    "the oracle's json_valid gate.",
)
def events_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.try_parse_json(F.col("props"))
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.try_variant_get(v, "$.k", "bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


sql_query(
    "pipe_syntax_order_stats",
    """
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             round(sum(round(o_totalprice, 2)), 2) AS total_price
   GROUP BY o_orderpriority
|> SELECT o_orderpriority, n, total_price
""",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
    doc="SQL pipe syntax (Spark 4, SPARK-49555): the same filtered "
    "aggregate written as a |> pipeline — each operator applies in "
    "reading order, the composable form long analytics chains stay "
    "reviewable in. Plans identically to the classic text (same "
    "Catalyst plan), which the classic-SQL oracle proves by value.",
)


@register(
    "dedup_exact_collated",
    """
WITH g AS (SELECT lower(text) AS k, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY lower(text))
SELECT CAST(count(*) AS BIGINT) AS dup_groups,
       CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS removable_docs
FROM g WHERE cnt > 1
""",
    doc="Case-insensitive exact dedup via Spark 4 string collations: "
    "GROUP BY text COLLATE UTF8_LCASE compares under the collation "
    "INSIDE the hash aggregate — no lower() copy of every document "
    "materialized in the shuffle, the difference between shuffling N "
    "documents and N lowercased duplicates of them. The oracle states "
    "the same grouping with lower(); equivalent on this ASCII corpus "
    "(collation-vs-lower differences are confined to locale-special "
    "codepoints the generator never emits).",
)
def dedup_exact_collated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_coll"
    )
    return spark.sql(
        """
WITH g AS (SELECT count(*) AS cnt
           FROM documents_coll
           GROUP BY text COLLATE UTF8_LCASE)
SELECT CAST(count(*) AS BIGINT) AS dup_groups,
       CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS removable_docs
FROM g WHERE cnt > 1
"""
    )


@register(
    "sql_udf_price_banding",
    """
WITH banded AS (
  SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
              WHEN o_totalprice < 150000 THEN 'mid'
              ELSE 'high' END AS band,
         round(o_totalprice, 2) AS p
  FROM orders)
SELECT band, CAST(count(*) AS BIGINT) AS n, round(sum(p), 2) AS total_price
FROM banded GROUP BY band
""",
    doc="Declarative SQL UDF (Spark 4.1 CREATE FUNCTION ... RETURN): "
    "the banding rule is defined ONCE as a catalog-level scalar "
    "function and reused; Catalyst inlines the body, so the plan is "
    "identical to writing the CASE inline (the oracle states exactly "
    "that inline form) — reuse without a Python-worker round trip, the "
    "idiomatic way to share row-level business rules across plans.",
)
def sql_udf_price_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
RETURNS STRING
RETURN CASE WHEN p < 50000 THEN 'low'
            WHEN p < 150000 THEN 'mid'
            ELSE 'high' END
"""
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udf")
    return spark.sql(
        """
SELECT price_band(o_totalprice) AS band,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders_udf GROUP BY price_band(o_totalprice)
"""
    )


sql_query(
    "group_by_all_order_mix",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders
GROUP BY ALL
""",
    doc="GROUP BY ALL (Spark 3.4+/ANSI shorthand, same text in "
    "DuckDB): every non-aggregate select item becomes a grouping key, "
    "so adding a dimension to a wide report never desyncs the SELECT "
    "and GROUP BY lists — identical hash-aggregate plan to the "
    "explicit form.",
)


sql_query(
    "lateral_alias_price_pipeline",
    """
SELECT o_orderpriority,
       round(sum(round(o_totalprice, 2)), 2) AS gross,
       round(gross * 0.07, 2) AS est_tax,
       round(gross - est_tax, 2) AS net
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
    doc="Lateral column aliases (Spark 3.4, SPARK-27561; DuckDB "
    "supports the same reuse): later select items reference earlier "
    "aliases in the SAME select list, so derived-metric chains "
    "(gross -> tax -> net) are written once instead of re-expanding "
    "the whole aggregate expression per step — Catalyst inlines the "
    "alias, one aggregate in the plan.",
)


@register(
    "parameterized_sql_status_slice",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders WHERE o_orderstatus = 'P' AND o_totalprice >= 1000.0
GROUP BY o_orderpriority
""",
    doc="Parameterized SQL (Spark 3.4+, SPARK-41271): the query text "
    "carries named :status/:floor markers and values bind through "
    "spark.sql(args=...) — the injection-safe path for plan templates "
    "that interpolating user strings into SQL can never be (the "
    "reference's plan language concatenates its Query field verbatim; "
    "this is the hardened equivalent). The oracle inlines the same "
    "literals, proving binding equals inlining.",
)
def parameterized_sql_status_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.registry import register_parquet_views

    register_parquet_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               round(sum(round(o_totalprice, 2)), 2) AS total_price
        FROM orders WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "P", "floor": 1000.0},
    )


# =====================================================================
# Ranking-quality evaluation: nDCG@k + MRR of the IVF path
# =====================================================================


def _duck_ndcg_sql() -> str:
    """nDCG@k / MRR oracle: binary relevance = membership in the exact
    brute-force top-k; both folds run in a FIXED (rank) order so the
    non-integral double sums are bit-identical across engines."""
    return f"""
WITH exact AS (SELECT query_id, vec_id FROM ({_duck_ann_sql(bucketed=False)})),
approx AS (SELECT query_id, vec_id, rank FROM ({_duck_ivf_sql()})),
gains AS (
  SELECT a.query_id, a.rank,
         CASE WHEN e.vec_id IS NULL THEN CAST(0 AS DOUBLE)
              ELSE CAST(1 AS DOUBLE) / log2(a.rank + 1) END AS gain,
         CASE WHEN e.vec_id IS NULL THEN NULL ELSE a.rank END AS hit_rank
  FROM approx a LEFT JOIN exact e
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id),
perq AS (
  SELECT query_id,
         list_reduce(list(gain ORDER BY rank), (x, y) -> x + y) AS dcg,
         min(hit_rank) AS first_hit
  FROM gains GROUP BY query_id),
ideal AS (
  SELECT list_reduce(
           list(CAST(1 AS DOUBLE) / log2(i + 1) ORDER BY i),
           (x, y) -> x + y) AS idcg
  FROM (SELECT unnest(generate_series(1, {ANN_K})) AS i))
SELECT p.query_id,
  floor(p.dcg / i.idcg * 10000) / 10000 AS ndcg_at_k,
  floor(COALESCE(CAST(1 AS DOUBLE) / p.first_hit, CAST(0 AS DOUBLE))
        * 10000) / 10000 AS mrr
FROM perq p CROSS JOIN ideal i
ORDER BY p.query_id
"""


@register(
    "ann_ndcg_mrr_eval",
    _duck_ndcg_sql(),
    doc="Ranking-quality evaluation of the IVF probe path: nDCG@k "
    "(binary relevance = membership in the exact brute-force top-k, "
    "log2 position discounts) and MRR (reciprocal rank of the first "
    "true hit) per query — the position-aware complement to "
    "ann_recall_eval (recall treats rank k like rank 1; a RAG "
    "retriever cares WHERE the relevant chunk lands because context "
    "is assembled in rank order). Both DCG folds run left-associated "
    "in fixed rank order (the order-deterministic-sum rule for "
    "non-integral doubles). Scale shape: the two already-linear topk "
    "plans + a (queries x k)-row join — negligible at any corpus "
    "size.",
)
def ann_ndcg_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import brute_force_topk, ivf_topk

    df = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(
        df, "vec_id", "embedding", query_ids=ANN_QUERY_IDS, k=ANN_K
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    approx = ivf_topk(
        df, "vec_id", "embedding", "label",
        query_ids=ANN_QUERY_IDS, k=ANN_K, nprobe=IVF_NPROBE,
    ).select("query_id", "vec_id", "rank")
    gains = approx.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "rank",
        F.when(
            F.col("hit").isNotNull(),
            F.expr("CAST(1 AS DOUBLE) / log2(rank + 1)"),
        )
        .otherwise(F.lit(0.0))
        .alias("gain"),
        F.when(F.col("hit").isNotNull(), F.col("rank")).alias("hit_rank"),
    )
    perq = gains.groupBy("query_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(rank, gain))), "
            "CAST(0 AS DOUBLE), (acc, s) -> acc + s.gain)"
        ).alias("dcg"),
        F.min("hit_rank").alias("first_hit"),
    )
    idcg = F.expr(
        f"aggregate(transform(sequence(1, {ANN_K}), "
        "i -> CAST(1 AS DOUBLE) / log2(i + 1)), "
        "CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    return perq.select(
        "query_id",
        (F.floor(F.col("dcg") / idcg * 1e4) / 1e4).alias("ndcg_at_k"),
        (
            F.floor(
                F.coalesce(
                    F.expr("CAST(1 AS DOUBLE) / first_hit"), F.lit(0.0)
                )
                * 1e4
            )
            / 1e4
        ).alias("mrr"),
    ).orderBy("query_id")
