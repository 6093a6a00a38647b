"""Embedding similarity search (ANN) + embedding near-dup operators.

Embeddings are ``array<float>`` columns.  All math happens in Catalyst
higher-order functions (``zip_with`` + ``aggregate`` folds) — JVM-side,
codegen'd, no Python in the hot path.  Determinism contract with the
DuckDB oracle: both engines widen float→double and fold products
left-to-right, so cosine values are bit-identical.

Scale design (100 TB of embeddings):

* brute-force top-k: the query set is broadcast (it is small by
  definition); the corpus is scanned once, partition-parallel; ranking
  is a two-phase top-k — a per-(query, hash-group) partial rank keeps
  k rows per group, so the final exact window ranks at most
  ``LOCAL_PRUNE_GROUPS × k`` rows per query rather than the whole
  scored corpus.  This is the exact baseline.
* LSH-bucketed (random-hyperplane) search: a deterministic set of
  hyperplanes (md5-seeded, reproducible everywhere) maps each vector
  to a sign-pattern bucket; search joins query↔corpus per bucket —
  the join key replaces the cross product, turning O(N·Q) into
  O(N·Q/2^planes) expected.  Recall is the standard SimHash-LSH
  trade-off; increase ``planes`` / add multiprobe for tighter buckets.
* banded near-dup (``embedding_neardup_pairs_banded``): the sign
  string is split into ``bands`` independent sub-keys; a pair is a
  candidate if ANY band matches.  Bucket-size math: with ``planes``
  bits total and ``r = planes/bands`` bits per band, the expected
  bucket population is ``N / 2^r`` per band key, candidate volume
  ``≈ bands · N² / 2^r`` (vs ``N² / 2^planes`` monolithic), and a
  pair with per-plane agreement probability ``p`` is recalled with
  ``1 - (1 - p^r)^bands`` — the standard LSH S-curve, so recall/cost
  is tunable per scale without code edits (raise ``planes`` to shrink
  buckets, raise ``bands`` to recover recall).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hyperplanes",
    "cosine_expr",
    "bucket_expr",
    "brute_force_topk",
    "lsh_bucket_topk",
    "lsh_multiprobe_topk",
    "with_multiprobe_buckets",
    "kmeans_centroids",
    "kmeans_centroids_grouped",
    "md5_sample",
    "semantic_dedup_two_level",
    "semantic_dedup_incremental",
    "two_level_codebook",
    "ivf_topk",
    "ivf_pq_adc_topk",
    "build_ivfpq_index",
    "matryoshka_rerank_topk",
    "hard_negative_mining",
    "label_centroids",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_banded",
]


# Phase-1 fan-in of the two-phase exact top-k: the final per-query
# window ranks at most LOCAL_PRUNE_GROUPS × k rows.
LOCAL_PRUNE_GROUPS = 32


def hyperplanes(planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1).

    Coefficient (j, i) derives from ``md5("{j}:{i}")``'s first 8 hex
    chars — reproducible in any language/engine with no RNG state.
    """
    out = []
    for j in range(planes):
        row = []
        for i in range(dims):
            v = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
            row.append(round(v / 2**31 - 1.0, 8))
        out.append(row)
    return out


def _vec_sql(vec: list[float]) -> str:
    return "array(" + ", ".join(repr(x) + "D" for x in vec) + ")"


def dot_expr(x: str, y: str, dims: int | None = None) -> str:
    """Spark SQL text for the dot product of two array columns as an
    explicit left-to-right double sum (bit-reproducible).

    With ``dims`` the sum is UNROLLED over ``element_at`` terms — a
    plain left-associative ``a1 + a2 + …`` (bit-identical to the fold:
    IEEE ``0.0 + a1 == a1`` and both associate left).  MEASURED r6
    tradeoff, recorded as a negative result: on a single-expression
    scan the unrolled form is ~2.7× the HOF fold (whole-stage codegen
    compiles it; HOF lambdas run interpreted per element — the r5
    simhash lesson).  But in a real operator plan where the expression
    occurs several times (ivf_topk: assign + probe + re-rank), 64-term
    trees blow up Catalyst optimization + janino compilation and the
    WHOLE query ran 2–4× SLOWER (ivf_topk 1.7 s → 4.0 s warm at
    sf0.1).  Hence every operator here defaults to ``dims=None`` (the
    fold); pass ``dims`` only for one-shot wide scans where the
    projection is the entire plan.
    """
    if dims is not None:
        return (
            "("
            + " + ".join(
                f"CAST(element_at({x}, {i}) AS DOUBLE) * "
                f"CAST(element_at({y}, {i}) AS DOUBLE)"
                for i in range(1, dims + 1)
            )
            + ")"
        )
    return (
        f"aggregate(zip_with({x}, {y}, (p, q) -> "
        f"CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v)"
    )


def norm_expr(x: str, dims: int | None = None) -> str:
    """Spark SQL text for the L2 norm (the exact subexpression
    ``cosine_expr`` uses, so ``dot/(norm_a*norm_b)`` with precomputed
    norms is bit-identical to the inline form)."""
    return f"sqrt({dot_expr(x, x, dims)})"


def cosine_expr(a: str, b: str, dims: int | None = None) -> str:
    """Spark SQL text for cosine similarity of two array<float/double>
    columns, as explicit left-to-right double folds (bit-reproducible).

    When one side repeats across many partners (corpus × centroids,
    candidates × queries), precompute :func:`norm_expr` per side ONCE
    and divide the dot by the product — 3× less fold arithmetic per
    pair, same bits.
    """
    return (
        f"({dot_expr(a, b, dims)} / "
        f"(sqrt({dot_expr(a, a, dims)}) * sqrt({dot_expr(b, b, dims)})))"
    )


def plane_dot_expr(vec_col: str, plane: list[float]) -> str:
    """Spark SQL text: left-to-right double fold of ``vec_col`` against
    one fixed hyperplane (bit-reproducible).

    Deliberately the HOF fold, NOT an unrolled literal sum (r6 negative
    result): ``bucket_expr`` emits this once per plane, so unrolling
    creates planes×dims-term trees (32×64 = 2048 terms) that blow up
    Catalyst optimization + codegen and regressed ann_lsh_bucket_topk
    ~2× end-to-end despite the per-element interpretation cost."""
    return (
        f"aggregate(zip_with({vec_col}, {_vec_sql(plane)}, (p, q) -> "
        f"CAST(p AS DOUBLE) * q), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """Spark SQL text: sign-pattern LSH bucket id ('+'/'-' string) of a
    vector against the fixed hyperplanes."""
    signs = [
        f"CASE WHEN {plane_dot_expr(vec_col, row)} >= 0 THEN '+' ELSE '-' END"
        for row in planes
    ]
    return "concat(" + ", ".join(signs) + ")"


def lsh_signature_udf(planes: list[list[float]]):
    """Arrow-batched pandas UDF computing the same '+'/'-' sign string
    :func:`bucket_expr` emits, BIT-IDENTICALLY, but vectorized across
    rows — the scale path for wide plane matrices.

    Why it exists: the SQL fold interprets its lambda per element, so a
    192-plane signature costs planes × dims interpreted steps per row —
    measured ~8 s for 20k vectors where this UDF takes ~0.2 s.  Why it
    is SAFE (the objection that rejected numpy for the cosine verify —
    pairwise summation reordering can flip near-zero signs — does not
    apply here): the accumulation below loops SEQUENTIALLY over the
    dimension axis, vectorizing only across rows/planes, so each dot
    product is the exact left-to-right IEEE sum ``((0 + x1·p1) + x2·p2)
    + …`` the SQL fold computes — same bits, same signs, same oracle.
    ``test_lsh_signature_udf_matches_sql_fold`` holds the equivalence.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    P = np.array(planes, dtype=np.float64)  # (n_planes, dims)

    def _sig(vecs):
        out = []
        # per Arrow batch: stack to (n, dims); guard ragged/null rows
        vals = vecs.to_numpy()
        good = np.array([v is not None and len(v) == P.shape[1] for v in vals])
        if not good.any():
            return pd.Series([None] * len(vals), dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vals[good]])
        acc = np.zeros((V.shape[0], P.shape[0]))
        for i in range(P.shape[1]):  # sequential over dims = fold order
            acc += V[:, i : i + 1] * P[None, :, i]
        signs = np.where(acc >= 0, "+", "-")
        sigs = iter("".join(row) for row in signs)
        for g in good:
            out.append(next(sigs) if g else None)
        return pd.Series(out, dtype=object)

    # annotate with REAL types (the module's future-annotations mode
    # would stringify inline hints into names the UDF-inference can't
    # resolve from this closure)
    _sig.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "string")


def with_multiprobe_buckets(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    nprobe_bits: int,
    out_col: str = "probes",
) -> DataFrame:
    """Add an array column of probe buckets for query-directed
    multiprobe — the vector's own sign bucket plus the
    ``nprobe_bits`` Hamming-distance-1 buckets obtained by flipping
    the LEAST-CONFIDENT sign bits (smallest ``|dot|`` — the planes the
    vector sits closest to, where a true neighbor most likely landed on
    the other side).  Ties in ``|dot|`` break by plane index, so the
    probe set is deterministic.
    """
    n = len(planes)
    dots = "array(" + ", ".join(plane_dot_expr(vec_col, row) for row in planes) + ")"
    sig = (
        "array_join(transform(_dots, d -> "
        "CASE WHEN d >= 0 THEN '+' ELSE '-' END), '')"
    )
    flip_order = (
        f"transform(array_sort(transform(sequence(1, {n}), "
        "j -> struct(abs(element_at(_dots, j)) AS a, j AS j))), s -> s.j)"
    )
    flips = (
        f"transform(slice({flip_order}, 1, {nprobe_bits}), i -> "
        "concat(substring(_sig, 1, i - 1), "
        "CASE WHEN substring(_sig, i, 1) = '+' THEN '-' ELSE '+' END, "
        f"substring(_sig, i + 1, {n})))"
    )
    return (
        df.withColumn("_dots", F.expr(dots))
        .withColumn("_sig", F.expr(sig))
        .withColumn(out_col, F.expr(f"array_distinct(concat(array(_sig), {flips}))"))
        .drop("_dots", "_sig")
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
    planes: int = 4,
    dims: int = 64,
    nprobe_bits: int = 2,
) -> DataFrame:
    """Multiprobe LSH top-k: like :func:`lsh_bucket_topk` but each
    query also probes its ``nprobe_bits`` least-confident
    Hamming-distance-1 buckets, recovering most of the recall a single
    sign bucket loses at a cost of ``1 + nprobe_bits`` bucket lookups
    (instead of the 2× memory of doubling hash tables).

    A corpus vector lives in exactly one bucket and the probe set is
    distinct, so no candidate dedup is needed.  Same output shape and
    two-phase top-k as the other ANN variants.
    """
    query_ids = query_ids or [0, 1, 2]
    hp = hyperplanes(planes, dims)
    bucketed = corpus.withColumn("bucket", F.expr(bucket_expr(vec_col, hp)))
    # norms once per side (see cosine_expr note): identical bits,
    # one fold per row instead of three per (candidate, query) pair
    bucketed = bucketed.withColumn("_vn", F.expr(norm_expr(vec_col)))
    queries = (
        with_multiprobe_buckets(
            corpus.filter(F.col(id_col).isin(query_ids)), vec_col, hp, nprobe_bits
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode("probes").alias("bucket"),
            F.expr(norm_expr(vec_col)).alias("_qn"),
        )
    )
    scored = (
        bucketed.alias("c")
        .join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_full", F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)")
        )
    )
    scored = scored.withColumn(
        "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    pruned = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_grp", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
    dims: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector (rows with
    ``id_col ∈ query_ids``), the k nearest corpus vectors (self
    excluded).  Output ``(query_id, vec_id, cos_sim, rank)``; ties
    broken by ``vec_id`` so the result is a total order.

    Scale shape: two-phase top-k.  Phase 1 ranks within
    ``(query_id, pmod(hash(id), LOCAL_PRUNE_GROUPS))`` — many groups,
    partition-parallel — and keeps k per group, so the final exact
    ranking window sees at most ``LOCAL_PRUNE_GROUPS × k`` rows per
    query instead of the whole scored corpus.  The salt is a
    deterministic hash (retry-safe); the result is identical to a
    single global window because the global top-k is contained in the
    union of the per-group top-ks.
    """
    query_ids = query_ids or [0, 1, 2]
    queries = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_expr(vec_col)).alias("_qn"),
    )
    scored = (
        corpus.alias("c")
        .withColumn("_vn", F.expr(norm_expr(vec_col)))
        .crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_full", F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)")
        )
    )
    scored = scored.withColumn(
        "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    pruned = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_grp", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Same output shape as :func:`brute_force_topk`; recall < 1 by
    design.  The bucket join replaces the cross product — this is the
    scale path when the query set is itself large.
    """
    query_ids = query_ids or [0, 1, 2]
    hp = hyperplanes(planes, dims)
    bucketed = corpus.withColumn("bucket", F.expr(bucket_expr(vec_col, hp)))
    bucketed = bucketed.withColumn("_vn", F.expr(norm_expr(vec_col)))
    queries = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket"),
        F.col("_vn").alias("_qn"),
    )
    scored = (
        bucketed.alias("c")
        .join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_full", F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)")
        )
    )
    # same two-phase top-k as brute_force_topk: a bucket is N/2^planes
    # expected but can still be huge at corpus scale, so don't funnel
    # a whole candidate set through one per-query window task
    scored = scored.withColumn(
        "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    pruned = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_grp", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    pruned to same-LSH-bucket pairs (id_a < id_b).

    Output ``(id_a, id_b, cos_sim)``.  CAVEAT (the r5 scale law): the
    monolithic ``planes``-bit key is a FIXED domain (2^planes values),
    so bucket population — and the candidate set — grows quadratically
    with the corpus.  This form is the readable baseline; at corpus
    scale use :func:`embedding_neardup_pairs_banded`, whose 8-bit
    OR-ed bands keep candidates near-linear with comparable recall.
    Pairs split across buckets are missed with the usual LSH
    probability — bands/multiprobe recover recall.
    """
    hp = hyperplanes(planes, dims)
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(bucket_expr(vec_col, hp)).alias("bucket"),
        # norm once per vector, not once per candidate pair (identical
        # bits — see cosine_expr)
        F.expr(norm_expr(vec_col)).alias("_n"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn(
            "cos_full",
            F.expr(
                f"({dot_expr(f'a.{vec_col}', f'b.{vec_col}')}) / (a._n * b._n)"
            ),
        )
        .filter(F.col("cos_full") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cos_full", 6).alias("cos_sim"),
        )
    )


def embedding_neardup_pairs_banded(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    bands: int = 2,
    dims: int = 64,
) -> DataFrame:
    """Banded-LSH embedding near-duplicate pairs (the tunable-recall
    scale path; see module docstring for the bucket-size math).

    ``planes`` sign bits are split into ``bands`` sub-keys of
    ``planes/bands`` bits; a pair is a candidate when any band key
    matches (OR-amplification), then verified by exact cosine ≥
    ``threshold``.  Output ``(id_a, id_b, cos_sim)``, id_a < id_b,
    each pair once even when several bands agree.

    Two scale laws, both learned the hard way at sf10 (200k vectors,
    r6 — the run FILLED THE DISK with shuffle spill and died):

    * **Band width must grow with the corpus.**  An 8-bit band is a
      256-value fixed domain; bucket population — and candidate
      volume — grows quadratically with the corpus.  Size
      ``planes/bands`` ≈ log2(corpus) and recover recall with more
      bands (the registered catalog entry uses 12 × 16-bit bands:
      per-band recall p(0.95)^16 = 0.18, OR over 12 bands = 0.91 —
      the same target the old 4 × 8-bit geometry hit, at 1/256 the
      bucket density).
    * **Never shuffle vectors in the candidate stream.**  The
      band-join and pair-dedup below carry ONLY (id_a, id_b) — the
      payload rows are ~16 bytes, not ~550 (two 64-float vectors +
      norms), which is the difference between a 5 GB and a 170 GB
      dedup shuffle at 300M candidates.  Vectors re-join AFTER the
      dedup, once per surviving pair, and the cosine verify runs in
      the same stage as that join's probe (no further shuffle with
      vectors aboard).
    """
    if planes % bands:
        raise ValueError("planes must be divisible by bands")
    r = planes // bands
    hp = hyperplanes(planes, dims)
    # wide plane matrices (the 192-plane banded geometry) pay
    # planes × dims interpreted fold steps per row in SQL; the
    # fold-order-exact vectorized UDF is ~40× cheaper there and
    # bit-identical (see lsh_signature_udf).  Narrow signatures keep
    # the pure-SQL form (no Python worker round-trip for 4 planes).
    if planes * dims >= 2048:
        sig = corpus.select(
            F.col(id_col),
            lsh_signature_udf(hp)(F.col(vec_col)).alias("sig"),
        )
    else:
        sig = corpus.select(
            F.col(id_col),
            F.expr(bucket_expr(vec_col, hp)).alias("sig"),
        )
    # slim candidate stream: (id, band, band key) only.  The key stays
    # the EXACT sign substring (not a hash): the oracle's band join is
    # exact-key, and a 64-bit hash collision admitting a >=threshold
    # pair the exact join lacks would be a real (if one-in-billions)
    # parity break — unlike PassJoin, whose oracle is a complete
    # superset generator that absorbs collision extras.
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("sig", b * r + 1, r).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    withv = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(norm_expr(vec_col)).alias("_n"),
    )
    va = withv.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    vb = withv.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_full", F.expr(f"({dot_expr('_va', '_vb')}) / (_na * _nb)")
        )
        .filter(F.col("cos_full") >= threshold)
        .select("id_a", "id_b", F.round("cos_full", 6).alias("cos_sim"))
    )


def quantize_embeddings_int8(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the storage-scale path:
    4×–8× smaller than float32, enough precision for ANN candidate
    generation; re-rank with the float vectors).

    ``scale = max(|x|)``, ``q_i = floor(x_i / scale * 127 + 0.5)`` —
    floor(+0.5) instead of round() so both engines round identically
    (round() half-tie behavior differs across engines).  Zero vectors
    are dropped (no meaningful scale).  Output
    ``(id, scale, q)`` with ``q`` comma-joined (hashable for the
    differential harness; parquet storage would keep array<tinyint>).
    """
    with_scale = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(
            f"aggregate({vec_col}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        ).alias("_maxabs"),
    ).filter(F.col("_maxabs") > 0)
    return with_scale.select(
        F.col(id_col),
        (F.floor(F.col("_maxabs") * 1e6) / 1e6).alias("scale"),
        F.expr(
            f"concat_ws(',', transform({vec_col}, x -> "
            f"CAST(CAST(floor(CAST(x AS DOUBLE) / _maxabs * 127 + 0.5) AS INT) AS STRING)))"
        ).alias("q"),
    )


def label_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
    dims: int | None = None,
) -> DataFrame:
    """Coarse-quantizer codebook: per-label centroid vectors.

    Component means are rounded to ``decimals`` BEFORE any distance
    computation — double summation order differs between engines (and
    between cluster layouts), so the codebook is only reproducible
    after rounding; 6 decimals is far above the ~1e-13 accumulation
    noise and far below any meaningful centroid separation.
    Output: ``(label, centroid: array<double>)``.
    """
    per_dim = (
        corpus.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), decimals).alias("c"))
    )
    return per_dim.groupBy(label_col).agg(
        F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias(
            "centroid"
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    decimals: int = 6,
    dims: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd's k-means codebook — a real trained IVF
    coarse quantizer, reproducible bit-for-bit across engines and
    cluster layouts.

    Determinism levers (each one is load-bearing):

    * **init**: the ``k`` corpus vectors with the smallest
      ``md5(cast(id as string))`` — no RNG state, identical in any
      engine; selected via ``orderBy().limit(k)``
      (TakeOrderedAndProject, no global window over the corpus);
    * **assignment**: nearest centroid by cosine with the lowest-
      centroid-id tiebreak, computed as a ``max_by`` aggregation
      (map-side combine — the shuffle carries one row per vector,
      never one per (vector, centroid));
    * **update**: per-dimension mean ROUNDED to ``decimals`` before
      the next distance step — double accumulation order differs
      between engines and partition layouts, so un-rounded centroids
      would diverge; 6 decimals is far above the ~1e-13 noise floor;
    * **iterations**: a FIXED count (not a convergence test), so every
      run executes the identical computation; empty clusters keep
      their previous centroid.

    Train-once / assign-many: persist the returned ``(cid, centroid)``
    frame and feed it to :func:`ivf_topk` as ``codebook``.  Each
    iteration is one broadcast cross join (corpus × k, linear) + one
    aggregation; the k-row centroid frame is localCheckpoint'd per
    round to keep the plan flat.
    """
    base = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    seeds = (
        base.select(
            "_id", "_v", F.md5(F.col("_id").cast("string")).alias("_seed")
        )
        .orderBy(F.col("_seed").asc(), F.col("_id").asc())
        .limit(k)
    )
    # the window ranks only the k seed rows, but an empty partition
    # spec would still emit the global-window warning into every plan
    # embedding the codebook; pmod(hash, 1) is a constant-value yet
    # non-foldable partition key (a bare literal gets optimized away)
    w_seed = Window.partitionBy(F.pmod(F.hash("_id"), F.lit(1))).orderBy(
        F.col("_seed").asc(), F.col("_id").asc()
    )
    cents = (
        seeds.withColumn("_rn", F.row_number().over(w_seed))  # k rows only
        .select(
            (F.col("_rn") - 1).cast("int").alias("cid"),
            F.expr("transform(_v, x -> CAST(x AS DOUBLE))").alias("centroid"),
        )
        .localCheckpoint()
    )
    from ..functions.centroids import collect_codebook, nearest_centroid_udf

    for _ in range(iters):
        # assignment as one Arrow/NumPy kernel over the (checkpointed,
        # k-row) codebook — replaces the broadcast cross join +
        # interpreted cosine folds + max_by shuffle (guide §4.2); same
        # fold order and lowest-cid tiebreak, bit-identical cosines
        # (test_nearest_lists_kernel_matches_sql_form covers the
        # shared kernel).
        labels, matrix, ddl = collect_codebook(cents, "cid")
        kern = nearest_centroid_udf(labels, matrix, ddl)
        assigned = base.select(
            kern(F.col("_v"))["label"].alias("cid"), "_v"
        )
        new_cents = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), decimals).alias("c"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)"
                ).alias("_new")
            )
        )
        cents = (
            cents.join(new_cents, "cid", "left")
            .select("cid", F.coalesce("_new", "centroid").alias("centroid"))
            .localCheckpoint()
        )
    return cents


def _nearest_lists(
    df: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    keep: int,
    codebook: tuple | None = None,
) -> DataFrame:
    """Assign each vector to its ``keep`` nearest inverted lists by
    cosine (deterministic lowest-``list_label`` tiebreak).

    ``cents`` is a ``(list_label, centroid, ...)`` codebook frame.
    Shared by :func:`ivf_topk` (coarse assignment + probing) and
    :func:`ivf_pq_adc_topk` (same topology feeding the PQ encoder).

    r12 (guide §4.2): the assignment is ONE Arrow/NumPy kernel with
    the codebook in a driver-collected closure — the former broadcast
    cross join + interpreted ``aggregate(zip_with(...))`` cosine folds
    (k × dims lambda steps per vector, the r11-measured dominant term
    of the sf10 IVF family) + ``max_by``/window reduction collapse to
    a single Python eval with no shuffle of its own.  Bit-equivalence
    (same fold order, same NaN/tie semantics) is held by
    ``test_nearest_lists_kernel_matches_sql_form``.  Callers sharing
    one codebook across several assignments pass the pre-collected
    ``codebook=collect_codebook(cents, "list_label")``.
    """
    from ..functions.centroids import (
        collect_codebook,
        nearest_centroid_udf,
        topk_centroid_udf,
    )

    labels, matrix, ddl = codebook or collect_codebook(cents, "list_label")
    if keep == 1:
        kern = nearest_centroid_udf(labels, matrix, ddl)
        return df.withColumn("_m", kern(F.col(vec_col))).select(
            id_col, F.col("_m.label").alias("list_label"), vec_col
        )
    kern = topk_centroid_udf(labels, matrix, ddl, keep)
    return df.withColumn("list_label", F.explode(kern(F.col(vec_col))))


def ivf_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 2,
    codebook: DataFrame | None = None,
    dims: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into inverted
    lists (nearest centroid by cosine, deterministic label tiebreak),
    probe the query's ``nprobe`` nearest lists, rank candidates by
    exact cosine.

    The codebook is either a trained quantizer passed as ``codebook``
    (``(cid, centroid)`` from :func:`kmeans_centroids` — train once,
    assign many) or, by default, the label-space stand-in from
    :func:`label_centroids`.  The cross join is corpus × k centroids —
    linear in the corpus — and the candidate search touches only
    ``nprobe/k`` of the corpus in expectation.
    """
    query_ids = query_ids or [0, 1, 2]
    if codebook is not None:
        cents = codebook.select(
            F.col(codebook.columns[0]).alias("list_label"), "centroid"
        )
    else:
        cents = label_centroids(corpus, vec_col, label_col, dims=dims).select(
            F.col(label_col).alias("list_label"), "centroid"
        )
    # one driver collect of the k-row codebook, shared by both
    # assignment kernels (corpus lists + query probes) — the SQL form
    # broadcast the same k rows to every executor and re-executed the
    # codebook subtree per assignment site
    from ..functions.centroids import collect_codebook

    cb = collect_codebook(cents, "list_label")

    def assign(df: DataFrame, keep: int) -> DataFrame:
        return _nearest_lists(df, cents, id_col, vec_col, keep, codebook=cb)

    base = corpus.select(id_col, vec_col)
    # candidate re-rank reuses the same precomputed-norm identity:
    # each corpus vector's norm once (not once per probing query), each
    # query's norm once (not once per candidate)
    lists = assign(base, 1).withColumn("_vn", F.expr(norm_expr(vec_col)))
    probes = assign(base.filter(F.col(id_col).isin(query_ids)), nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "list_label",
        F.expr(norm_expr(vec_col)).alias("_qn"),
    )
    scored = (
        lists.join(F.broadcast(probes), "list_label")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_full",
            F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)"),
        )
    )
    # two-phase top-k (see brute_force_topk): probed lists are
    # nprobe/k of the corpus — still corpus-scale, so bound the final
    # per-query window to LOCAL_PRUNE_GROUPS * k rows
    scored = scored.withColumn(
        "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    scored = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_grp", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def matryoshka_rerank_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
    prefix_dims: int = 16,
    shortlist: int = 25,
) -> DataFrame:
    """Two-stage Matryoshka retrieval (Kusupati et al. 2022): a coarse
    pass scores only the first ``prefix_dims`` components of every
    vector (MRL-trained embeddings front-load information, so the
    prefix is a usable low-cost proxy), keeps a ``shortlist`` per
    query, then re-ranks the shortlist with the FULL-dimension exact
    cosine.

    100 TB shape: the coarse pass is the expensive corpus scan and it
    folds ``prefix_dims/dims`` of the arithmetic (4× less at the
    catalog geometry — and with the prefix stored as its own column,
    4× less I/O too); the re-rank touches ``queries × shortlist`` rows
    only.  Both passes are the proven two-phase top-k plan (broadcast
    queries, per-hash-group partial rank, bounded final window).
    Exactness: the final ranking is true cosine on the shortlist; the
    only approximation is shortlist recall, measurable with the
    ``ann_recall_eval`` pattern.
    """
    query_ids = query_ids or [0, 1, 2]
    pre = f"slice({vec_col}, 1, {prefix_dims})"
    queries = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_expr(vec_col)).alias("_qn"),
        F.expr(f"slice({vec_col}, 1, {prefix_dims})").alias("qpre"),
        F.expr(norm_expr(f"slice({vec_col}, 1, {prefix_dims})")).alias("_qpn"),
    )
    coarse = (
        corpus.withColumn("_vpn", F.expr(norm_expr(pre)))
        .crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_pre",
            F.expr(f"({dot_expr('qpre', pre)}) / (_qpn * _vpn)"),
        )
        .withColumn(
            "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
        )
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("cos_pre").desc(), F.col(id_col).asc()
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("cos_pre").desc(), F.col(id_col).asc()
    )
    shortlisted = (
        coarse.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= shortlist)
        .withColumn("_sr", F.row_number().over(w_short))
        .filter(F.col("_sr") <= shortlist)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        shortlisted.withColumn("_vn", F.expr(norm_expr(vec_col)))
        .withColumn(
            "cos_full",
            F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def hard_negative_mining(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_ids: list[int] | None = None,
    k_pos: int = 1,
    k_neg: int = 5,
) -> DataFrame:
    """Contrastive-pair mining for embedding-model training: for each
    anchor, the ``k_pos`` nearest SAME-label vectors (positives) and
    the ``k_neg`` nearest DIFFERENT-label vectors (hard negatives —
    the closest wrong-class items are exactly the pairs a contrastive
    loss learns most from; Xiong et al. 2021 ANCE).

    Output ``(query_id, vec_id, label, role, cos_sim, rank)`` with
    ``role ∈ {{'pos', 'neg'}}`` and rank dense within (anchor, role).

    Scale shape: one broadcast-anchor corpus scan (the exact-mining
    baseline; a production ANCE loop would swap the scan for the IVF
    probe path in :func:`ivf_topk` between training epochs), then the
    proven two-phase top-k per (anchor, role) — the role just extends
    the ranking key, so the partial windows stay partition-parallel.
    """
    query_ids = query_ids or [0, 1, 2]
    anchors = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
        F.expr(norm_expr(vec_col)).alias("_qn"),
    )
    scored = (
        corpus.withColumn("_vn", F.expr(norm_expr(vec_col)))
        .crossJoin(F.broadcast(anchors))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_full", F.expr(f"({dot_expr('qvec', vec_col)}) / (_qn * _vn)")
        )
        .withColumn(
            "role",
            F.when(F.col(label_col) == F.col("qlabel"), "pos").otherwise("neg"),
        )
        .withColumn("_cap", F.when(F.col("role") == "pos", k_pos).otherwise(k_neg))
        .withColumn(
            "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
        )
    )
    w_local = Window.partitionBy("query_id", "role", "_grp").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    w = Window.partitionBy("query_id", "role").orderBy(
        F.col("cos_full").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= F.col("_cap"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("_cap"))
        .select(
            "query_id",
            F.col(id_col),
            F.col(label_col),
            "role",
            F.round("cos_full", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _pq_book_lit(book: list[list[float]]) -> str:
    """One subspace codebook as a Spark SQL nested-array literal."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(repr(x) + "D" for x in row) + ")"
            for row in book
        )
        + ")"
    )


def _sq_l2_agg(sub: str, cent: str) -> str:
    """Squared L2 between two small arrays as an in-order double fold
    (``aggregate`` starts at 0D; DuckDB's ``list_reduce`` folds the
    same element order, so both engines produce identical bits)."""
    return (
        f"aggregate(zip_with({sub}, {cent}, (p, q) -> (p - q) * (p - q)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def build_ivfpq_index(
    corpus: DataFrame,
    pq_book: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dims: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable halves of an IVF-PQ index:
    ``(codebook, lists)`` — the coarse quantizer ``(list_label,
    centroid)`` and the encoded corpus ``(id, list_label, code0..N)``.

    Both frames are plain columnar tables: write them to parquet once
    (train-once / search-many) and hand them back to
    :func:`ivf_pq_adc_topk` via ``index=`` — the round trip is
    bit-lossless (ints + 6-dp-rounded doubles; equivalence test
    ``test_ivfpq_index_parquet_roundtrip``).  At 100 TB the lists
    table is the ~subspaces-bytes-per-vector artifact that replaces
    the raw float corpus for candidate scoring.
    """
    from ..functions.centroids import collect_codebook

    subspaces = len(pq_book)
    subdim = len(pq_book[0][0])
    cents = label_centroids(corpus, vec_col, label_col, dims=dims).select(
        F.col(label_col).alias("list_label"), "centroid"
    )
    # one execution of the codebook aggregation (the driver collect);
    # the residual join and the returned codebook frame are rebuilt as
    # a literal frame from the SAME collected doubles — bit-identical
    # values, and the corpus is no longer re-scanned once per codebook
    # reference (the SQL form embedded the aggregation subtree 3×)
    cb = collect_codebook(cents, "list_label")
    labels, matrix, ddl = cb
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(lbl, [float(x) for x in row]) for lbl, row in zip(labels, matrix)],
        schema=f"list_label {ddl}, centroid array<double>",
    )
    cent_only = F.broadcast(cents)
    base = corpus.select(id_col, vec_col)
    # residual + per-subspace nearest-code as ONE Arrow/NumPy kernel
    # (r11, guide §4.2): the HOF chain (zip_with residual, then
    # transform/aggregate distances per subspace) interprets ~1024
    # lambda steps per vector — the dominant term of the sf10 IVF-PQ
    # entries.  The kernel runs the same left-to-right folds
    # vectorized; bit-equivalence to the HOF chain is held by
    # test_pq_residual_codes_udf_matches_hof_chain.
    from ..functions.pq import pq_residual_codes_udf

    codes_kernel = pq_residual_codes_udf(pq_book)
    enc = (
        _nearest_lists(base, cents, id_col, vec_col, 1, codebook=cb)
        .join(cent_only, "list_label")
        .withColumn("_codes", codes_kernel(F.col(vec_col), F.col("centroid")))
    )
    lists = enc.select(
        id_col,
        "list_label",
        *[F.col(f"_codes.code{s}").alias(f"code{s}") for s in range(subspaces)],
    )
    return cents, lists


def ivf_pq_adc_topk(
    corpus: DataFrame,
    pq_book: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 2,
    dims: int | None = None,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ with asymmetric distance computation (ADC) — the faiss
    ``IndexIVFPQ`` layout, the standard billion-vector search memory
    hierarchy, on pure DataFrame ops.

    Index build (one corpus pass, all codegen arithmetic):

    * coarse-quantize each vector to its nearest inverted list
      (:func:`label_centroids` codebook, cosine, lowest-label
      tiebreak — the same topology as :func:`ivf_topk`);
    * PQ-encode the RESIDUAL ``x − centroid`` (residual encoding is
      what separates IVF-PQ from flat PQ: residuals are centered, so
      a small codebook covers them far better than raw vectors):
      each ``subdim``-wide slice is assigned to its nearest codebook
      row (first-min tiebreak via ``array_position``/``array_min`` —
      the parity-proven scheme from the ``embedding_pq_codes``
      entry).  A vector stores only ``(list_label, codes)`` —
      ``subspaces`` small ints instead of ``dims`` floats.

    Search (asymmetric: query side exact, database side quantized):

    * probe the query's ``nprobe`` nearest lists;
    * per (query, probed list), build the ADC lookup table: LUT[s][c]
      = ||qres_s − book[s][c]||² for all codebook rows — ``subspaces ×
      centroids`` squared distances computed ONCE per probe, not per
      candidate;
    * per candidate, approx distance = Σ_s LUT[s][code_s] — a fixed
      ``subspaces`` array lookups (``element_at``), no per-candidate
      vector math.  The LUT frame is queries × nprobe rows —
      broadcast; candidates stream through a hash join on
      ``list_label`` touching only probed lists.

    100 TB shape: codes are ~``subspaces`` bytes/vector (64× smaller
    than float32 at the catalog geometry), the scan is
    partition-parallel over probed lists only, and the per-candidate
    cost is lookups, not flops.  Determinism: centroids are 6-dp
    rounded, every fold is in-order double arithmetic, distances are
    floor-scaled on output — the DuckDB oracle reproduces the result
    bit-for-bit.
    """
    query_ids = query_ids or [0, 1, 2]
    subspaces = len(pq_book)
    subdim = len(pq_book[0][0])

    if index is None:
        index = build_ivfpq_index(
            corpus, pq_book, id_col, vec_col, label_col, dims=dims
        )
    codebook, lists = index
    cents = codebook.select("list_label", "centroid")
    cent_only = F.broadcast(cents)
    base = corpus.select(id_col, vec_col)

    # ---- search: probe lists, build per-probe ADC LUTs --------------
    probes = (
        _nearest_lists(
            base.filter(F.col(id_col).isin(query_ids)),
            cents,
            id_col,
            vec_col,
            nprobe,
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            "list_label",
        )
        .join(cent_only, "list_label")
        .withColumn(
            "_qres",
            F.expr("zip_with(qvec, centroid, (x, c) -> CAST(x AS DOUBLE) - c)"),
        )
    )
    for s in range(subspaces):
        sub = f"slice(_qres, {s * subdim + 1}, {subdim})"
        probes = probes.withColumn(
            f"_lut{s}",
            F.expr(
                f"transform({_pq_book_lit(pq_book[s])}, "
                f"cent -> {_sq_l2_agg(sub, 'cent')})"
            ),
        )
    probes = probes.select(
        "query_id", "list_label", *[f"_lut{s}" for s in range(subspaces)]
    )

    scored = lists.join(F.broadcast(probes), "list_label").filter(
        F.col(id_col) != F.col("query_id")
    )
    adc = F.element_at(F.col("_lut0"), F.col("code0"))
    for s in range(1, subspaces):
        adc = adc + F.element_at(F.col(f"_lut{s}"), F.col(f"code{s}"))
    scored = scored.withColumn("_adc", adc)

    # two-phase top-k (ascending distance; see brute_force_topk)
    scored = scored.withColumn(
        "_grp", F.pmod(F.hash(F.col(id_col)), F.lit(LOCAL_PRUNE_GROUPS))
    )
    w_local = Window.partitionBy("query_id", "_grp").orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    scored = (
        scored.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_grp", "_lr")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            (F.floor(F.col("_adc") * 1e6) / 1e6).alias("adc_dist"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    tau: float = 0.5,
    codebook: DataFrame | None = None,
    train_sample: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with k-means, then within each cluster drop every
    vector that has a semantic duplicate (cosine >= ``tau``) which is
    LESS similar to the cluster centroid — the paper's keep-the-
    outlier rule (low centroid similarity = more informative example;
    ties break to the lowest id).

    Output per vector: ``(id, cid, cent_cos, kept)`` — cluster
    assignment, 6-dp-rounded cosine to the assigned centroid, and the
    keep decision.  All comparisons (pair cosine vs ``tau``, the
    centroid-similarity order) use 6-dp-rounded values so the DuckDB
    oracle reproduces the decision bit-for-bit.

    Scale shape: the quadratic step is confined WITHIN clusters (the
    paper's own design — its pairwise pass runs per cluster), reached
    by an equi-join on ``cid``, never a corpus-wide self-join.  ``k``
    is the blocking knob: it should grow with the corpus so the
    expected cluster size (N/k) stays bounded — the same "key domain
    scales with log2(corpus)" law the LSH/simhash tiers follow — and
    AQE skew-splits any oversized cluster's join.  The codebook train
    is an N×k broadcast cross join per iteration, so at large N×k
    ``train_sample`` caps it: the codebook trains on the ``m`` corpus
    vectors with the smallest ``md5(id)`` (deterministic, engine-
    independent, a superset of the k seeds — the paper itself trains
    its quantizer on a subset), while ASSIGNMENT still scans the full
    corpus exactly once.  Pass a pre-trained ``codebook`` to amortize
    training across runs.
    """
    if codebook is None:
        train = corpus
        if train_sample is not None:
            train = md5_sample(corpus, id_col, vec_col, train_sample)
        codebook = kmeans_centroids(
            train, id_col, vec_col, k=k, iters=iters
        )
    base = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_vn", F.expr(norm_expr("_v")))
    # assignment = the shared Arrow/NumPy argmax kernel (guide §4.2);
    # same bits as the former broadcast cross join + max_by reduction
    assigned = _argmax_centroid(base, codebook, "cid").select(
        "_id",
        "cid",
        "_v",
        "_vn",
        F.round(F.col("cos_c"), 6).alias("cent_cos"),
    )
    return _keep_outlier(assigned, id_col, tau)


def dot_udf():
    """Arrow-batched dot product of two array columns, BIT-IDENTICAL
    to the SQL fold ``dot_expr`` emits — the same safety argument as
    :func:`lsh_signature_udf`: numpy's own reductions (pairwise/BLAS
    summation) reorder additions and would flip 6-dp-rounded cosines,
    so the accumulation loops SEQUENTIALLY over the dimension axis,
    vectorizing only across rows; each dot is the exact left-to-right
    IEEE sum ``((0 + a1·b1) + a2·b2) + …``.  Elements widen
    float32→float64 exactly (same as the fold's per-element CAST).

    Why it exists: SemDeDup's within-cluster pair pass evaluates ~10^7
    cosines at sf10 and the SQL fold interprets its lambda per element
    (dims × pairs interpreted steps); this is the same ~40× vectorize
    the signature path already took.  Null/ragged rows yield null.
    ``test_dot_udf_matches_sql_fold`` holds the bit-equivalence.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _dot(a, b):
        va, vb = a.to_numpy(), b.to_numpy()
        n = len(va)
        out = np.full(n, np.nan)
        good = [
            i
            for i in range(n)
            if va[i] is not None
            and vb[i] is not None
            and len(va[i]) == len(vb[i])
        ]
        if good:
            A = np.stack([np.asarray(va[i], dtype=np.float64) for i in good])
            B = np.stack([np.asarray(vb[i], dtype=np.float64) for i in good])
            acc = np.zeros(A.shape[0])
            for d in range(A.shape[1]):  # sequential over dims = fold order
                acc += A[:, d] * B[:, d]
            out[good] = acc
        return pd.Series(out)

    return pandas_udf(_dot, "double")


def _pair_cos6(na: str, nb: str):
    """6-dp-rounded pair cosine from the exact-fold dot UDF and the
    precomputed norms — the shared verify expression of the SemDeDup
    pair passes."""
    return F.round(F.col("_dot") / (F.col(na) * F.col(nb)), 6)


def _keep_outlier(assigned: DataFrame, id_col: str, tau: float) -> DataFrame:
    """The SemDeDup keep-the-outlier decision over an ``assigned``
    frame ``(_id, cid, _v, _vn, cent_cos)``: within each cluster
    (equi-join on ``cid`` — never corpus-wide), drop every vector with
    a 6-dp-rounded-cosine >= ``tau`` neighbor that is MORE central
    (higher ``cent_cos``; ties break to the lowest id)."""
    a = assigned.select(
        F.col("_id").alias("id_a"),
        F.col("cid"),
        F.col("_v").alias("_va"),
        F.col("_vn").alias("_na"),
        F.col("cent_cos").alias("cc_a"),
    )
    b = assigned.select(
        F.col("_id").alias("id_b"),
        F.col("cid"),
        F.col("_v").alias("_vb"),
        F.col("_vn").alias("_nb"),
        F.col("cent_cos").alias("cc_b"),
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("_dot", dot_udf()(F.col("_va"), F.col("_vb")))
        .filter(_pair_cos6("_na", "_nb") >= F.lit(tau))
        .filter(
            (F.col("cc_b") < F.col("cc_a"))
            | ((F.col("cc_b") == F.col("cc_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("_id"))
        .distinct()
    )
    return (
        assigned.join(
            dropped.withColumn("_dup", F.lit(True)), "_id", "left"
        )
        .select(
            F.col("_id").alias(id_col),
            "cid",
            "cent_cos",
            (~F.coalesce(F.col("_dup"), F.lit(False))).alias("kept"),
        )
    )


def md5_sample(
    corpus: DataFrame, id_col: str, vec_col: str, n: int
) -> DataFrame:
    """The ``n`` corpus vectors with the smallest ``md5(id)`` —
    deterministic, engine-independent train sample (selected via
    ``orderBy().limit(n)`` = TakeOrderedAndProject, no global window)."""
    return (
        corpus.select(
            id_col,
            vec_col,
            F.md5(F.col(id_col).cast("string")).alias("_seed"),
        )
        .orderBy(F.col("_seed").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("_seed")
    )


def kmeans_centroids_grouped(
    members: DataFrame,
    group_col: str,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 3,
    decimals: int = 6,
    fallback: DataFrame | None = None,
) -> DataFrame:
    """Per-group deterministic Lloyd's k-means: an independent ``k``-
    centroid codebook inside EVERY group, trained in one shared set of
    jobs (the group key just rides along).  This is the fine level of
    a hierarchical (IVF-style) quantizer: the coarse level splits the
    corpus into cells, this trains ``k`` sub-centroids per cell, and
    assignment probes coarse-then-fine — ``O(k1 + k2)`` centroid
    scores per vector instead of ``O(k1 x k2)``.

    Determinism levers are the grouped analogs of
    :func:`kmeans_centroids`: seeds = the ``<=k`` members of each group
    with the smallest ``md5(id)`` (``scid`` = that rank - 1);
    assignment = nearest sub-centroid WITHIN the member's own group
    (members never migrate between groups), lowest-``scid`` tiebreak,
    computed as a map-side-combining ``max_by``; update = per-dim mean
    rounded to ``decimals``; fixed iteration count; empty
    ``(group, scid)`` slots keep their previous centroid.

    ``fallback``: a ``(group_col, centroid)`` frame (e.g. the coarse
    codebook) providing a single ``scid=0`` centroid for groups with
    NO members — without it, corpus vectors coarse-assigned to a
    member-less cell would silently vanish from the fine join.

    Returns ``(group_col, scid, centroid)``.
    """
    base = members.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    w_seed = Window.partitionBy("_g").orderBy(
        F.md5(F.col("_id").cast("string")).asc(), F.col("_id").asc()
    )
    cents = (
        base.withColumn("_rn", F.row_number().over(w_seed))
        .filter(F.col("_rn") <= k)
        .select(
            "_g",
            (F.col("_rn") - 1).cast("int").alias("scid"),
            F.expr("transform(_v, x -> CAST(x AS DOUBLE))").alias("centroid"),
        )
    )
    if fallback is not None:
        orphan = (
            fallback.select(
                F.col(fallback.columns[0]).alias("_g"), "centroid"
            )
            .join(cents.select("_g").distinct(), "_g", "left_anti")
            .select(
                "_g",
                F.lit(0).cast("int").alias("scid"),
                F.expr("transform(centroid, x -> CAST(x AS DOUBLE))").alias(
                    "centroid"
                ),
            )
        )
        cents = cents.unionByName(orphan)
    cents = cents.localCheckpoint()
    from ..functions.centroids import (
        _label_sort_key,
        nearest_centroid_grouped_udf,
    )

    for _ in range(iters):
        # grouped assignment as one Arrow/NumPy kernel over the
        # (checkpointed, k-per-group) codebook — replaces the
        # broadcast equi-join + interpreted cosine folds + max_by
        # shuffle (guide §4.2); same fold order and lowest-scid
        # tiebreak, bit-identical cosines.
        group_books: dict = {}
        for r in cents.select("_g", "scid", "centroid").collect():
            group_books.setdefault(r[0], []).append((r[1], r[2]))
        books = {}
        for g, pairs in group_books.items():
            pairs.sort(key=lambda p: _label_sort_key(p[0]))
            books[g] = ([p[0] for p in pairs], [p[1] for p in pairs])
        kern = nearest_centroid_grouped_udf(books, "int")
        assigned = base.select(
            "_g", kern(F.col("_v"), F.col("_g"))["label"].alias("scid"), "_v"
        )
        new_cents = (
            assigned.select("_g", "scid", F.posexplode("_v").alias("pos", "v"))
            .groupBy("_g", "scid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), decimals).alias("c"))
            .groupBy("_g", "scid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)"
                ).alias("_new")
            )
        )
        cents = (
            cents.join(new_cents, ["_g", "scid"], "left")
            .select(
                "_g", "scid", F.coalesce("_new", "centroid").alias("centroid")
            )
            .localCheckpoint()
        )
    return cents.withColumnRenamed("_g", group_col)


def _argmax_centroid(
    df: DataFrame,
    cents: DataFrame,
    cid_col: str,
    join_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid argmax: ``df (_id, _v, _vn, [join_col])`` x a
    small ``cents (cid_col, centroid, [join_col])`` codebook -> one
    row per vector with the winning ``cid_col`` and its UNROUNDED
    ``cos_c``.  Tiebreak = lowest ``cid_col``.  With ``join_col`` the
    scoring is probe-pruned to the row's own cell.

    r12 (guide §4.2): one Arrow/NumPy kernel with the driver-collected
    codebook in its closure — replaces the broadcast (cross/equi) join
    + interpreted cosine folds + ``max_by`` shuffle; same fold order,
    NaN/tie semantics (``test_argmax_centroid_kernel_matches_sql_form``).
    In the ``join_col`` form, rows whose cell has no codebook entry
    are dropped, exactly as the former inner equi-join did (the
    two-level flows guarantee a fallback centroid per cell, so none
    are in practice).
    """
    from ..functions.centroids import (
        collect_codebook,
        nearest_centroid_grouped_udf,
        nearest_centroid_udf,
    )

    if join_col is None:
        labels, matrix, ddl = collect_codebook(cents, cid_col)
        kern = nearest_centroid_udf(labels, matrix, ddl)
        return df.withColumn("_m", kern(F.col("_v"))).select(
            "_id",
            F.col("_m.label").alias(cid_col),
            "_v",
            "_vn",
            F.col("_m.cos").alias("cos_c"),
        )
    from ..functions.centroids import _label_sort_key

    ddl = cents.schema[cid_col].dataType.simpleString()
    group_books: dict = {}
    for r in cents.select(join_col, cid_col, "centroid").collect():
        group_books.setdefault(r[0], []).append((r[1], r[2]))
    books = {}
    for g, pairs in group_books.items():
        pairs.sort(key=lambda p: _label_sort_key(p[0]))
        books[g] = ([p[0] for p in pairs], [p[1] for p in pairs])
    kern = nearest_centroid_grouped_udf(books, ddl)
    return (
        df.withColumn("_m", kern(F.col("_v"), F.col(join_col)))
        .filter(F.col("_m.label").isNotNull())
        .select(
            "_id",
            F.col("_m.label").alias(cid_col),
            "_v",
            "_vn",
            F.col("_m.cos").alias("cos_c"),
            join_col,
        )
    )


def semantic_dedup_two_level(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 8,
    iters: int = 3,
    tau: float = 0.5,
    train_sample: int | None = None,
) -> DataFrame:
    """SemDeDup with a hierarchical (coarse -> fine) quantizer — the
    100 TB form of :func:`semantic_dedup`.

    Why two levels: SemDeDup's pair pass is linear in N only if the
    cluster width stays FIXED as the corpus grows, which forces the
    cluster count k to grow ~N — and then single-level nearest-
    centroid assignment (N x k scores) is the new quadratic term.
    Hierarchy splits k into k1 coarse cells x k2 sub-centroids each:
    train is two capped-sample Lloyd's runs (coarse over the sample,
    then per-cell fine via :func:`kmeans_centroids_grouped`), and
    full-corpus assignment scores k1 + k2 centroids per vector
    (coarse argmax, then fine argmax probe-pruned to the winning
    cell) — every stage is O(N · (k1 + k2)) with k1 ≈ k2 ≈ √k, and the
    pair pass stays O(N · cluster_width).  This is the IVF probe
    topology of :func:`ivf_topk` applied to the quantizer itself.

    Fully deterministic (md5 seeds, fixed iterations, 6-dp rounding,
    lowest-id tiebreaks) so a DuckDB oracle reproduces the keep
    decision bit-for-bit.  Output schema matches
    :func:`semantic_dedup`: ``(id, cid, cent_cos, kept)`` with
    ``cid = coarse_cid * k2 + sub_cid`` (bigint).
    """
    coarse, fine = two_level_codebook(
        corpus, id_col, vec_col, k1=k1, k2=k2, iters=iters,
        train_sample=train_sample,
    )
    assigned = _assign_two_level(corpus, id_col, vec_col, coarse, fine, k2)
    return _keep_outlier(assigned, id_col, tau)


def two_level_codebook(
    train: DataFrame,
    id_col: str,
    vec_col: str,
    k1: int,
    k2: int,
    iters: int = 3,
    train_sample: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the hierarchical quantizer: coarse Lloyd's over the
    (md5-capped) train corpus, then per-cell fine Lloyd's with a
    coarse-centroid fallback for member-less cells.  Returns
    ``(coarse(cid, centroid), fine(ccid, scid, centroid))`` — persist
    both to amortize training across runs (train-once / assign-many,
    the same contract as :func:`kmeans_centroids` + :func:`ivf_topk`)."""
    if train_sample is not None:
        train = md5_sample(train, id_col, vec_col, train_sample)
    coarse = kmeans_centroids(train, id_col, vec_col, k=k1, iters=iters)
    tbase = train.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_vn", F.expr(norm_expr("_v")))
    t_assigned = _argmax_centroid(tbase, coarse, "cid").select(
        F.col("cid").alias("ccid"), F.col("_id"), F.col("_v")
    )
    fine = kmeans_centroids_grouped(
        t_assigned, "ccid", "_id", "_v", k=k2, iters=iters,
        fallback=coarse.select(F.col("cid").alias("ccid"), "centroid"),
    )
    return coarse, fine


def _assign_two_level(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    coarse: DataFrame,
    fine: DataFrame,
    k2: int,
) -> DataFrame:
    """Coarse-then-fine probe-pruned assignment: k1 + k2 centroid
    scores per vector, both levels broadcast.  Returns the SemDeDup
    ``assigned`` frame ``(_id, cid, _v, _vn, cent_cos)`` with
    ``cid = ccid * k2 + scid`` (bigint)."""
    base = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_vn", F.expr(norm_expr("_v")))
    casg = _argmax_centroid(base, coarse, "cid").select(
        "_id", "_v", "_vn", F.col("cid").alias("ccid")
    )
    fasg = _argmax_centroid(casg, fine, "scid", join_col="ccid")
    return fasg.select(
        "_id",
        (
            F.col("ccid").cast("bigint") * F.lit(k2) + F.col("scid")
        ).alias("cid"),
        "_v",
        "_vn",
        F.round(F.col("cos_c"), 6).alias("cent_cos"),
    )


def semantic_dedup_incremental(
    base: DataFrame,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 8,
    iters: int = 3,
    tau: float = 0.5,
    train_sample: int | None = None,
    codebooks: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Incremental SemDeDup — dedup a NEW batch against an EXISTING
    corpus without re-clustering or re-judging it (the embedding-space
    sibling of :func:`operators.dedup.incremental_minhash_pairs`).

    A 100 TB corpus is never semantically re-deduped when a day's
    embeddings land: the quantizer is trained on (a capped sample of)
    the BASE corpus — or passed in as ``codebooks`` = the persisted
    ``(coarse, fine)`` pair — base and batch are assigned
    coarse-then-fine, and the keep decision is evaluated for BATCH
    vectors only:

    * drop ``v ∈ batch`` if a same-fine-cluster ``u ∈ base`` has
      rounded cosine ≥ ``tau`` — the corpus already contains that
      content (base rows were judged at their own ingestion);
    * or if a same-cluster ``u ∈ batch`` has cosine ≥ ``tau`` and is
      MORE outlier (lower ``cent_cos``; ties to the lower id) — the
      standard keep-the-outlier rule among the new rows.

    base × base pairs are never generated: the pair join probes the
    cluster index with the batch side only, so the quadratic-confined
    pass costs O(|batch| · cluster_width), not O(N · width).  Output
    matches :func:`semantic_dedup_two_level` restricted to the batch:
    ``(id, cid, cent_cos, kept)``.
    """
    if codebooks is None:
        codebooks = two_level_codebook(
            base, id_col, vec_col, k1=k1, k2=k2, iters=iters,
            train_sample=train_sample,
        )
    coarse, fine = codebooks
    a_base = _assign_two_level(base, id_col, vec_col, coarse, fine, k2)
    a_batch = _assign_two_level(batch, id_col, vec_col, coarse, fine, k2)
    a = a_batch.select(
        F.col("_id").alias("id_a"),
        F.col("cid"),
        F.col("_v").alias("_va"),
        F.col("_vn").alias("_na"),
        F.col("cent_cos").alias("cc_a"),
    )
    b = (
        a_base.withColumn("_isb", F.lit(True))
        .unionByName(a_batch.withColumn("_isb", F.lit(False)))
        .select(
            F.col("_id").alias("id_b"),
            F.col("cid"),
            F.col("_v").alias("_vb"),
            F.col("_vn").alias("_nb"),
            F.col("cent_cos").alias("cc_b"),
            "_isb",
        )
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("_dot", dot_udf()(F.col("_va"), F.col("_vb")))
        .filter(_pair_cos6("_na", "_nb") >= F.lit(tau))
        .filter(
            F.col("_isb")
            | (F.col("cc_b") < F.col("cc_a"))
            | ((F.col("cc_b") == F.col("cc_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("_id"))
        .distinct()
    )
    return (
        a_batch.join(
            dropped.withColumn("_dup", F.lit(True)), "_id", "left"
        )
        .select(
            F.col("_id").alias(id_col),
            "cid",
            "cent_cos",
            (~F.coalesce(F.col("_dup"), F.lit(False))).alias("kept"),
        )
    )
