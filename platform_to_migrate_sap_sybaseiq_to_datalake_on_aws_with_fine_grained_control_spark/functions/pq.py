"""Product-quantization codebook constants and derivation.

Lives under ``functions/`` (imports nothing from the catalog modules)
so both ``query_catalog_mining`` (the ``embedding_pq_codes`` entry)
and ``query_catalog_ml`` (the IVF-PQ ADC entry) can share it without
a registration-order import cycle.
"""

from __future__ import annotations

import hashlib

__all__ = [
    "PQ_SUBSPACES",
    "PQ_SUBDIM",
    "PQ_CENTROIDS",
    "pq_codebook",
    "pq_encode_udf",
    "pq_residual_codes_udf",
]

PQ_SUBSPACES = 8  # product quantization: 64 dims -> 8 subvectors
PQ_SUBDIM = 8  # dims per subvector
PQ_CENTROIDS = 16  # codebook size per subspace (4-bit codes)


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


def pq_encode_udf(codebook: list[list[list[float]]]):
    """Arrow-batched pandas UDF computing the SAME ``(codes, mse)`` the
    unrolled-literal SQL form (``_pq_spark_sql``) emits, BIT-IDENTICALLY,
    but vectorized across rows with NumPy (guide §4.2: hand whole
    batches to native kernels).

    Why it exists: the straight-line SQL tree is the right *execution*
    shape (primitive doubles in codegen), but at subspaces × centroids
    × subdim = 1024 squared-diff terms the expression tree is ~100 KB —
    Catalyst re-analyzes/optimizes it on EVERY action (~2-3 s flat per
    execution at any scale) and Janino compiles a huge method once per
    session.  The kernel's plan node is one ArrowEvalPython over
    (vec_id, embedding); per batch it runs 1024 vectorized NumPy ops
    regardless of row count — measured ~6x faster at sf0.1 AND faster
    at sf10 (the regime the unrolled form was built for).

    Why it is bit-safe (the ``lsh_signature_udf`` precedent): every
    accumulation below is SEQUENTIAL over the dimension/subspace axis,
    vectorizing only across rows — each distance is the exact
    left-to-right IEEE sum ``((t0 + t1) + t2) + …`` the SQL text
    parses to, the argmin is first-min like ``array_position(d,
    array_min(d))``, floats widen exactly (float32 -> float64 ==
    ``CAST(x AS DOUBLE)``), and the mse readout replays the literal
    ``floor(err / {S*D} * 10000) / 10000`` arithmetic.
    ``test_pq_encode_udf_matches_sql_form`` holds the equivalence
    against the SQL form; the DuckDB oracle holds it cross-engine.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    CB = np.array(codebook, dtype=np.float64)  # (subspaces, cents, subdim)
    S, C, D = CB.shape
    dims = S * D
    scale = float(dims)

    def _finite_row(v) -> bool:
        # reject null/ragged vectors AND vectors with null/non-finite
        # elements (ADVICE r11): the SQL form yields NULL for these
        # degenerate rows; np.asarray would raise on a None element and
        # NaN would flip the first-min argmin vs array_min's NaN order
        if v is None or len(v) != dims:
            return False
        try:
            a = np.asarray(v, dtype=np.float64)
        except (TypeError, ValueError):
            return False
        return bool(np.isfinite(a).all())

    def _enc(vecs):
        vals = vecs.to_numpy()
        good = np.array([_finite_row(v) for v in vals], dtype=bool)
        codes_out: list = [None] * len(vals)
        mse_out: list = [None] * len(vals)
        if good.any():
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vals[good]]
            )
            n = V.shape[0]
            code_cols = []
            err = None
            for s in range(S):
                sub = V[:, s * D : (s + 1) * D]
                dists = np.empty((n, C), dtype=np.float64)
                for c in range(C):
                    acc = None
                    for d in range(D):  # sequential over dims = SQL sum order
                        t = sub[:, d] - CB[s, c, d]
                        sq = t * t
                        acc = sq if acc is None else acc + sq
                    dists[:, c] = acc
                idx = np.argmin(dists, axis=1)  # first min, like array_position
                code_cols.append(idx + 1)
                mins = dists[np.arange(n), idx]
                err = mins if err is None else err + mins  # subspace order
            mse = np.floor(err / scale * 10000.0) / 10000.0
            codes = [
                ",".join(str(code_cols[s][i]) for s in range(S))
                for i in range(n)
            ]
            j = 0
            for i, g in enumerate(good):
                if g:
                    codes_out[i] = codes[j]
                    mse_out[i] = float(mse[j])
                    j += 1
        return pd.DataFrame({"codes": codes_out, "mse": mse_out})

    _enc.__annotations__ = {"vecs": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_enc, "codes string, mse double")


def pq_residual_codes_udf(codebook: list[list[list[float]]]):
    """Arrow-batched pandas UDF for the RESIDUAL PQ encode of
    ``build_ivfpq_index``: ``(vec float[], centroid double[]) ->
    struct(code0..codeN int)`` — bit-identical to the HOF chain
    ``zip_with(vec, centroid, x - c)`` then per-subspace
    ``array_position(transform(book, cent -> aggregate(zip_with(sub,
    cent, (p-q)²), 0D, acc+v)), array_min(...))``, but vectorized with
    NumPy instead of interpreted per-element lambdas (guide §4.2).

    Why bit-safe: the residual is elementwise (exact); each distance
    accumulates SEQUENTIALLY over the subdim axis in the fold's
    left-to-right order (the fold's ``0D`` seed is absorbed exactly —
    ``0.0 + t`` == ``t`` for the non-negative squares); argmin is
    first-min like ``array_position(d, array_min(d))``.  Measured: the
    interpreted fold costs ~1024 lambda steps/vector (~30 ns each) —
    the dominant term of the sf10 IVF-PQ entries; the kernel runs the
    same arithmetic as whole-array NumPy ops.
    ``test_pq_residual_codes_udf_matches_hof_chain`` holds the
    equivalence on real data.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    CB = np.array(codebook, dtype=np.float64)  # (subspaces, cents, subdim)
    S, C, D = CB.shape
    dims = S * D
    schema = ", ".join(f"code{s} int" for s in range(S))

    def _finite_row(v) -> bool:
        # same degenerate-input contract as pq_encode_udf (ADVICE r11)
        if v is None or len(v) != dims:
            return False
        try:
            a = np.asarray(v, dtype=np.float64)
        except (TypeError, ValueError):
            return False
        return bool(np.isfinite(a).all())

    def _codes(vecs, cents):
        v_vals = vecs.to_numpy()
        c_vals = cents.to_numpy()
        good = np.array(
            [
                _finite_row(v) and _finite_row(c)
                for v, c in zip(v_vals, c_vals)
            ],
            dtype=bool,
        )
        out = {f"code{s}": [None] * len(v_vals) for s in range(S)}
        if good.any():
            V = np.stack([np.asarray(v, dtype=np.float64) for v in v_vals[good]])
            Cm = np.stack([np.asarray(c, dtype=np.float64) for c in c_vals[good]])
            R = V - Cm  # zip_with(vec, centroid, x - c): elementwise, exact
            n = R.shape[0]
            for s in range(S):
                sub = R[:, s * D : (s + 1) * D]
                dists = np.empty((n, C), dtype=np.float64)
                for c in range(C):
                    acc = None
                    for d in range(D):  # sequential = the fold's sum order
                        t = sub[:, d] - CB[s, c, d]
                        sq = t * t
                        acc = sq if acc is None else acc + sq
                    dists[:, c] = acc
                idx = np.argmin(dists, axis=1) + 1  # first min, 1-based
                col = out[f"code{s}"]
                j = 0
                for i, g in enumerate(good):
                    if g:
                        col[i] = int(idx[j])
                        j += 1
        return pd.DataFrame(out)

    _codes.__annotations__ = {
        "vecs": pd.Series,
        "cents": pd.Series,
        "return": pd.DataFrame,
    }
    return pandas_udf(_codes, schema)
