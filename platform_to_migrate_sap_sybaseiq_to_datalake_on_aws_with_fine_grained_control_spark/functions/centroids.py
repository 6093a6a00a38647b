"""Vectorized nearest-centroid assignment kernels (guide §4.2).

The ANN/SemDeDup operators assign each corpus vector to its nearest
codebook centroid by cosine.  The SQL form is a broadcast cross join
(corpus × k centroids) whose per-pair cosine is an ``aggregate(zip_with
(...))`` fold — interpreted per element, so an assignment costs
``k × dims`` interpreted lambda steps per vector (the r11-measured
dominant term of the sf10 IVF family), plus a ``max_by``/window
shuffle to reduce the k scored rows back to one per vector.

These kernels collapse that to ONE Arrow-batched Python eval: the
codebook (k rows — small by construction, it is broadcast today)
travels in the UDF closure, each batch scores all centroids with
NumPy, and the argmax/top-k happens in the same kernel — no cross
join, no per-pair shuffle, no interpreted folds.

Bit-equivalence contract (the same safety argument as
``lsh_signature_udf`` / ``pq_residual_codes_udf``): NumPy's own
reductions (pairwise/BLAS summation) reorder additions, so every dot
product and norm below accumulates SEQUENTIALLY over the dimension
axis, vectorizing only across (row × centroid) — each sum is the
exact left-to-right IEEE fold ``((0 + x1·y1) + x2·y2) + …`` the SQL
``dot_expr`` computes, elements widen float32→float64 exactly, and
``cos = dot / (vn · cn)`` performs the identical two operations.
Ranking semantics mirror Spark's: NaN cosines order ABOVE every
finite value (Spark treats NaN as the largest double), exact ties
break to the LOWEST label (the codebook is pre-sorted label-ascending
and argmax/stable-argsort keep the first occurrence).

Preconditions (same as the SQL fold, now explicit): vectors must be
non-null arrays of the codebook's dimensionality with non-null
elements.  Null/ragged vectors yield a NULL assignment (the SQL form
propagates NULL cosines into engine-specific null-ordering corners
that no catalog entry exercises); element-level NULLs/NaNs inside an
otherwise well-formed vector flow through the arithmetic as NaN.
"""

from __future__ import annotations

__all__ = [
    "collect_codebook",
    "nearest_centroid_udf",
    "topk_centroid_udf",
    "nearest_centroid_grouped_udf",
]


def _label_sort_key(label):
    # Spark's ascending order for strings is byte-wise over UTF-8
    # (UTF8String.compareTo); Python's str order is code-point order —
    # they agree on the BMP but not on supplementary planes, so sort
    # the encoded bytes.  Numeric labels sort naturally.
    return label.encode("utf-8") if isinstance(label, str) else label


def collect_codebook(cents, label_col: str, centroid_col: str = "centroid"):
    """Collect a (small, broadcast-sized) codebook frame to the driver:
    returns ``(labels, matrix, label_ddl)`` with labels ascending in
    Spark's sort order and ``matrix`` a ``(k, dims)`` float64 array.

    The collect is the kernel's one driver transfer — k rows, the same
    k rows the SQL form ships to every executor as a broadcast.
    """
    import numpy as np

    ddl = cents.schema[label_col].dataType.simpleString()
    rows = cents.select(label_col, centroid_col).collect()
    if not rows:
        raise ValueError("collect_codebook: empty codebook")
    pairs = []
    for r in rows:
        lbl, cent = r[0], r[1]
        if lbl is None or cent is None:
            raise ValueError("collect_codebook: NULL label or centroid")
        pairs.append((lbl, cent))
    pairs.sort(key=lambda p: _label_sort_key(p[0]))
    labels = [p[0] for p in pairs]
    matrix = np.array([p[1] for p in pairs], dtype=np.float64)
    return labels, matrix, ddl


def _fold_norms(M):
    """L2 norms of the rows of ``M`` with the fold's left-to-right
    accumulation (``norm_expr`` bits)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for d in range(M.shape[1]):
        acc += M[:, d] * M[:, d]
    return np.sqrt(acc)


def _cos_block(V, CB, CN):
    """Cosine of every (row of V) × (row of CB): ``(n, k)`` float64.

    Accumulates dot products and vector norms sequentially over the
    dimension axis — each entry is bit-identical to
    ``dot_expr(v, c) / (norm_expr(v) * cn)``.
    """
    import numpy as np

    n = V.shape[0]
    k = CB.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    vn = np.zeros(n, dtype=np.float64)
    for d in range(V.shape[1]):  # sequential over dims = the fold's order
        col = V[:, d]
        acc += col[:, None] * CB[:, d][None, :]
        vn += col * col
    with np.errstate(divide="ignore", invalid="ignore"):
        return acc / (np.sqrt(vn)[:, None] * CN[None, :])


def _good_mask(vals, dims):
    import numpy as np

    return np.array(
        [v is not None and len(v) == dims for v in vals], dtype=bool
    )


def _stack(vals, mask):
    import numpy as np

    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in vals[mask]]
    )


def nearest_centroid_udf(labels, matrix, label_ddl: str):
    """Arrow-batched ``(vec) -> struct(label, cos double)``: the
    nearest centroid by cosine with the lowest-label tiebreak —
    bit-identical to the ``crossJoin(broadcast(cents))`` +
    ``max_by(struct(label, ...), struct(cos_c, -label_rank))``
    reduction it replaces.  ``cos`` is the UNROUNDED winning cosine
    (callers round per their contract)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    CB = np.asarray(matrix, dtype=np.float64)
    CN = _fold_norms(CB)
    LBL = list(labels)
    dims = CB.shape[1]

    def _nearest(vecs):
        vals = vecs.to_numpy()
        n = len(vals)
        lab_out = [None] * n
        cos_out = [None] * n
        good = _good_mask(vals, dims)
        if good.any():
            cos = _cos_block(_stack(vals, good), CB, CN)
            # Spark ranks NaN as the LARGEST double; exact ties break
            # to the first (lowest-label) occurrence, which is what
            # argmax returns over the label-ascending columns.
            rank = np.where(np.isnan(cos), np.inf, cos)
            idx = np.argmax(rank, axis=1)
            j = 0
            for i, g in enumerate(good):
                if g:
                    lab_out[i] = LBL[idx[j]]
                    cos_out[i] = float(cos[j, idx[j]])
                    j += 1
        return pd.DataFrame({"label": lab_out, "cos": cos_out})

    _nearest.__annotations__ = {"vecs": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_nearest, f"label {label_ddl}, cos double")


def topk_centroid_udf(labels, matrix, label_ddl: str, keep: int):
    """Arrow-batched ``(vec) -> array<label>``: the ``keep`` nearest
    centroids in rank order (cosine descending, label ascending on
    ties) — the kernel form of the per-vector
    ``row_number() OVER (PARTITION BY id ORDER BY cos_c DESC, label
    ASC) <= keep`` probe selection."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    CB = np.asarray(matrix, dtype=np.float64)
    CN = _fold_norms(CB)
    LBL = np.array(labels, dtype=object)
    dims = CB.shape[1]
    keep = min(keep, CB.shape[0])

    def _topk(vecs):
        vals = vecs.to_numpy()
        n = len(vals)
        out = [None] * n
        good = _good_mask(vals, dims)
        if good.any():
            cos = _cos_block(_stack(vals, good), CB, CN)
            # descending cosine with NaN largest (Spark's DESC order);
            # stable sort keeps label-ascending ties
            rank = np.where(np.isnan(cos), np.inf, cos)
            order = np.argsort(-rank, axis=1, kind="stable")[:, :keep]
            j = 0
            for i, g in enumerate(good):
                if g:
                    out[i] = list(LBL[order[j]])
                    j += 1
        return pd.Series(out)

    _topk.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_topk, f"array<{label_ddl}>")


def nearest_centroid_grouped_udf(group_books: dict, label_ddl: str):
    """Arrow-batched ``(vec, group) -> struct(label, cos double)``:
    nearest centroid WITHIN the row's own group (the probe-pruned fine
    level of a two-level quantizer) — the kernel form of
    ``join(broadcast(cents), group_col)`` + ``max_by``.  Rows whose
    group has no codebook entry yield NULL (the equi-join would have
    dropped them; callers filter)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    books = {}
    dims = None
    for g, (labels, matrix) in group_books.items():
        CB = np.asarray(matrix, dtype=np.float64)
        books[g] = (list(labels), CB, _fold_norms(CB))
        dims = CB.shape[1]

    def _nearest_g(vecs, groups):
        v_vals = vecs.to_numpy()
        g_vals = groups.to_numpy()
        n = len(v_vals)
        lab_out = [None] * n
        cos_out = [None] * n
        for g in pd.unique(g_vals):
            book = books.get(g)
            if book is None:
                continue
            LBL, CB, CN = book
            sel = np.array(
                [
                    gv == g and v is not None and len(v) == dims
                    for gv, v in zip(g_vals, v_vals)
                ],
                dtype=bool,
            )
            if not sel.any():
                continue
            cos = _cos_block(_stack(v_vals, sel), CB, CN)
            rank = np.where(np.isnan(cos), np.inf, cos)
            idx = np.argmax(rank, axis=1)
            j = 0
            for i, s in enumerate(sel):
                if s:
                    lab_out[i] = LBL[idx[j]]
                    cos_out[i] = float(cos[j, idx[j]])
                    j += 1
        return pd.DataFrame({"label": lab_out, "cos": cos_out})

    _nearest_g.__annotations__ = {
        "vecs": pd.Series,
        "groups": pd.Series,
        "return": pd.DataFrame,
    }
    return pandas_udf(_nearest_g, f"label {label_ddl}, cos double")
