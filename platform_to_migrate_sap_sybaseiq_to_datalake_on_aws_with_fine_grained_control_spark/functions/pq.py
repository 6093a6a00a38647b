"""Product-quantization codebook constants and derivation.

Lives under ``functions/`` (imports nothing from the catalog modules)
so both ``query_catalog_mining`` (the ``embedding_pq_codes`` entry)
and ``query_catalog_ml`` (the IVF-PQ ADC entry) can share it without
a registration-order import cycle.
"""

from __future__ import annotations

import hashlib

__all__ = ["PQ_SUBSPACES", "PQ_SUBDIM", "PQ_CENTROIDS", "pq_codebook"]

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
