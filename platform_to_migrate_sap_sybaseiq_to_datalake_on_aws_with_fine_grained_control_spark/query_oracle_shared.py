"""Shared oracle-text builders (cycle-free).

Catalog modules register() at import time, and several oracles embed
another module's SQL text.  A registration-time ``from .query_catalog_X
import helper`` re-enters the partially-initialized sibling whenever a
catalog module is imported DIRECTLY (the SURVEY r8 import-cycle class:
fine via ``__spark_entry__``, ImportError standalone).  Builders used
across catalog modules therefore live here, importing nothing from any
catalog module — the same rule functions/ follows for shared constants
(e.g. the Gopher rule texts in ``functions/text.py``).
"""

from __future__ import annotations

#: add-k smoothing constant for the bigram conditional
BIGRAM_ADD_K = 0.5


def bigram_ppl_duck_sql() -> str:
    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1,
    unnest(list_transform(generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1])) AS big
  FROM docs WHERE len(t) >= 2),
cnt AS (SELECT big, CAST(count(*) AS DOUBLE) AS c FROM bg GROUP BY big),
ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS cw FROM bg GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
        FROM (SELECT unnest(t) AS tok FROM docs)),
scored AS (
  SELECT b.doc_id,
         -ln((c.c + {BIGRAM_ADD_K}) / (x.cw + {BIGRAM_ADD_K} * s.v)) AS nll
  FROM bg b JOIN cnt c ON b.big = c.big
  JOIN ctx x ON b.w1 = x.w1 CROSS JOIN voc s),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         floor(exp(avg(nll)) * 10000) / 10000 AS ppl
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams, ppl,
  CASE ntile(3) OVER (ORDER BY ppl, doc_id)
    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ccnet_bucket
FROM perdoc
"""


def values_oracle(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """Golden-row oracle: ``SELECT ... FROM (VALUES ...)`` with every
    column cast to a fixed type (DuckDB literal inference would
    otherwise give int32 where Spark emits int64)."""

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)  # int or float (repr round-trips doubles)

    body = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(name for name, _ in cols)
    casts = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in cols)
    return f"SELECT {casts} FROM (VALUES {body}) AS t({names})"


# ---- MinHash-LSH shared contract ---------------------------------
# The Spark implementation (operators/dedup.py), the ml catalog
# entries, and the corpus-tier oracles MUST agree on these; the
# pair-CTE chain is embedded by several sibling modules' oracles.

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
MINHASH_HASHES = 12
MINHASH_BANDS = 4
QUALITY_MIN = 0.55


from .functions.text import (  # noqa: E402  (cycle-free tier)
    duck_distinct_shingles,
    duck_minhash_signature,
)


def _duck_minhash_pair_ctes() -> str:
    """CTE chain ending in ``pairs(id_a, id_b, jaccard)`` — shared by
    the pair entry and the recursive connected-components oracle."""
    rows = MINHASH_HASHES // MINHASH_BANDS
    sig = duck_minhash_signature("text", MINHASH_HASHES, SHINGLE_N)
    sh = duck_distinct_shingles("text", SHINGLE_N)
    return f"""
sigs AS (SELECT doc_id, {sig} AS sig FROM documents),
banded AS (
  SELECT doc_id, b.band,
    md5(array_to_string(sig[b.band * {rows} + 1 : b.band * {rows} + {rows}], '|')) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band) b),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
docs AS (SELECT doc_id, {sh} AS sh FROM documents),
pairs AS (
  SELECT id_a, id_b,
    floor(len(list_intersect(da.sh, db.sh))::DOUBLE /
          (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) * 10000) / 10000 AS jaccard
  FROM cand
  JOIN docs da ON da.doc_id = id_a
  JOIN docs db ON db.doc_id = id_b
  WHERE floor(len(list_intersect(da.sh, db.sh))::DOUBLE /
          (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) * 10000) / 10000 >= {JACCARD_THRESHOLD})"""
