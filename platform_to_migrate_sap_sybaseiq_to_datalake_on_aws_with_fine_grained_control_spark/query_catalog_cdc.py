"""CDC / merge-on-read catalog entries (operators/cdc.py).

Registered LAST so these brand-new entries queue behind the
longer-waiting unverified entries in the driver's 50-slot window
(see query_catalog._ordered_names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query_catalog import register
from .sources.registry import load_table


# =====================================================================
# CDC / merge-on-read (operators.cdc) — the update half the reference's
# append-only sink lacks (sybaseiq_extractor.py:132-136 documents the
# disabled overwrite path; duplicate keys accumulate in the lake)
# =====================================================================


@register(
    "cdc_latest_event_state",
    """
SELECT user_id, ts AS last_ts, event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) t WHERE rn = 1
""",
    doc="Collapse the append-only event log to the newest row per key "
    "via max_by(payload, version) hash aggregation — map-side partial "
    "combine ships ONE candidate per key per task (|keys| shuffle rows, "
    "not |rows|), unlike the oracle's row_number window which shuffles "
    "and sorts everything. operators/cdc.py:latest_snapshot.",
)
def cdc_latest_event_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cdc import latest_snapshot

    # project BEFORE the aggregation: the payload struct inside max_by
    # is opaque to Catalyst's column pruning, so any column kept here
    # would be scanned AND shuffled — prune by hand first.
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    latest = latest_snapshot(events, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@register(
    "cdc_apply_order_changes",
    """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
            ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 <> 0
""",
    doc="Apply an insert/update/delete change feed to a base snapshot "
    "(operators/cdc.py:apply_change_stream): base = keys not "
    "divisible by 3, changes = price-bump upserts (seq 1) for keys "
    "divisible by 3 and deletes (seq 2) for keys divisible by 10. "
    "One map-side-combined hash aggregation over base ∪ changes; the "
    "oracle is the algebraically collapsed CASE form.",
)
def cdc_apply_order_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cdc import apply_change_stream

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    upserts = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("_seq", F.lit(1))
        .withColumn("_op", F.lit("U"))
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("_seq", F.lit(2))
        .withColumn("_op", F.lit("D"))
    )
    changes = upserts.unionByName(deletes)
    return apply_change_stream(
        base, changes, keys=["o_orderkey"], seq_col="_seq", op_col="_op"
    )


@register(
    "scd2_customer_balance_history",
    """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM customer WHERE c_custkey % 4 <> 0
UNION ALL
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       TIMESTAMP '1992-01-01 00:00:00', TIMESTAMP '1998-06-01 00:00:00',
       FALSE
FROM customer WHERE c_custkey % 4 = 0
UNION ALL
SELECT c_custkey, c_name, c_mktsegment, c_acctbal + 500.0,
       TIMESTAMP '1998-06-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
FROM customer WHERE c_custkey % 4 = 0
""",
    doc="Slowly-changing Type-2 merge (operators/cdc.py:scd2_apply): "
    "an update batch covering every even key, but only keys divisible "
    "by 4 actually change balance — the null-safe tracked-struct "
    "compare must treat the rest as no-ops. Changed keys get their "
    "open row closed at the effective ts plus a new open version. "
    "One full-outer shuffle join (broadcast-able update batch).",
)
def scd2_customer_balance_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from .operators.cdc import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    current = customer.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        F.lit(datetime(1992, 1, 1)).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 4 == 0, F.col("c_acctbal") + F.lit(500.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return scd2_apply(
        current,
        updates,
        keys=["c_custkey"],
        tracked=["c_acctbal"],
        effective=datetime(1998, 6, 1),
    )


# =====================================================================
# Corpus chunking / stratified sampling (operators.chunking) — the
# curation stages between raw documents and tokenization
# =====================================================================


CHUNK_CHARS = 200
CHUNK_OVERLAP = 40
_STRIDE = CHUNK_CHARS - CHUNK_OVERLAP


@register(
    "chunk_documents_fixed",
    f"""
SELECT doc_id, lang, chunk_id,
       substring(text, CAST(chunk_id * {_STRIDE} + 1 AS INT), {CHUNK_CHARS}) AS chunk_text,
       length(substring(text, CAST(chunk_id * {_STRIDE} + 1 AS INT), {CHUNK_CHARS})) AS chunk_chars
FROM (
  SELECT doc_id, lang, text,
         unnest(generate_series(0,
           CAST(greatest(1, ceil((length(text) - {CHUNK_OVERLAP}) / {float(_STRIDE)})) AS BIGINT) - 1
         )) AS chunk_id
  FROM documents
) t
""",
    doc="Fixed-size overlapping character chunking "
    f"({CHUNK_CHARS} chars, {CHUNK_OVERLAP} overlap) via "
    "explode(sequence) + substring — a narrow (shuffle-free) fan-out "
    "whose cost scales with the scan; character semantics so "
    "multi-byte scripts slice identically across engines. "
    "operators/chunking.py:chunk_documents.",
)
def chunk_documents_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return chunk_documents(
        docs, "doc_id", "text", chunk_chars=CHUNK_CHARS, overlap=CHUNK_OVERLAP
    )


@register(
    "stratified_sample_by_lang",
    """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         CAST(
           (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
         AS INT) AS bucket
  FROM documents
) t
WHERE bucket < (CASE lang WHEN 'en' THEN 64 WHEN 'zh' THEN 256 ELSE 128 END)
""",
    doc="Deterministic per-stratum downsampling (en 25%, zh 100%, "
    "default 50%) via md5 hash buckets — reproducible across engines, "
    "runs, retries and cluster layouts, unlike seeded sampleBy whose "
    "per-partition RNG shifts with the split. Narrow filter: no "
    "shuffle, predicate evaluated at the scan. "
    "operators/chunking.py:stratified_sample.",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.chunking import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(
        docs, "lang", "doc_id", rates={"en": 0.25, "zh": 1.0}, default_rate=0.5
    )


@register(
    "corpus_balance_report",
    """
SELECT lang, n_docs, total_chars,
       round(total_chars / (SELECT CAST(sum(n_chars) AS DOUBLE) FROM documents), 6) AS char_share
FROM (
  SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
) g
""",
    doc="Corpus composition report (per-language doc counts, "
    "character totals, share of corpus). The grand total is a scalar "
    "aggregate broadcast into the per-group frame — no global "
    "unpartitioned window at any scale.",
)
def corpus_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    grand = docs.agg(F.sum("n_chars").cast("double").alias("_grand"))
    return per_lang.crossJoin(F.broadcast(grand)).select(
        "lang",
        "n_docs",
        "total_chars",
        F.round(F.col("total_chars") / F.col("_grand"), 6).alias("char_share"),
    )


# =====================================================================
# Multimodal perceptual hash (operators.multimodal.image_ahash)
# =====================================================================


def _mm_ahash_golden() -> list[tuple]:
    """Expected aHash per image asset, derived from the generator's
    pre-encode pixel SPEC (synthetic_image_pixels → downsample →
    threshold) — never from the PNG bytes, so the oracle genuinely
    checks the distributed encode→decode→hash round trip."""
    import numpy as np

    from .operators.multimodal import (
        resize_nearest,
        synthetic_asset_rows,
        synthetic_image_pixels,
    )

    out = []
    for asset_id, media, _payload, _n, _uri in synthetic_asset_rows(64):
        if media != "image":
            continue
        small = resize_nearest(synthetic_image_pixels(asset_id), 8, 8).astype(
            np.int64
        )
        mean = int(small.sum()) // 64
        v = 0
        for bit in (small >= mean).flatten():
            v = (v << 1) | int(bit)
        out.append((asset_id, f"{v:016x}"))
    return out


def _mm_ahash_oracle() -> str:
    from .query_oracle_shared import values_oracle as _values_oracle

    return _values_oracle(
        _mm_ahash_golden(), [("asset_id", "BIGINT"), ("ahash", "VARCHAR")]
    )


@register(
    "mm_image_ahash",
    _mm_ahash_oracle(),
    doc="Perceptual average-hash per image (PNG decode → 8×8 "
    "nearest-neighbor → integer-mean threshold → 64-bit hex) via "
    "Arrow-batched mapInPandas; exact perceptual dedup is then a "
    "map-side-combined groupBy on the hash, never a pairwise image "
    "compare. Oracle = golden rows from the pre-encode pixel spec. "
    "operators/multimodal.py:image_ahash.",
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import image_ahash, make_synthetic_assets

    assets = make_synthetic_assets(spark, 64)
    return image_ahash(assets)


# =====================================================================
# Snapshot diff (Iceberg/Delta-style table diff from plain tables)
# =====================================================================

_DIFF_ORACLE = """
WITH prev AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0
              THEN round(o_totalprice * 0.9, 2)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 13 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
),
cur AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 89 <> 0
),
j AS (
  SELECT
    CASE WHEN p.o_orderkey IS NULL THEN 'added'
         WHEN c.o_orderkey IS NULL THEN 'removed'
         WHEN c.o_totalprice IS DISTINCT FROM p.o_totalprice
           OR c.o_orderstatus IS DISTINCT FROM p.o_orderstatus
           THEN 'changed'
         ELSE 'unchanged' END AS diff_status,
    CASE WHEN p.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL
          AND c.o_totalprice IS DISTINCT FROM p.o_totalprice
         THEN 1 ELSE 0 END AS chg_price,
    CASE WHEN p.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL
          AND c.o_orderstatus IS DISTINCT FROM p.o_orderstatus
         THEN 1 ELSE 0 END AS chg_status
  FROM cur c FULL OUTER JOIN prev p ON c.o_orderkey = p.o_orderkey
)
SELECT diff_status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(chg_price) AS BIGINT) AS n_price_changed,
       CAST(sum(chg_status) AS BIGINT) AS n_status_changed
FROM j GROUP BY diff_status ORDER BY diff_status
"""


@register(
    "snapshot_diff_orders",
    _DIFF_ORACLE,
    doc="Snapshot diff between two versions of the orders table "
    "(previous = simulated elder snapshot with deterministic deletes "
    "via key moduli, price restates on %11 keys, status restates on "
    "%13 keys): added/removed/changed/unchanged classification plus "
    "per-column change flags from ONE full-outer shuffle join on the "
    "key — no row hashes shuffled, the null-safe column compares run "
    "post-join JVM-side. The Iceberg/Delta snapshot-diff readout "
    "computed from plain tables; bucketed snapshots would elide even "
    "that single shuffle. operators/cdc.py:snapshot_diff.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cdc import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    prev = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.round(F.col("o_totalprice") * 0.9, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    cur = orders.filter(F.col("o_orderkey") % 89 != 0)
    diff = snapshot_diff(
        cur, prev, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return (
        diff.groupBy("diff_status")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("chg_o_totalprice").cast("int"))
            .cast("bigint")
            .alias("n_price_changed"),
            F.sum(F.col("chg_o_orderstatus").cast("int"))
            .cast("bigint")
            .alias("n_status_changed"),
        )
        .orderBy("diff_status")
    )


# =====================================================================
# Incremental view maintenance: join delta under inserts
# =====================================================================


@register(
    "ivm_join_delta_orders",
    # independent oracle formulation: per-group counts over the FULL
    # join minus counts over the BASE join must equal the delta-join
    # counts (additive under insert-only deltas).
    """
WITH full_j AS (
  SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_orderstatus
),
base_j AS (
  SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS rev
  FROM (SELECT * FROM orders WHERE o_orderkey % 13 <> 0) o
  JOIN (SELECT * FROM customer WHERE c_custkey % 7 <> 0) c
  ON o.o_custkey = c.c_custkey
  GROUP BY o_orderstatus
)
SELECT f.o_orderstatus AS o_orderstatus,
       CAST(f.n - COALESCE(b.n, 0) AS BIGINT) AS delta_rows,
       round(f.rev - COALESCE(b.rev, 0), 2) AS delta_revenue
FROM full_j f LEFT JOIN base_j b ON f.o_orderstatus = b.o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Incremental view maintenance for an equi-join under inserts "
    "(operators/cdc.py:join_delta): the join view's delta is "
    "dA><B ∪ A><dB ∪ dA><dB — three delta-sized joins instead of a "
    "full base-base recompute, the refresh-proportional-to-arrivals "
    "property a materialized 100 TB join view needs (bucketed bases "
    "make the delta-base joins shuffle-free on the base side). The "
    "oracle is an independent formulation: full-join group counts "
    "minus base-join group counts — additivity under insert-only "
    "deltas is exactly the IVM invariant being proven.",
)
def ivm_join_delta_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cdc import join_delta

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    base_a = orders.filter(F.col("o_orderkey") % 13 != 0)
    delta_a = orders.filter(F.col("o_orderkey") % 13 == 0)
    base_b = cust.filter(F.col("c_custkey") % 7 != 0).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    delta_b = cust.filter(F.col("c_custkey") % 7 == 0).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    d = join_delta(base_a, delta_a, base_b, delta_b, "o_custkey")
    return (
        d.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("delta_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("delta_revenue"),
        )
        .orderBy("o_orderstatus")
    )
