"""ACID-lakehouse catalog entries (round 6): the manifest-commit
transaction log (``lakehouse.py``) exercised as driver-verified
queries — each entry BUILDS a small transactional table from the
sf-dir parquet inside a fresh temp dir, then reads it back through the
log (time travel / incremental read), and the oracle states the same
semantics directly against the source table.  Parity therefore proves
the whole commit→snapshot→replay loop end-to-end, not just the final
aggregation.

Determinism: the table content is a pure function of the sf-dir
(status-sliced orders), temp dirs are fresh per call (rerun-safe), and
money outputs are round(..,2) per the catalog idioms.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lakehouse import TransactionLog
from .operators.layout import exact_file_chunks
from .query_catalog import register
from .sources.registry import load_table


def _agg(df: DataFrame, label: str) -> DataFrame:
    return df.agg(
        F.lit(label).alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias(
            "total_price"
        ),
    )


def _orders_slice(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    )


def _status_oracle(label: str, statuses: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{s}'" for s in statuses)
    return (
        f"SELECT '{label}' AS snap, CAST(count(*) AS BIGINT) AS n_orders, "
        "round(sum(o_totalprice), 2) AS total_price FROM orders "
        f"WHERE o_orderstatus IN ({in_list})"
    )


@register(
    "acid_time_travel_orders",
    f"{_status_oracle('latest', ('P',))} UNION ALL "
    f"{_status_oracle('v1', ('F',))} UNION ALL "
    f"{_status_oracle('v2', ('F', 'O'))}",
    doc="ACID time travel through the manifest-commit log "
    "(lakehouse.py): commit v1 = 'F' orders, v2 = append 'O' orders, "
    "v3 = atomic full overwrite with 'P' orders — then read snapshots "
    "v1 / v2 / latest back through log replay (explicit file lists, "
    "zero directory listing) and aggregate each. Parity against the "
    "direct status slices proves atomic overwrite visibility (latest "
    "sees ONLY 'P') and snapshot stability (v1/v2 unchanged by the "
    "overwrite — their files are unreferenced, not deleted). The "
    "partition column o_orderpriority includes '4-NOT SPECIFIED', so "
    "hive-escaped partition dirs round-trip through the log too.",
)
def acid_time_travel_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-tt-") + "/orders")
    t.append(_orders_slice(spark, sf_dir, "F"), ["o_orderpriority"])
    t.append(_orders_slice(spark, sf_dir, "O"))
    t.overwrite(_orders_slice(spark, sf_dir, "P"), ["o_orderpriority"])
    return (
        _agg(t.snapshot(spark), "latest")
        .unionByName(_agg(t.snapshot(spark, version=1), "v1"))
        .unionByName(_agg(t.snapshot(spark, version=2), "v2"))
    )


@register(
    "acid_incremental_read_orders",
    f"{_status_oracle('delta_v1_v2', ('O',))} UNION ALL "
    "SELECT 'after_compact' AS snap, CAST(0 AS BIGINT) AS n_orders, "
    "0.0 AS total_price",
    doc="O(delta) incremental read through the transaction log: commit "
    "v1 = 'F' orders, v2 = append 'O' orders, v3 = OPTIMIZE-as-a-commit "
    "(compact, dataChange=false). read_changes(1→2) must return exactly "
    "the appended 'O' slice (never a rescan of v1's files), and "
    "read_changes(2→3) must be EMPTY — compaction rewrites are flagged "
    "dataChange=false so downstream incremental consumers are never "
    "re-delivered the whole table after an OPTIMIZE. This is the "
    "change-data-feed contract a 100 TB pipeline needs to keep "
    "incremental jobs O(new data).",
)
def acid_incremental_read_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-inc-") + "/orders")
    t.append(_orders_slice(spark, sf_dir, "F"), ["o_orderpriority"])
    t.append(_orders_slice(spark, sf_dir, "O"))
    t.compact(spark, target_files_per_partition=1)
    return _agg(t.read_changes(spark, 1, 2), "delta_v1_v2").unionByName(
        _agg(t.read_changes(spark, 2, 3), "after_compact")
    )


def _orders_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("p"),
    )


def _status_agg(df: DataFrame) -> DataFrame:
    return df.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )


@register(
    "acid_merge_upsert_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderkey % 5 <> 0),
src AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
               round(round(o_totalprice, 2) + 10.0, 2) AS p
        FROM orders WHERE o_orderkey % 3 = 0),
merged AS (SELECT * FROM src
           UNION ALL
           SELECT b.* FROM base b LEFT JOIN src s USING (o_orderkey)
           WHERE s.o_orderkey IS NULL)
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price
FROM merged GROUP BY o_orderstatus
""",
    doc="Copy-on-write MERGE (upsert) through the transaction log: "
    "base = orders with key % 5 != 0, source = key % 3 == 0 with a "
    "+10.00 price restatement — matched keys update in place, "
    "unmatched insert, in ONE atomic commit that rewrites ONLY files "
    "containing matched keys (file pruning; untouched partitions stay "
    "referenced as-is). The oracle states the same upsert as "
    "src UNION ALL (base ANTI JOIN src) directly on the source table, "
    "so parity proves both the merge semantics and that no carried "
    "row was lost or doubled by the rewrite.",
)
def acid_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-merge-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderkey") % 5 != 0)
    src = (
        _orders_cols(spark, sf_dir)
        .filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.append(base, ["o_orderpriority"])
    t.merge_upsert(src, ["o_orderkey"])
    return _status_agg(t.snapshot(spark))


@register(
    "acid_delete_orders",
    "SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders, "
    "round(sum(round(o_totalprice, 2)), 2) AS total_price "
    "FROM orders WHERE o_orderstatus <> 'O' GROUP BY o_orderstatus",
    doc="Copy-on-write DELETE through the transaction log: load orders, "
    "DELETE WHERE o_orderstatus = 'O' — one atomic commit rewriting "
    "only files containing matching rows (files whose every row "
    "matches are metadata-only removes, zero rewrite IO; NULL "
    "predicates keep the row per SQL DELETE semantics, unit-tested). "
    "Oracle = the complement slice of the source table.",
)
def acid_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-del-") + "/orders")
    t.append(_orders_cols(spark, sf_dir), ["o_orderpriority"])
    t.delete_where(spark, "o_orderstatus = 'O'")
    return _status_agg(t.snapshot(spark))


@register(
    "acid_change_feed_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
upd AS (SELECT * FROM base WHERE o_orderkey % 3 = 0),
post AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                round(p + 10.0, 2) AS p FROM upd),
merged AS (SELECT * FROM post
           UNION ALL SELECT * FROM base WHERE o_orderkey % 3 <> 0),
del AS (SELECT * FROM merged WHERE o_orderkey % 7 = 0)
SELECT 'insert' AS change_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(p), 2) AS total_price FROM base
UNION ALL SELECT 'update_preimage', count(*), round(sum(p), 2) FROM upd
UNION ALL SELECT 'update_postimage', count(*), round(sum(p), 2) FROM post
UNION ALL SELECT 'delete', count(*), round(sum(p), 2) FROM del
""",
    doc="Row-level change-data-feed readout through the transaction "
    "log's CDF sidecar (the Delta-CDF shape): append 'F' orders "
    "(synthesized inserts), MERGE a +10.00 restatement of key % 3 == 0 "
    "(update_preimage/update_postimage rows staged per commit), DELETE "
    "key % 7 == 0 (delete rows staged), then read_change_feed(0→3) and "
    "aggregate per _change_type. The oracle recomputes each change "
    "class directly from the source table, so parity proves the feed "
    "delivers exactly the changed rows — no carried-over rewrite rows, "
    "the gap the file-level read_changes cannot close over a merge.",
)
def acid_change_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-cdf-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    src = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0")
    return t.read_change_feed(spark, 0, 3).groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )


# ---- data skipping ----------------------------------------------------

DS_FILE_ROWS = 200
DS_LO, DS_HI = 1000, 2000
DS_PRED = f"o_orderkey BETWEEN {DS_LO} AND {DS_HI}"


@register(
    "acid_data_skipping_orders",
    f"""
WITH t AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
                  row_number() OVER (ORDER BY o_orderkey) AS rn,
                  count(*) OVER () AS n
           FROM orders)
SELECT 'slice' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price
FROM t WHERE {DS_PRED}
UNION ALL
SELECT 'files_scanned',
       CAST(count(DISTINCT CAST(floor((rn - 1) / {DS_FILE_ROWS}.0) AS INT)) AS BIGINT),
       0.0
FROM t WHERE {DS_PRED}
UNION ALL
SELECT 'files_total', CAST(ceil(max(n) / {DS_FILE_ROWS}.0) AS BIGINT), 0.0 FROM t
""",
    doc="File-level data skipping through the transaction log's "
    "committed column stats (the Delta data-skipping design): orders "
    f"sorted by key land as exact {DS_FILE_ROWS}-row files, so each "
    "add action's footer-harvested min/max brackets one contiguous key "
    "chunk; snapshot(where=key BETWEEN ...) prunes at the LOG level — "
    "Spark never sees the non-matching files. The oracle recomputes "
    "the scanned-file count ANALYTICALLY (distinct 200-row chunk "
    "indexes of the matching rows over the sorted rank space), so "
    "parity proves the pruning math is exact-minimal for a sorted "
    "layout — not merely that the filtered rows came back right "
    "(that's the 'slice' row). On a key-gapped domain this equality "
    "holds because a kept-but-empty file would require the whole "
    "predicate range to fall inside a single file's key gap, "
    "impossible while matching rows exist elsewhere in sorted order.",
)
def acid_data_skipping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-ds-") + "/orders")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p")
    )
    # parallel exact-chunk layout: identical committed files to the old
    # orderBy().coalesce(1) single-task write (differential-tested),
    # written by many tasks (guide §2 — the serial writer was 10-12 s
    # of this entry at sf0.1 and a wall at 100 TB)
    t.append(
        exact_file_chunks(src, ["o_orderkey"], DS_FILE_ROWS),
        max_records_per_file=DS_FILE_ROWS,
    )
    scanned = len(t.matching_files(DS_PRED))
    total = len(t.history()[-1].add)
    sliced = t.snapshot(spark, where=DS_PRED).agg(
        F.lit("slice").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    counts = spark.createDataFrame(
        [("files_scanned", scanned, 0.0), ("files_total", total, 0.0)],
        "snap string, n_orders bigint, total_price double",
    )
    return sliced.unionByName(counts)


@register(
    "acid_restore_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
merged AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                  CASE WHEN o_orderkey % 3 = 0 THEN round(p + 10.0, 2)
                       ELSE p END AS p
           FROM base),
after_del AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM base
UNION ALL
SELECT 'pre_restore', count(*), round(sum(p), 2) FROM after_del
""",
    doc="RESTORE through the transaction log: append 'F' orders (v1), "
    "MERGE a +10.00 restatement of key % 3 == 0 (v2), DELETE "
    "key % 7 == 0 (v3), then RESTORE to v1 (v4) — one forward commit "
    "that re-adds v1's files and removes the rewrites. 'latest' must "
    "equal the ORIGINAL base slice (the restatement and delete are "
    "rewound) while the pre-restore v3 snapshot stays time-travelable "
    "(history preserved, not erased). Oracle recomputes both states "
    "directly from the source table, so parity proves the rewind is "
    "exact and non-destructive.",
)
def acid_restore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-restore-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    src = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0")
    t.restore(1)

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )

    return agg(t.snapshot(spark), "latest").unionByName(
        agg(t.snapshot(spark, version=3), "pre_restore")
    )


@register(
    "acid_constraints_orders",
    """
SELECT 'accepted' AS outcome, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders
UNION ALL
SELECT 'rejected', count(*), 0.0 FROM orders
""",
    doc="CHECK-constraint enforcement through the transaction log: "
    "commit CHECK (p > 0) on the orders table (validated against "
    "existing rows first), then attempt an append of the same slice "
    "with NEGATED prices — every row violates, the write raises "
    "BEFORE any commit record lands, and its staged files are swept. "
    "'accepted' = the table's surviving rows (the original append "
    "only); 'rejected' = the violating row count read from the raised "
    "error, proving enforcement counted every bad row. Parity against "
    "the plain source aggregate proves the violating write left "
    "zero trace in committed state.",
)
def acid_constraints_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lakehouse import ConstraintViolationError

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-ck-") + "/orders")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("p"),
    )
    t.append(src, ["o_orderpriority"])
    t.add_check_constraint(spark, "price_pos", "p > 0")
    rejected = 0
    try:
        t.append(src.withColumn("p", -F.col("p")))
    except ConstraintViolationError as e:
        import re as _re

        rejected = int(_re.search(r"(\d+) rows", str(e)).group(1))
    accepted = t.snapshot(spark).agg(
        F.lit("accepted").alias("outcome"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    return accepted.unionByName(
        spark.createDataFrame(
            [("rejected", rejected, 0.0)],
            "outcome string, n_orders bigint, total_price double",
        )
    )


@register(
    "acid_snapshot_diff_versions",
    """
WITH base AS (SELECT o_orderkey, round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
src AS (SELECT o_orderkey, round(round(o_totalprice, 2) + 10.0, 2) AS p
        FROM orders
        WHERE o_orderstatus IN ('F', 'O') AND o_orderkey % 3 = 0),
merged AS (SELECT * FROM src
           UNION ALL
           SELECT b.* FROM base b LEFT JOIN src s USING (o_orderkey)
           WHERE s.o_orderkey IS NULL),
cur AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0),
j AS (SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
                  WHEN c.o_orderkey IS NULL THEN 'removed'
                  WHEN c.p IS DISTINCT FROM b.p THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
      FROM cur c FULL OUTER JOIN base b ON c.o_orderkey = b.o_orderkey)
SELECT diff_status, CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY diff_status ORDER BY diff_status
""",
    doc="snapshot_diff over two VERSIONS of the same transactional "
    "table (the r5 VERDICT's 'diff versions, not externally-supplied "
    "frames'): v1 = 'F' orders, v2 = MERGE (+10.00 restatement of "
    "key % 3 == 0 across 'F'+'O' keys, so the merge both updates and "
    "inserts), v3 = DELETE key % 7 == 0; then "
    "snapshot_diff(snapshot(v3), snapshot(v1)) classifies every key "
    "as added/removed/changed/unchanged. Both sides are pinned "
    "log-replayed file lists — no directory listing, and the diff is "
    "the operator's single full-outer key join. The oracle recomputes "
    "the classification from the source table via the same "
    "merge/delete algebra.",
)
def acid_snapshot_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cdc import snapshot_diff

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-sdv-") + "/orders")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("p"))
    )
    src = (
        orders.filter(
            F.col("o_orderstatus").isin("F", "O") & (F.col("o_orderkey") % 3 == 0)
        )
        .select(
            "o_orderkey", F.round(F.round("o_totalprice", 2) + 10.0, 2).alias("p")
        )
    )
    t.append(base)
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0")
    diff = snapshot_diff(
        t.snapshot(spark, version=3),
        t.snapshot(spark, version=1),
        ["o_orderkey"],
        ["p"],
    )
    return diff.groupBy("diff_status").agg(
        F.count("*").cast("bigint").alias("n")
    )


@register(
    "acid_incremental_agg_maintenance",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
src AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
               round(p + 10.0, 2) AS p
        FROM base WHERE o_orderkey % 3 = 0),
merged AS (SELECT * FROM src
           UNION ALL
           SELECT b.* FROM base b LEFT JOIN src s USING (o_orderkey)
           WHERE s.o_orderkey IS NULL),
final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price
FROM final GROUP BY o_orderpriority
""",
    doc="Incremental materialized-aggregate maintenance off the "
    "row-level change feed: materialize sum/count per priority at v1, "
    "then MERGE (+10.00 on key % 3 == 0) and DELETE (key % 7 == 0) "
    "land as commits, and the aggregate is brought current by folding "
    "ONLY read_change_feed(1→3) — preimages/deletes subtract, "
    "postimages/inserts add — never rescanning the base table (the "
    "O(delta) downstream-view maintenance a CDF exists for; at 100 TB "
    "the delta is MBs while the base is the lake). The oracle "
    "recomputes the final aggregate from scratch, so parity proves "
    "the incremental fold reaches the exact full-recompute state — "
    "counts AND sums, per group.",
)
def acid_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-ivm-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    # materialized view state as of v1 (in a real pipeline this is a
    # stored table; the maintenance below never re-reads the base)
    mat = t.snapshot(spark, version=1).groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("p").alias("total_price"),
    )
    src = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0")
    sign = F.when(
        F.col("_change_type").isin("update_preimage", "delete"), F.lit(-1)
    ).otherwise(F.lit(1))
    delta = (
        t.read_change_feed(spark, 1, 3)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(sign).cast("long").alias("d_n"),
            F.sum(sign * F.col("p")).alias("d_p"),
        )
    )
    return (
        mat.join(delta, "o_orderpriority", "full_outer")
        .select(
            F.col("o_orderpriority").alias("priority"),
            (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("bigint")
            .alias("n_orders"),
            F.round(
                F.coalesce("total_price", F.lit(0.0))
                + F.coalesce("d_p", F.lit(0.0)),
                2,
            ).alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
    )


@register(
    "acid_dv_delete_orders",
    """
WITH kept AS (SELECT o_orderstatus, round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus <> 'O')
SELECT 'after_dv' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM kept
UNION ALL
SELECT 'rewrite_io', CAST(0 AS BIGINT), 0.0
UNION ALL
SELECT 'after_compact', CAST(count(*) AS BIGINT), round(sum(p), 2) FROM kept
""",
    doc="Merge-on-read DELETE via deletion vectors: DELETE WHERE "
    "o_orderstatus = 'O' with mode='dv' writes ZERO data files — the "
    "matching (file, row_index) positions land as one _dv/ sidecar "
    "and reads anti-join them out ('after_dv' must equal the "
    "complement slice). 'rewrite_io' reads the commit record's "
    "add+remove counts — 0 proves the delete was metadata+sidecar "
    "only (at 100 TB: one small write instead of rewriting every "
    "file containing a match). compact() then reads THROUGH the "
    "vectors, materializes the deletions, and drops them; "
    "'after_compact' proves the physical rewrite lands the identical "
    "logical table.",
)
def acid_dv_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-dv-") + "/orders")
    t.append(_orders_cols(spark, sf_dir), ["o_orderpriority"])
    v = t.delete_where(spark, "o_orderstatus = 'O'", mode="dv")
    rec = t._read_commit(v)
    rewrite_io = len(rec["add"]) + len(rec["remove"])

    def agg(label: str) -> DataFrame:
        return t.snapshot(spark).agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )

    after_dv = agg("after_dv")
    io_row = spark.createDataFrame(
        [("rewrite_io", rewrite_io, 0.0)],
        "snap string, n_orders bigint, total_price double",
    )
    t.compact(spark, target_files_per_partition=1)
    return after_dv.unionByName(io_row).unionByName(agg("after_compact"))


@register(
    "acid_connector_roundtrip_orders",
    """
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'O') AND o_orderkey % 10 <> 0
GROUP BY o_orderstatus
""",
    doc="Python Data Source batch read (sources/lakehouse_source.py, "
    "the pyspark.sql.datasource connector): build a transactional "
    "table — 'F' append partitioned by o_orderpriority, 'O' append, "
    "then a merge-on-read DV DELETE of o_orderkey % 10 = 0 — and read "
    "it back through spark.read.format('lakehouse'). Parity proves "
    "the connector's whole per-file read path: log-driven planning "
    "(one InputPartition per committed file, zero directory listing), "
    "typed hive partition-value injection (o_orderpriority lives only "
    "in dir names), and per-file deletion-vector row filtering — "
    "against an oracle that never saw the log at all.",
)
def acid_connector_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.lakehouse_source import register_lakehouse_source

    register_lakehouse_source(spark)
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-dsrc-") + "/orders")
    t.append(_orders_cols(spark, sf_dir).filter("o_orderstatus = 'F'"),
             ["o_orderpriority"])
    t.append(_orders_cols(spark, sf_dir).filter("o_orderstatus = 'O'"))
    t.delete_where(spark, "o_orderkey % 10 = 0", mode="dv")
    return _status_agg(spark.read.format("lakehouse").load(str(t.table_path)))


@register(
    "acid_stream_feed_orders",
    """
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(round(o_totalprice, 2)), 2) AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY o_orderstatus
""",
    doc="Exactly-once streaming feed between two transactional tables "
    "through the Python Data Source connector: source log gets an 'F' "
    "append, an 'O' append, and an OPTIMIZE (dataChange=false); an "
    "availableNow readStream.format('lakehouse') with commit-version "
    "offsets then drives writeStream.format('lakehouse') into a second "
    "log, each micro-batch one atomic commit with (txnAppId, batchId) "
    "idempotent replay. Parity of the DESTINATION snapshot against the "
    "plain source slice proves the feed delivered every appended row "
    "exactly once and the compaction re-delivered nothing.",
)
def acid_stream_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.lakehouse_source import register_lakehouse_source

    register_lakehouse_source(spark)
    root = tempfile.mkdtemp(prefix="acid-feed-")
    src = TransactionLog(root + "/src")
    src.append(_orders_cols(spark, sf_dir).filter("o_orderstatus = 'F'"),
               ["o_orderpriority"])
    src.append(_orders_cols(spark, sf_dir).filter("o_orderstatus = 'O'"))
    src.compact(spark, target_files_per_partition=1)
    dst = TransactionLog(root + "/dst")
    q = (
        spark.readStream.format("lakehouse").load(str(src.table_path))
        .writeStream.format("lakehouse")
        .option("checkpointLocation", root + "/ck")
        .option("partitionKeys", "o_orderpriority")
        .option("txnAppId", "acid-stream-feed")
        .trigger(availableNow=True)
        .start(str(dst.table_path))
    )
    q.awaitTermination(300)
    return _status_agg(dst.snapshot(spark))


@register(
    "acid_stream_cdf_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
upd AS (SELECT * FROM base WHERE o_orderkey % 3 = 0),
post AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                round(p + 10.0, 2) AS p FROM upd),
merged AS (SELECT * FROM post
           UNION ALL SELECT * FROM base WHERE o_orderkey % 3 <> 0),
del AS (SELECT * FROM merged WHERE o_orderkey % 7 = 0)
SELECT 'insert' AS change_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(p), 2) AS total_price FROM base
UNION ALL SELECT 'update_preimage', count(*), round(sum(p), 2) FROM upd
UNION ALL SELECT 'update_postimage', count(*), round(sum(p), 2) FROM post
UNION ALL SELECT 'delete', count(*), round(sum(p), 2) FROM del
""",
    doc="STREAMING row-level change feed through the Python Data "
    "Source connector (readChangeFeed=true): same table history as "
    "acid_change_feed_orders — append 'F' orders, MERGE a +10.00 "
    "restatement of key % 3 == 0, merge-on-read DV DELETE of "
    "key % 7 == 0 — but the feed is DELIVERED by an availableNow "
    "readStream with commit-version offsets into a parquet sink, then "
    "aggregated per _change_type. Parity against the same source-"
    "algebra oracle proves the streamed sidecars/synthesized inserts "
    "carry exactly the batch feed's rows — the O(delta) downstream-"
    "maintenance contract as a live stream instead of a poll.",
)
def acid_stream_cdf_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.lakehouse_source import register_lakehouse_source

    register_lakehouse_source(spark)
    root = tempfile.mkdtemp(prefix="acid-scdf-")
    t = TransactionLog(root + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    src = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0", mode="dv")
    q = (
        spark.readStream.format("lakehouse")
        .option("readChangeFeed", "true")
        .load(str(t.table_path))
        .writeStream.format("parquet")
        .option("path", root + "/feed")
        .option("checkpointLocation", root + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(root + "/feed").groupBy(
        F.col("_change_type").alias("change_type")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )


PO_FILE_ROWS = 200


@register(
    "acid_partial_optimize_orders",
    f"""
WITH agg AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                    round(sum(round(o_totalprice, 2)), 2) AS tp
             FROM orders GROUP BY o_orderstatus)
SELECT o_orderstatus AS snap, n AS n_orders, tp AS total_price FROM agg
UNION ALL
SELECT 'files_' || o_orderstatus,
       CASE WHEN o_orderstatus = 'F' THEN 1
            ELSE CAST(ceil(n / {PO_FILE_ROWS}.0) AS BIGINT) END,
       0.0
FROM agg
UNION ALL
SELECT 'delta_after_optimize', CAST(0 AS BIGINT), 0.0
""",
    doc="Predicate-scoped OPTIMIZE (compact(where=...)): orders land "
    f"partitioned by status in exact {PO_FILE_ROWS}-row files, then "
    "ONLY the 'F' partition is compacted. Parity proves three things "
    "at once: the per-status aggregates are unchanged by the rewrite "
    "(whole-file selection never filters rows), the untouched "
    "partitions keep their analytic ceil(n/200) file counts while 'F' "
    "collapses to 1 (the rewrite really was scoped — at 100 TB an "
    "OPTIMIZE that touches every file is not an operation), and "
    "read_changes across the dataChange=false commit delivers zero "
    "rows to incremental consumers.",
)
def acid_partial_optimize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-po-") + "/orders")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("p"),
    )
    # parallel exact-chunk layout (per-status rank restart) — same
    # committed per-status ceil(n/200) files as the single-task
    # coalesce(1) write, without the serial writer (guide §2)
    t.append(
        exact_file_chunks(
            src, ["o_orderkey"], PO_FILE_ROWS,
            partition_keys=["o_orderstatus"],
        ),
        ["o_orderstatus"],
        max_records_per_file=PO_FILE_ROWS,
    )
    v = t.compact(spark, where="o_orderstatus = 'F'")
    files = t._replay(v)["files"]
    by_status: dict[str, int] = {}
    for add in files.values():
        s = add["partition_values"]["o_orderstatus"]
        by_status[s] = by_status.get(s, 0) + 1
    aggs = t.snapshot(spark).groupBy(
        F.col("o_orderstatus").alias("snap")
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    counts = spark.createDataFrame(
        [(f"files_{s}", n, 0.0) for s, n in sorted(by_status.items())]
        + [("delta_after_optimize", t.read_changes(spark, v - 1, v).count(), 0.0)],
        "snap string, n_orders bigint, total_price double",
    )
    return aggs.unionByName(counts)


@register(
    "acid_shallow_clone_orders",
    """
WITH f AS (SELECT o_orderkey, round(o_totalprice, 2) AS p
           FROM orders WHERE o_orderstatus = 'F'),
fo AS (SELECT round(o_totalprice, 2) AS p
       FROM orders WHERE o_orderstatus IN ('F', 'O')),
cl AS (SELECT CASE WHEN o_orderkey % 5 = 0 THEN round(p + 5.0, 2)
                   ELSE p END AS p FROM f)
SELECT 'src' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM fo
UNION ALL
SELECT 'clone', count(*), round(sum(p), 2) FROM cl
""",
    doc="SHALLOW CLONE through the transaction log (the published "
    "Delta CLONE design): source table = 'F' orders (v1) + 'O' orders "
    "(v2); clone_to() at v1 commits a NEW table whose v1 references "
    "the source's v1 files in place (zero bytes copied — absolute "
    "path + base entries, hive partition derivation through the "
    "source basePath); then a copy-on-write MERGE restates "
    "key % 5 == 0 (+5.00) INSIDE the clone, rewriting only the "
    "affected cloned files into the clone's own dir. 'src' must still "
    "aggregate F+O unrestated (clone writes never leak back) and "
    "'clone' must aggregate the restated F slice pinned at v1 (the "
    "source's later 'O' append never leaks forward). Parity proves "
    "zero-copy reads, version pinning, and clone/source write "
    "isolation in one loop.",
)
def acid_shallow_clone_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = tempfile.mkdtemp(prefix="acid-clone-")
    t = TransactionLog(root + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    t.append(_orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "O"))

    c = TransactionLog(root + "/orders_clone")
    t.clone_to(c.table_path, version=1)
    restated = (
        base.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("p", F.round(F.col("p") + 5.0, 2))
    )
    c.merge_upsert(restated, ["o_orderkey"])

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )

    return agg(t.snapshot(spark), "src").unionByName(
        agg(c.snapshot(spark), "clone")
    )


@register(
    "acid_rename_column_orders",
    """
WITH fo AS (SELECT round(o_totalprice, 2) AS price, CAST(NULL AS VARCHAR) AS st
            FROM orders WHERE o_orderstatus IN ('F', 'O')),
pp AS (SELECT round(o_totalprice, 2) AS price, o_orderstatus AS st
       FROM orders WHERE o_orderstatus = 'P'),
allr AS (SELECT * FROM fo UNION ALL SELECT * FROM pp),
f AS (SELECT round(o_totalprice, 2) AS p FROM orders WHERE o_orderstatus = 'F')
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total_price,
       CAST(count(st) AS BIGINT) AS n_status FROM allr
UNION ALL
SELECT 'v1', count(*), round(sum(p), 2), count(*) FROM f
""",
    doc="Column mapping through the transaction log (the published "
    "Delta RENAME/DROP COLUMN design, name-mode): v1 appends 'F' "
    "orders; v2 RENAMEs p→price as a 1 KB metadata commit (zero files "
    "rewritten — the parquet physical name is frozen, reads alias); "
    "v3 appends 'O' orders under the NEW logical name; v4 DROPs "
    "o_orderstatus (physical name retired, bytes stay unread in old "
    "files); v5 evolve-appends 'P' orders RE-ADDING o_orderstatus, "
    "which binds a fresh physical name. 'latest' must aggregate all "
    "three slices under the renamed price column with o_orderstatus "
    "non-null ONLY for the 'P' rows (the dropped values never "
    "resurrect), and the v1 time-travel snapshot must still read "
    "under the ORIGINAL name p with every status present. Parity "
    "proves rename-without-rewrite, retirement, and versioned naming "
    "in one loop.",
)
def acid_rename_column_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-rename-") + "/orders")
    t.append(
        _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F"),
        ["o_orderpriority"],
    )
    t.rename_column("p", "price")
    t.append(
        _orders_cols(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "O")
        .withColumnRenamed("p", "price")
    )
    t.drop_column("o_orderstatus")
    t.append(
        _orders_cols(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "P")
        .withColumnRenamed("p", "price"),
        evolve_schema=True,
    )
    latest = t.snapshot(spark).agg(
        F.lit("latest").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("price"), 2).alias("total_price"),
        F.count("o_orderstatus").cast("bigint").alias("n_status"),
    )
    v1 = t.snapshot(spark, version=1).agg(
        F.lit("v1").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
        F.count("o_orderstatus").cast("bigint").alias("n_status"),
    )
    return latest.unionByName(v1)


@register(
    "acid_partition_evolution_orders",
    f"""
WITH f AS (SELECT o_orderkey, round(o_totalprice, 2) AS p, o_orderpriority
           FROM orders WHERE o_orderstatus = 'F'),
o AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'O'),
old_hit AS (SELECT count(*) AS c FROM (
    SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
    FROM f GROUP BY o_orderpriority
) WHERE mn <= {DS_HI} AND mx >= {DS_LO}),
new_hit AS (SELECT count(DISTINCT CAST(floor((rn - 1) / {DS_FILE_ROWS}.0) AS INT)) AS c
            FROM o WHERE o_orderkey BETWEEN {DS_LO} AND {DS_HI})
SELECT 'all' AS snap, CAST((SELECT count(*) FROM f) + (SELECT count(*) FROM o) AS BIGINT) AS n,
       round((SELECT sum(p) FROM f) + (SELECT sum(p) FROM o), 2) AS total_price
UNION ALL
SELECT 'files_scanned', CAST((SELECT c FROM old_hit) + (SELECT c FROM new_hit) AS BIGINT), 0.0
UNION ALL
SELECT 'old_generation_intact',
       CAST((SELECT count(DISTINCT o_orderpriority) FROM f) AS BIGINT), 0.0
""",
    doc="Partition-spec EVOLUTION through the transaction log (the "
    "published Iceberg design): v1 appends 'F' orders hive-partitioned "
    "by o_orderpriority (keyed repartition → exactly one file per priority "
    "dir); v2 set_partition_spec([]) — a metadata-only commit changing "
    "the layout for FUTURE writes; v3 appends 'O' orders unpartitioned "
    f"as sorted {DS_FILE_ROWS}-row chunks. 'all' proves reads union "
    "the two layout generations exactly. 'files_scanned' proves "
    "per-file pruning works on BOTH generations at once: for a key "
    "range, old files prune via their footer key stats (the oracle "
    "recomputes per-priority min/max overlap) and new files via "
    "sorted-chunk stats (distinct 200-row chunk indexes) — the same "
    "exact-minimal analytic as acid_data_skipping_orders. "
    "'old_generation_intact' pins the old generation's file count "
    "(one per priority — zero files rewritten by the spec change). "
    "At 100 TB this is the difference between re-partitioning the "
    "lake and committing 1 KB of metadata.",
)
def acid_partition_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-spec-") + "/orders")
    f_src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("p"),
            "o_orderpriority",
        )
        # one file per priority dir, like coalesce(1) — but each key
        # group lands whole in its own task (hash repartition), so the
        # dirs write in parallel instead of through one serial writer
        .repartition(8, "o_orderpriority")
    )
    t.append(f_src, ["o_orderpriority"])
    n_old_files = len(t.history()[-1].add)
    t.set_partition_spec([])
    o_src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("p"),
            F.col("o_orderpriority"),
        )
    )
    # parallel exact-chunk layout — identical sorted 200-row files
    t.append(
        exact_file_chunks(o_src, ["o_orderkey"], DS_FILE_ROWS),
        max_records_per_file=DS_FILE_ROWS,
    )
    scanned = len(t.matching_files(DS_PRED))
    all_row = t.snapshot(spark).agg(
        F.lit("all").alias("snap"),
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    counts = spark.createDataFrame(
        [
            ("files_scanned", scanned, 0.0),
            ("old_generation_intact", n_old_files, 0.0),
        ],
        "snap string, n bigint, total_price double",
    )
    return all_row.unionByName(counts)


@register(
    "acid_generated_hidden_partitioning_orders",
    """
WITH f AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
                  CAST(year(o_orderdate) AS INT) AS o_year
           FROM orders WHERE o_orderstatus = 'F')
SELECT CAST(o_year AS INT) AS o_year, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price,
       CAST(NULL AS BIGINT) AS files_scanned
FROM f GROUP BY o_year
UNION ALL
SELECT NULL, NULL, NULL,
       CAST(count(DISTINCT CASE WHEN o_year = 1995 THEN 1 END) AS BIGINT)
FROM f
""",
    doc="Generated columns as hidden partitioning (the published Delta "
    "generated-columns design composed with the Iceberg layout "
    "pattern): add_generated_column('o_year', 'year(o_orderdate)') is "
    "declared BEFORE the first write; the 'F' orders append supplies "
    "only o_orderdate — the log computes o_year, lands one file per "
    "year dir (keyed repartition), and enforces supplied-value fidelity as "
    "an implicit CHECK on staged bytes. The per-year aggregate proves "
    "the computed values equal the oracle's year() exactly, and "
    "files_scanned proves a predicate on the GENERATED column prunes "
    "to exactly the one matching partition dir (1 if 1995 exists in "
    "the slice, else 0 — the oracle states that analytically). "
    "Writers never materialize the layout column themselves; the "
    "declaration is the single point of truth.",
)
def acid_generated_hidden_partitioning_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-gen-") + "/orders")
    t.add_generated_column("o_year", "CAST(year(o_orderdate) AS INT)")
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("p"),
            "o_orderdate",
        )
        # one file per year dir, like coalesce(1): repartition on the
        # same expression the generated column computes — each year
        # lands whole in one task and the dirs write in parallel
        .repartition(8, F.expr("CAST(year(o_orderdate) AS INT)"))
    )
    t.append(src, ["o_year"])
    scanned = len(t.matching_files("o_year = 1995"))
    per_year = (
        t.snapshot(spark)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )
        .select(
            "o_year",
            "n_orders",
            "total_price",
            F.lit(None).cast("bigint").alias("files_scanned"),
        )
    )
    counts = spark.createDataFrame(
        [(None, None, None, scanned)],
        "o_year int, n_orders bigint, total_price double, files_scanned bigint",
    )
    return per_year.unionByName(counts)


@register(
    "acid_stream_ivm_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
src AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
               round(p + 10.0, 2) AS p
        FROM base WHERE o_orderkey % 3 = 0),
merged AS (SELECT * FROM src
           UNION ALL
           SELECT b.* FROM base b LEFT JOIN src s USING (o_orderkey)
           WHERE s.o_orderkey IS NULL),
final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price
FROM final GROUP BY o_orderpriority
""",
    doc="STREAMING incremental materialized-view maintenance, end to "
    "end through the log: the per-priority aggregate is materialized "
    "at v1 into a SECOND transactional table; a MERGE restatement and "
    "a merge-on-read DV DELETE land on the source; then "
    "readStream(readChangeFeed, startingVersion=1) delivers the "
    "row-level delta and foreachBatch folds it into the view table — "
    "preimages/deletes subtract, postimages/inserts add — committing "
    "each micro-batch as ONE atomic overwrite of the view. The base "
    "table is never rescanned after v1 (the O(delta) contract); the "
    "oracle recomputes the final aggregate from scratch, so parity "
    "proves the streamed fold reaches the exact recompute state. This "
    "is the batch entry acid_incremental_agg_maintenance promoted to "
    "the streaming pipeline a 100 TB lake actually runs.",
)
def acid_stream_ivm_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.lakehouse_source import register_lakehouse_source

    register_lakehouse_source(spark)
    root = tempfile.mkdtemp(prefix="acid-sivm-")
    t = TransactionLog(root + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    mv = TransactionLog(root + "/mv")
    mv.append(
        t.snapshot(spark, version=1)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("p").alias("total_price"),
        )
    )
    src = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("p", F.round(F.col("p") + 10.0, 2))
    )
    t.merge_upsert(src, ["o_orderkey"])
    t.delete_where(spark, "o_orderkey % 7 = 0", mode="dv")

    def fold(batch_df, batch_id) -> None:
        sign = F.when(
            F.col("_change_type").isin("update_preimage", "delete"),
            F.lit(-1),
        ).otherwise(F.lit(1))
        delta = batch_df.groupBy("o_orderpriority").agg(
            F.sum(sign).cast("long").alias("d_n"),
            F.sum(sign * F.col("p")).alias("d_p"),
        )
        cur = mv.snapshot(batch_df.sparkSession)
        new = (
            cur.join(delta, "o_orderpriority", "full_outer")
            .select(
                "o_orderpriority",
                (
                    F.coalesce("n_orders", F.lit(0))
                    + F.coalesce("d_n", F.lit(0))
                ).cast("long").alias("n_orders"),
                (
                    F.coalesce("total_price", F.lit(0.0))
                    + F.coalesce("d_p", F.lit(0.0))
                ).alias("total_price"),
            )
            .filter(F.col("n_orders") > 0)
        )
        mv.overwrite(new)

    q = (
        spark.readStream.format("lakehouse")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(str(t.table_path))
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", root + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return mv.snapshot(spark).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("total_price", 2).alias("total_price"),
    )


@register(
    "acid_update_orders",
    """
WITH base AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
                     o_orderpriority
              FROM orders WHERE o_orderstatus = 'F'),
upd AS (SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN round(p + 5.0, 2)
                    ELSE p END AS p,
               o_orderpriority
        FROM base)
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM upd
UNION ALL
SELECT 'updated_rows',
       CAST(2 * count(*) FILTER (WHERE o_orderkey % 4 = 0) AS BIGINT),
       0.0
FROM base
""",
    doc="UPDATE ... SET ... WHERE as one atomic copy-on-write commit "
    "(completing the DML triad next to MERGE and DELETE): 'F' orders "
    "land at v1, then update_where(p = p + 5.00, key % 4 == 0) "
    "rewrites ONLY the files containing matches — missed rows carry "
    "unchanged, SET expressions evaluate against the pre-update row. "
    "'latest' parity proves the selective restatement is exact; "
    "'updated_rows' counts the staged CDF rows (one update_preimage + "
    "one update_postimage per matched row), proving the feed records "
    "exactly the touched rows and nothing else.",
)
def acid_update_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-upd-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).drop("o_orderstatus")
    t.append(base, ["o_orderpriority"])
    t.update_where(spark, {"p": "round(p + 5.0, 2)"}, "o_orderkey % 4 = 0")
    latest = t.snapshot(spark).agg(
        F.lit("latest").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    cdf_rows = t.read_change_feed(spark, 1).agg(
        F.lit("updated_rows").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.lit(0.0).alias("total_price"),
    )
    return latest.unionByName(cdf_rows)


@register(
    "acid_identity_orders",
    """
WITH f AS (SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'),
o AS (SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'O')
SELECT 'v2_f_slice' AS snap, CAST((SELECT n FROM f) AS BIGINT) AS n_rows,
       CAST((SELECT n FROM f) AS BIGINT) AS n_distinct_ids,
       TRUE AS invariant
UNION ALL
SELECT 'v3_total', (SELECT n FROM f) + (SELECT n FROM o),
       (SELECT n FROM f) + (SELECT n FROM o), TRUE
""",
    doc="GENERATED ALWAYS AS IDENTITY through the transaction log "
    "(the published Delta identity-columns design): create() declares "
    "rid LONG with start 1000/step 10; two appends (the 'F' then 'O' "
    "order slices) OMIT the column and the log allocates "
    "watermark + step * monotonically_increasing_id per write — "
    "unique without any global sort, gaps allowed, never duplicates. "
    "The exact values are partition-layout dependent, so the entry "
    "checks the INVARIANTS as values: count(distinct rid) equals the "
    "row count at both versions (uniqueness across writes, proven "
    "cumulative by v3), and 'invariant' asserts every id is >= start, "
    "on the step lattice, and that v3's new ids all sit ABOVE v2's "
    "max (the watermark advanced through the commit). The oracle "
    "states the expected counts and TRUE literals from the source "
    "table.",
)
def acid_identity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StructType

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-id-") + "/orders")
    schema = (
        StructType()
        .add("rid", "long")
        .add("o_orderkey", "long")
        .add("p", "double")
    )
    t.create(schema, identity={"rid": {"start": 1000, "step": 10}})
    src = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long"),
        F.round("o_totalprice", 2).alias("p"),
        "o_orderstatus",
    )
    t.append(src.filter(F.col("o_orderstatus") == "F").drop("o_orderstatus"))
    v2 = t.snapshot(spark, version=2)
    v2_max = v2.agg(F.max("rid")).collect()[0][0]
    t.append(src.filter(F.col("o_orderstatus") == "O").drop("o_orderstatus"))
    v3 = t.snapshot(spark)

    def agg(df: DataFrame, label: str, floor: int) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("rid").cast("bigint").alias("n_distinct_ids"),
            (
                (F.min("rid") >= F.lit(1000))
                & (F.sum(F.pmod(F.col("rid") - 1000, F.lit(10))) == 0)
                & (
                    F.min(F.when(F.col("rid") > F.lit(floor), F.col("rid")))
                    > F.lit(floor)
                )
            ).alias("invariant"),
        )

    # v3's invariant additionally requires the O-slice ids (the rows
    # beyond v2's) to sit above v2's max — expressed by counting how
    # many ids exceed it
    v3_inv = v3.agg(
        F.lit("v3_total").alias("snap"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("rid").cast("bigint").alias("n_distinct_ids"),
        (
            (F.min("rid") >= F.lit(1000))
            & (F.sum(F.pmod(F.col("rid") - 1000, F.lit(10))) == 0)
            & (
                F.sum((F.col("rid") > F.lit(v2_max)).cast("int"))
                == F.count("*") - F.lit(v2.count())
            )
        ).alias("invariant"),
    )
    return agg(v2, "v2_f_slice", 0).unionByName(v3_inv)


@register(
    "acid_bloom_skipping_orders",
    f"""
WITH t AS (SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS p,
                  row_number() OVER (ORDER BY o_orderkey) AS rn
           FROM orders),
k AS (SELECT min(o_custkey) AS ck FROM orders),
hits AS (SELECT * FROM t WHERE o_custkey = (SELECT ck FROM k))
SELECT 'lookup' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(p), 2) AS total_price, TRUE AS ok FROM hits
UNION ALL
SELECT 'pruning',
       CAST(count(DISTINCT CAST(floor((rn - 1) / {DS_FILE_ROWS}.0) AS INT)) AS BIGINT),
       0.0, TRUE
FROM hits
""",
    doc="Per-file BLOOM FILTER INDEX (the published Delta design): "
    "orders land sorted by o_orderkey in exact 200-row chunks AFTER "
    "add_bloom_index('o_custkey') — a high-cardinality column in "
    "arrival order, so most chunks' min/max spans make range stats a "
    "weak pruner; each add action instead carries an md5 double-hashed "
    "bitset of its distinct custkeys. The point lookup (the smallest "
    "custkey) must return exact rows ('lookup' parity), and 'pruning' "
    "proves the scan is bloom-tight: the Spark side reports TRUE only "
    "if matching_files count >= the true chunk count (no false "
    "negatives — every file holding a hit is scanned) AND < the total "
    "file count (the index actually skipped), with n_rows restating "
    "the analytic chunk count the oracle computes over the sorted "
    "rank space.",
)
def acid_bloom_skipping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-bloom-") + "/orders")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.round("o_totalprice", 2).alias("p"),
    )
    empty = src.limit(0)
    t.append(empty)  # v1 establishes schema so the index can declare
    t.add_bloom_index("o_custkey")
    # parallel exact-chunk layout — identical sorted 200-row files to
    # the old orderBy().coalesce(1) single-task write
    t.append(
        exact_file_chunks(src, ["o_orderkey"], DS_FILE_ROWS),
        max_records_per_file=DS_FILE_ROWS,
    )
    ck = src.agg(F.min("o_custkey")).collect()[0][0]
    files_total = len(t._replay(t.latest_version())["files"])
    scanned = len(t.matching_files(f"o_custkey = {ck}"))
    # the true chunk count, computed the same analytic way the oracle
    # states it (rank-space chunks of the sorted layout)
    from pyspark.sql import Window

    true_chunks = (
        src.withColumn(
            "rn", F.row_number().over(Window.orderBy("o_orderkey"))
        )
        .filter(F.col("o_custkey") == ck)
        .select(
            F.floor((F.col("rn") - 1) / DS_FILE_ROWS).alias("chunk")
        )
        .distinct()
        .count()
    )
    lookup = t.snapshot(spark, where=f"o_custkey = {ck}").agg(
        F.lit("lookup").alias("snap"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum("p"), 2).alias("total_price"),
        F.lit(True).alias("ok"),
    )
    pruning = spark.createDataFrame(
        [
            (
                "pruning",
                true_chunks,
                0.0,
                bool(true_chunks <= scanned < files_total),
            )
        ],
        "snap string, n_rows bigint, total_price double, ok boolean",
    )
    return lookup.unionByName(pruning)


# ---- round 7: commit-path scale microbench --------------------------------

#: rows per staged file for the commit-path microbench: orders at
#: sf0.01 -> ~100 files (correctness scale), sf0.1 -> ~1000 files
#: (bench scale) — the file count, not the row count, is what the
#: commit path is O() of, so band3 timing this entry round-over-round
#: makes staging/replay/checkpoint regressions visible the way query
#: regressions already are (r6 VERDICT item 7).
CP_FILE_ROWS = 150


@register(
    "acid_commit_path_bloom_files",
    f"""
SELECT CAST(ceil(count(*) / {CP_FILE_ROWS}.0) AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(round(o_totalprice, 2)), 2) AS total_price,
       TRUE AS checkpoint_ok, TRUE AS blooms_ok
FROM orders
""",
    doc="Commit-path scale microbench (r6 VERDICT items 1+7): ONE "
    "append of ~n/150 exact-sized files into a bloom-indexed table "
    "with checkpoint_interval=1, so the band3 wall time covers the "
    "full commit lifecycle at a 100-1000x file count — distributed "
    "stats/bloom harvest (never a driver-side column read), the "
    "many-add commit record, the parquet checkpoint write, and a "
    "checkpointed vs full replay. Output proves the lifecycle: exact "
    "file count, row/price parity through the log, checkpointed "
    "replay == full replay, every file carries its bloom.",
)
def acid_commit_path_bloom_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(
        tempfile.mkdtemp(prefix="acid-cp-") + "/orders", checkpoint_interval=1
    )
    src = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("p"),
    )
    t.append(src.limit(0))  # v1 establishes schema for the declaration
    t.add_bloom_index("o_orderkey")
    # parallel exact-chunk layout — identical sorted 150-row files to
    # the old orderBy().coalesce(1) single-task write (which was 12 s
    # of this 19 s entry at sf0.1)
    v = t.append(
        exact_file_chunks(src, ["o_orderkey"], CP_FILE_ROWS),
        max_records_per_file=CP_FILE_ROWS,
    )
    full = t._replay(v, use_checkpoint=False)
    ck = t._replay(v)  # interval=1: served by the fresh checkpoint
    files = ck["files"]
    return t.snapshot(spark).agg(
        F.lit(len(files)).cast("bigint").alias("n_files"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum("p"), 2).alias("total_price"),
        F.lit(full["files"] == files).alias("checkpoint_ok"),
        F.lit(all("bloom" in a for a in files.values())).alias("blooms_ok"),
    )


@register(
    "acid_merge_clauses_orders",
    """
WITH b AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS p,
                  o_orderpriority AS pr
           FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)),
s AS (SELECT o_orderkey AS k, round(o_totalprice, 2) + 10.0 AS p,
             'NEW' AS pr
      FROM orders WHERE o_orderkey % 4 IN (1, 2, 3)),
final AS (
  SELECT b.k, s.p, 'UPD' AS pr
  FROM b JOIN s ON b.k = s.k WHERE s.p > 100010
  UNION ALL
  SELECT b.k, b.p, 'STALE'
  FROM b LEFT JOIN s ON b.k = s.k
  WHERE s.k IS NULL AND b.pr NOT LIKE '1-%'
  UNION ALL
  SELECT s.k, s.p, 'NEW'
  FROM s LEFT JOIN b ON s.k = b.k WHERE b.k IS NULL AND s.p <= 50010
)
SELECT pr, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(p), 2) AS total_price
FROM final GROUP BY pr ORDER BY pr
""",
    doc="Full-clause MERGE (r6 VERDICT item 2; the published "
    "Delta/Iceberg grammar): WHEN MATCHED AND cond THEN UPDATE, "
    "WHEN MATCHED THEN DELETE, WHEN NOT MATCHED AND cond THEN INSERT, "
    "WHEN NOT MATCHED BY SOURCE AND cond THEN DELETE, WHEN NOT "
    "MATCHED BY SOURCE THEN UPDATE — all five clause shapes in ONE "
    "atomic commit against an orders-derived table, first-true clause "
    "winning per row. The oracle restates each clause as its src/base "
    "set algebra (join = matched, left-join-null = the two "
    "not-matched directions), so parity proves clause routing, "
    "condition evaluation on s./t. qualified columns, SET/VALUES "
    "projection, and the copy-on-write commit end-to-end. Survivor "
    "groups: UPD (matched big orders, price restated), STALE "
    "(by-source kept, re-flagged), NEW (small unmatched inserts); "
    "matched small orders and '1-URGENT' by-source rows are deleted.",
)
def acid_merge_clauses_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-mrg-") + "/orders")
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 < 3).select(
        F.col("o_orderkey").alias("k"),
        F.round("o_totalprice", 2).alias("p"),
        F.col("o_orderpriority").alias("pr"),
    )
    t.append(base.coalesce(2))
    src = orders.filter(F.col("o_orderkey") % 4 > 0).select(
        F.col("o_orderkey").alias("k"),
        (F.round("o_totalprice", 2) + F.lit(10.0)).alias("p"),
        F.lit("NEW").alias("pr"),
    )
    t.merge(
        src,
        ["k"],
        when_matched=[
            {"cond": "s.p > 100010", "action": "update",
             "set": {"p": "s.p", "pr": "'UPD'"}},
            {"action": "delete"},
        ],
        when_not_matched=[
            {"cond": "s.p <= 50010", "action": "insert", "values": "*"},
        ],
        when_not_matched_by_source=[
            {"cond": "t.pr LIKE '1-%'", "action": "delete"},
            {"action": "update", "set": {"pr": "'STALE'"}},
        ],
    )
    return (
        t.snapshot(spark)
        .groupBy("pr")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )
        .orderBy("pr")
    )


@register(
    "acid_update_dv_orders",
    """
WITH base AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
                     o_orderpriority
              FROM orders WHERE o_orderstatus = 'F'),
upd AS (SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN round(p + 5.0, 2)
                    ELSE p END AS p,
               o_orderpriority
        FROM base)
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM upd
UNION ALL
SELECT 'updated_rows',
       CAST(2 * count(*) FILTER (WHERE o_orderkey % 4 = 0) AS BIGINT),
       0.0
FROM base
UNION ALL
SELECT 'zero_rewrites', CAST(0 AS BIGINT), 0.0
UNION ALL
SELECT 'after_compact', CAST(count(*) AS BIGINT), round(sum(p), 2) FROM upd
""",
    doc="Merge-on-read UPDATE (r6 VERDICT item 3): the same selective "
    "restatement as acid_update_orders but with mode='dv' — matching "
    "rows' (file, row_index) positions land as a deletion-vector "
    "sidecar and the postimages append as NEW files, so the commit "
    "REWRITES NOTHING ('zero_rewrites' reads the commit record: "
    "remove list length 0, total_price stays 0.0 only if a DV entry "
    "actually landed). 'latest' proves reads apply the vectors plus "
    "postimages exactly; 'updated_rows' proves the CDF is "
    "mode-identical to copy-on-write (one preimage + one postimage "
    "per matched row); 'after_compact' proves OPTIMIZE reads through "
    "the vectors, materializes the update, and drops them with "
    "values intact. The wide-table cheap-restatement shape: one row "
    "touched in each of 10k files costs a sidecar, not 10k rewrites.",
)
def acid_update_dv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-updv-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).drop("o_orderstatus")
    t.append(base, ["o_orderpriority"])
    v = t.update_where(
        spark, {"p": "round(p + 5.0, 2)"}, "o_orderkey % 4 = 0", mode="dv"
    )
    rec = _json.loads(
        (t.log_path / f"{str(v).zfill(20)}.json").read_text()
    )
    latest = t.snapshot(spark).agg(
        F.lit("latest").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    cdf_rows = t.read_change_feed(spark, v - 1, v).agg(
        F.lit("updated_rows").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.lit(0.0).alias("total_price"),
    )
    mor = spark.createDataFrame(
        [
            (
                "zero_rewrites",
                len(rec["remove"]),
                0.0 if rec.get("dv") else -1.0,
            )
        ],
        "snap string, n_orders bigint, total_price double",
    )
    t.compact(spark, target_files_per_partition=1)
    after = t.snapshot(spark).agg(
        F.lit("after_compact").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    return latest.unionByName(cdf_rows).unionByName(mor).unionByName(after)


@register(
    "acid_purge_dvs_orders",
    """
WITH base AS (SELECT o_orderkey, round(o_totalprice, 2) AS p,
                     o_orderpriority
              FROM orders WHERE o_orderstatus = 'F'),
kept AS (SELECT * FROM base
         WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0))
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM kept
UNION ALL
SELECT 'vectors_dropped', CAST(0 AS BIGINT), 0.0
UNION ALL
SELECT 'scoped_rewrite', CAST(1 AS BIGINT), 0.0
""",
    doc="REORG APPLY (PURGE): a merge-on-read DELETE (deletion-vector "
    "sidecar, zero rewrites) followed by compact(purge_dvs=True), "
    "which rewrites EXACTLY the vector-covered files — 'latest' "
    "proves the purged snapshot equals the logical state (vectors "
    "materialized with values intact), 'vectors_dropped' reads the "
    "post-purge state (0 live DV entries, else the row reports the "
    "count), 'scoped_rewrite' is 1 only when the purge commit's "
    "remove set == the covered basenames AND is a strict subset of "
    "the table's files (the untouched partitions kept their paths). "
    "The deferred-rewrite bill for merge-on-read DML, paid without "
    "touching the other 99% of a 100 TB table.",
)
def acid_purge_dvs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-purge-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).drop("o_orderstatus")
    t.append(base, ["o_orderpriority"])
    n_files = len(t._replay(1)["files"])
    dv_v = t.delete_where(
        spark,
        "o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0",
        mode="dv",
    )
    covered = {
        b
        for d in t._replay(dv_v)["dvs"]
        for b in d["files"]
    }
    purge_v = t.compact(spark, purge_dvs=True)
    rec = _json.loads(
        (t.log_path / f"{str(purge_v).zfill(20)}.json").read_text()
    )
    removed = {r.rsplit("/", 1)[-1] for r in rec["remove"]}
    scoped = int(removed == covered and 0 < len(covered) < n_files)
    latest = t.snapshot(spark).agg(
        F.lit("latest").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )
    after = t._replay(purge_v)
    meta = spark.createDataFrame(
        [
            ("vectors_dropped", len(after["dvs"]), 0.0),
            ("scoped_rewrite", scoped, 0.0),
        ],
        "snap string, n_orders bigint, total_price double",
    )
    return latest.unionByName(meta)


@register(
    "acid_plan_driven_orders",
    """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(count(*) AS BIGINT) AS distinct_row_ids
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY 1
""",
    doc="The FULL plan-JSON surface wired to the ACID tier in one pass "
    "(r7 VERDICT item 8): a reference-shaped extraction plan (inline "
    "payload, the SFN-callback analog) dispatched through "
    "Orchestrator.dispatch -> Engine.run_job with EngineConfig.acid=True, "
    "landing in a PRE-CREATED transactional table whose contract "
    "declares generated-column hidden partitioning (o_year from "
    "o_orderdate), a GENERATED-ALWAYS identity column, and a CHECK "
    "constraint — append applies the generated expr, allocates "
    "identity, enforces the CHECK on staged bytes, and partitions by "
    "the hidden key. Readout = per-year aggregate over "
    "lakehouse.snapshot; distinct_row_ids == n_orders proves identity "
    "uniqueness; the oracle states the same semantics straight against "
    "the source table.",
)
def acid_plan_driven_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pathlib import Path

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    from .engine import Engine, EngineConfig
    from .orchestrator import Orchestrator
    from .plans.model import ExtractionPlan
    from .sources.registry import SourceRegistry

    tmp = Path(tempfile.mkdtemp(prefix="acid-plan-"))
    plan = ExtractionPlan.from_dict(
        {
            "SourceName": "sybaseiq",
            "SourceDatabase": "iqdemo",
            "SourceSchema": "dba",
            "SourceTable": "orders",
            "Query": "SELECT o_orderkey, o_orderstatus, o_totalprice, "
            "o_orderdate FROM orders WHERE o_orderstatus = 'F'",
            "MigrationPart": 1,
            "ExpectedAmountOfRecords": " ",
        }
    )
    # the table contract exists BEFORE its first writer runs: hidden
    # partitioning via a generated column, identity, CHECK
    table = TransactionLog(
        tmp / "lake" / plan.jobs[0].target_path_suffix
    )
    table.create(
        StructType(
            [
                StructField("row_id", LongType(), True),
                StructField("o_orderkey", LongType(), True),
                StructField("o_orderstatus", StringType(), True),
                StructField("o_totalprice", DoubleType(), True),
                StructField("o_orderdate", TimestampNTZType(), True),
                StructField("o_year", IntegerType(), True),
                StructField("migration_tp_utc", TimestampType(), True),
                StructField("migration_ExecutionHashId", StringType(), True),
            ]
        ),
        partition_keys=["o_year"],
        constraints={"price_pos": "o_totalprice > 0"},
        generated={"o_year": "CAST(year(o_orderdate) AS INT)"},
        identity={"row_id": {"start": 1, "step": 1}},
    )
    eng = Engine(
        spark,
        SourceRegistry(spark, parquet_root=sf_dir),
        EngineConfig(
            target_root=str(tmp / "lake"),
            register_catalog=False,
            acid=True,
        ),
        None,
        None,
    )
    outcomes = Orchestrator(eng, tmp / "queue").dispatch({"plan": plan.raw})
    if not (outcomes and outcomes[0].succeeded):
        raise RuntimeError(f"plan-driven acid run failed: {outcomes}")
    snap = table.snapshot(spark)
    # hidden partitioning is live: the o_year predicate must prune to
    # a strict subset of the live files without touching data
    n_files = len(table._replay(table.latest_version())["files"])
    matched = len(table.matching_files("o_year = 1995"))
    if not (0 < matched < n_files):
        raise RuntimeError(
            f"hidden partition pruning inert: {matched}/{n_files} files"
        )
    return snap.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.countDistinct("row_id").cast("bigint").alias("distinct_row_ids"),
    )


@register(
    "acid_vacuum_orders",
    """
WITH base AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
                     round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
after_del AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0)
SELECT 'latest' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price, TRUE AS ok FROM after_del
UNION ALL
SELECT 'vacuum_lifecycle', CAST(0 AS BIGINT), 0.0, TRUE
""",
    doc="VACUUM lifecycle through the transaction log: append 'F' "
    "orders (v1), copy-on-write DELETE key % 3 == 0 (v2 rewrites "
    "every file, unreferencing all of v1's), then vacuum "
    "retain_versions=1 — the only operation that ever deletes data "
    "files. The readout pins the full contract: the current snapshot "
    "still value-matches the source-derived expectation (vacuum "
    "touched no live data), at least one unreferenced file was "
    "physically swept, AND the pre-vacuum v1 snapshot — readable "
    "until the sweep — now raises (the retention boundary is real, "
    "encoded as the oracle-checked booleans the sketch entries "
    "pioneered). min_age_s=0 is the documented no-concurrent-writers "
    "test mode; production keeps the Delta-style age threshold.",
)
def acid_vacuum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TransactionLog(tempfile.mkdtemp(prefix="acid-vacuum-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])
    t.delete_where(spark, "o_orderkey % 3 = 0")
    swept = t.vacuum(retain_versions=1, min_age_s=0)
    try:
        t.snapshot(spark, version=1).count()
        v1_gone = False
    except Exception:
        v1_gone = True
    latest = t.snapshot(spark).agg(
        F.lit("latest").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("total_price"),
        F.lit(True).alias("ok"),
    )
    lifecycle = spark.range(1).select(
        F.lit("vacuum_lifecycle").alias("snap"),
        F.lit(0).cast("bigint").alias("n_orders"),
        F.lit(0.0).alias("total_price"),
        F.lit(bool(len(swept) > 0 and v1_gone)).alias("ok"),
    )
    return latest.unionByName(lifecycle)


@register(
    "acid_expire_snapshots_orders",
    """
WITH base AS (SELECT o_orderkey, round(o_totalprice, 2) AS p
              FROM orders WHERE o_orderstatus = 'F'),
kept AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
o AS (SELECT o_orderkey, round(o_totalprice, 2) AS p
      FROM orders WHERE o_orderstatus = 'O')
SELECT 'horizon_v2' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price, TRUE AS ok FROM kept
UNION ALL
SELECT 'latest',
       CAST((SELECT count(*) FROM kept) + (SELECT count(*) FROM o)
            AS BIGINT),
       round((SELECT sum(p) FROM kept) + (SELECT sum(p) FROM o), 2),
       TRUE
UNION ALL
SELECT 'expiry_lifecycle', CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE), TRUE
""",
    doc="Snapshot-expiry lifecycle (the Iceberg expire_snapshots / "
    "Delta log-retention analog, r10 VERDICT item 5): v1 appends 'F' "
    "orders, v2 copy-on-write DELETEs key % 3 == 0 (rewriting every "
    "file), v3 appends the 'O' slice; expire_snapshots(retain_last=2) "
    "advances the horizon to v2 — commit v1 and its era's checkpoints "
    "are deleted from the log while a checkpoint written AT the "
    "horizon keeps v2/v3 reads bit-identical (the 'horizon_v2' and "
    "'latest' rows value-match the source-derived oracle AFTER "
    "expiry). The lifecycle booleans pin the contract: time travel "
    "below the horizon raises SnapshotExpiredError (not a torn-log "
    "error), earliest_version() reports the horizon, and a "
    "post-expiry vacuum (min_age_s=0 test mode) physically reclaims "
    "the v1-era files that only expired snapshots referenced — the "
    "log itself stops growing without bound at 10^5-commit scale.",
)
def acid_expire_snapshots_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .lakehouse import SnapshotExpiredError

    t = TransactionLog(tempfile.mkdtemp(prefix="acid-expire-") + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])  # v1
    t.delete_where(spark, "o_orderkey % 3 = 0")  # v2: rewrites all files
    t.append(
        _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "O")
    )  # v3
    info = t.expire_snapshots(retain_last=2)  # horizon = v2
    try:
        t.snapshot(spark, version=1).count()
        below_raises = False
    except SnapshotExpiredError:
        below_raises = True
    swept = t.vacuum(retain_versions=99, min_age_s=0)
    lifecycle_ok = bool(
        info["earliest"] == 2
        and t.earliest_version() == 2
        and below_raises
        and len(swept) > 0
    )

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
            F.lit(True).alias("ok"),
        )

    lifecycle = spark.range(1).select(
        F.lit("expiry_lifecycle").alias("snap"),
        F.lit(0).cast("bigint").alias("n_orders"),
        F.lit(0.0).alias("total_price"),
        F.lit(lifecycle_ok).alias("ok"),
    )
    return (
        agg(t.snapshot(spark, version=2), "horizon_v2")
        .unionByName(agg(t.snapshot(spark), "latest"))
        .unionByName(lifecycle)
    )


@register(
    "acid_write_audit_publish_orders",
    """
WITH f AS (SELECT round(o_totalprice, 2) AS p FROM orders
           WHERE o_orderstatus = 'F'),
fo AS (SELECT round(o_totalprice, 2) AS p FROM orders
       WHERE o_orderstatus IN ('F', 'O'))
SELECT 'v1' AS snap, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p), 2) AS total_price FROM f
UNION ALL
SELECT 'latest', count(*), round(sum(p), 2) FROM fo
UNION ALL
SELECT 'p_leaked', CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)
""",
    doc="WRITE-AUDIT-PUBLISH through the transaction log (the Iceberg "
    "WAP / Delta cherry-pick pattern, via clone + publish_from): "
    "main v1 = 'F' orders; the GOOD batch ('O' orders) is written "
    "into a zero-copy staging clone, audited against the STAGED "
    "snapshot (null keys, negative prices), and on pass promoted by "
    "publish_from — ONE metadata-only commit referencing the staged "
    "parquet files in place; the BAD batch ('P' orders with poisoned "
    "negative prices) is staged into a second clone, FAILS the same "
    "audit, and its staging dir is abandoned — main's history never "
    "contains it. Readout: v1 time travel (F only), latest (F+O — "
    "the published batch visible), and p_leaked (count of poisoned "
    "rows in main = 0). The audit gates on two scalar aggregates; "
    "publish itself moves zero data bytes.",
)
def acid_write_audit_publish_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root = tempfile.mkdtemp(prefix="acid-wap-")
    t = TransactionLog(root + "/orders")
    base = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "F")
    t.append(base, ["o_orderpriority"])

    def audit_ok(staged_slice: DataFrame) -> bool:
        row = staged_slice.agg(
            F.sum(
                F.when(
                    F.col("o_orderkey").isNull() | (F.col("p") < 0), 1
                ).otherwise(0)
            ).alias("bad"),
            F.count("*").alias("n"),
        ).first()
        return row["n"] > 0 and row["bad"] == 0

    # good batch: stage -> publish with the audit hook (the "A" of WAP
    # runs INSIDE publish_from over exactly the staged slice)
    good = _orders_cols(spark, sf_dir).filter(F.col("o_orderstatus") == "O")
    stg1 = TransactionLog(root + "/staging_good")
    t.clone_to(stg1.table_path)
    clone_v = stg1.latest_version()
    stg1.append(good)
    t.publish_from(stg1, since_version=clone_v, spark=spark, audit=audit_ok)

    # bad batch: stage -> the same audit FAILS inside publish_from ->
    # publish raises, staging abandoned; main never sees it.  Explicit
    # raise (not assert): the gate must fire under ``python -O`` too.
    bad = (
        _orders_cols(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "P")
        .withColumn("p", -F.col("p"))
    )
    stg2 = TransactionLog(root + "/staging_bad")
    t.clone_to(stg2.table_path)
    stg2.append(bad)
    try:
        t.publish_from(stg2, since_version=1, spark=spark, audit=audit_ok)
    except ValueError as e:
        if "audit refused" not in str(e):
            raise  # anything else = the gate broke, not the batch
    else:
        raise ValueError(
            "WAP audit gate failed to refuse the poisoned 'P' batch"
        )

    latest = t.snapshot(spark)

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snap"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )

    leaked = latest.filter(F.col("o_orderstatus") == "P").agg(
        F.lit("p_leaked").alias("snap"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.coalesce(F.round(F.sum("p"), 2), F.lit(0.0)).alias("total_price"),
    )
    return (
        agg(t.snapshot(spark, version=1), "v1")
        .unionByName(agg(latest, "latest"))
        .unionByName(leaked)
    )
