"""End-to-end tour of the transaction log's table-management surface.

Runs every lakehouse capability against a tiny synthetic table inside
a temp dir and prints what each step proves — the quickest whole-
system drive of `lakehouse.py` (the commit protocol itself is unit-
and property-tested in tests/test_lakehouse.py; this script is the
human-readable walkthrough).

    python examples/run_lakehouse_tour.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (  # noqa: E501
    get_spark,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.lakehouse import (  # noqa: E501
    TransactionLog,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.lakehouse_source import (  # noqa: E501
    register_lakehouse_source,
)


def main() -> None:
    spark = get_spark(app_name="lakehouse-tour")
    root = Path(tempfile.mkdtemp(prefix="lakehouse-tour-"))
    t = TransactionLog(root / "events")

    def rows(*triples):
        return spark.createDataFrame(list(triples), ["id", "v", "d"])

    # generated column declared BEFORE the first write (hidden
    # partitioning: writers only ever supply `d`)
    t.add_generated_column("yr", "substring(d, 1, 4)")
    t.append(rows((1, "a", "2024-01-02"), (2, "b", "2025-03-04")), ["yr"])
    t.append(rows((3, "c", "2024-05-06")))
    print("v2 snapshot:", sorted((r.id, r.yr) for r in t.snapshot(spark).collect()))

    # copy-on-write merge + merge-on-read delete
    t.merge_upsert(rows((1, "A", "2024-01-02"), (4, "d", "2026-07-08")), ["id"])
    t.delete_where(spark, "id = 2", mode="dv")
    print("after merge+dv:", sorted(r.id for r in t.snapshot(spark).collect()))

    # row-level change feed across those commits
    feed = t.read_change_feed(spark, 2)
    print("feed:", sorted((r.id, r._change_type) for r in feed.collect()))

    # metadata-only schema + layout management
    t.rename_column("v", "val")  # column mapping: zero files rewritten
    t.set_partition_spec([])     # spec evolution: future writes unpartitioned
    t.append(spark.createDataFrame([(5, "e", "2027-09-10")], ["id", "val", "d"]))
    print("mixed layouts read:", t.snapshot(spark).count(), "rows")
    print("skipping yr=2024 scans", len(t.matching_files("yr = '2024'")),
          "of", len(t._replay(t.latest_version())["files"]), "files")

    # OPTIMIZE as a commit; time travel survives it (v2 = the first
    # write — v1 is the generated-column declaration, data-less)
    t.compact(spark, target_files_per_partition=1)
    print("v2 names:", t.snapshot(spark, version=2).columns)

    # zero-copy clone, then vacuum the source safely
    c = TransactionLog(root / "events_dev")
    t.clone_to(c.table_path)
    print("clone rows:", c.snapshot(spark).count())
    print("vacuum dry-run:", len(t.vacuum(min_age_s=0, dry_run=True)), "candidates")

    # history with DESCRIBE-HISTORY metrics
    for ci in t.history():
        m = ci.operation_metrics
        print(f"  v{ci.version:<2} {ci.op:<18} +{m['num_added_files']}f "
              f"-{m['num_removed_files']}f rows+{m['num_added_rows']}")

    # the connector: batch + exactly-once streaming over commit offsets
    register_lakehouse_source(spark)
    got = spark.read.format("lakehouse").load(str(t.table_path))
    print("connector:", sorted(got.columns), got.count(), "rows")

    print("OK — tour complete at", root)


if __name__ == "__main__":
    main()
