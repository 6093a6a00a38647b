#!/usr/bin/env python
"""Run the example extraction plans end-to-end against the synthetic
testdata — the new-engine equivalent of uploading a plan JSON to the
reference platform's ``run_now/`` prefix.

Usage:  python examples/run_extraction.py [sf_dir] [workdir]
"""

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
    get_spark,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.engine import (
    Engine,
    EngineConfig,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.orchestrator import (
    Orchestrator,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.ledger import (
    Ledger,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.notify import (
    NotificationLog,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
    SourceRegistry,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(tempfile.mkdtemp())
    spark = get_spark(warehouse_dir=str(work / "warehouse"))
    engine = Engine(
        spark,
        SourceRegistry(spark, parquet_root=sf_dir),
        EngineConfig(target_root=str(work / "lake")),
        Ledger(work / "ledger.jsonl"),
        NotificationLog(work / "notifications.jsonl"),
    )
    orch = Orchestrator(engine, work / "queue")
    for f in (Path(__file__).parent / "plans").glob("*.json"):
        shutil.copy(f, orch.queue_root / "run_now" / f.name)

    for outcome in orch.run_now():
        for r in outcome.results:
            print(
                f"{r.source_table} part status={r.status} rows={r.row_count} "
                f"reconcile={r.reconcile_status} -> {r.sink.path if r.sink else '-'}"
            )
        print(f"  plan moved to: {outcome.moved_to}")

    print("\ncatalog tables:")
    for t in spark.catalog.listTables("datalake"):
        if t.tableType == "TEMPORARY":
            continue  # listTables also returns session temp views
        n = spark.table(f"datalake.{t.name}").count()
        print(f"  datalake.{t.name}: {n} rows")


if __name__ == "__main__":
    main()
