#!/usr/bin/env python
"""Phase-level profiling of the band3 ACID heavies (guide §1: measure
first).  Replays each entry's steps with wall timers around every phase
so the optimization target is evidence, not guesswork.

Usage: python tools/profile_band3.py [sf_dir]
"""

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (  # noqa: E402
    get_spark,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.lakehouse import (  # noqa: E402
    TransactionLog,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.operators.layout import (  # noqa: E402
    exact_file_chunks,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (  # noqa: E402
    load_table,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
T0 = [time.perf_counter()]


def lap(label: str) -> None:
    t = time.perf_counter()
    print(f"  {label:60s} {t - T0[0]:7.3f}s", flush=True)
    T0[0] = t


def profile_data_skipping(spark) -> None:
    print("== acid_data_skipping_orders ==")
    t = TransactionLog(tempfile.mkdtemp(prefix="prof-ds-") + "/orders")
    base = load_table(spark, SF, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p")
    )
    T0[0] = time.perf_counter()
    src = exact_file_chunks(base, ["o_orderkey"], 200)
    lap("exact_file_chunks layout (eager rank checkpoint)")
    # raw write cost alone (what _stage_files pays Spark for)
    raw = tempfile.mkdtemp(prefix="prof-dsraw-")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    src.write.option("maxRecordsPerFile", "200").parquet(raw)
    lap("RAW chunked write, maxRecordsPerFile=200")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    t.append(src, max_records_per_file=200)
    lap("append total (write + harvest + commit)")
    pred = "o_orderkey BETWEEN 1000 AND 2000"
    t.matching_files(pred)
    lap("matching_files")
    t.history()
    lap("history")
    t.snapshot(spark, where=pred).agg(
        F.count("*"), F.round(F.sum("p"), 2)
    ).collect()
    lap("snapshot agg (pruned)")


def profile_partial_optimize(spark) -> None:
    print("== acid_partial_optimize_orders ==")
    t = TransactionLog(tempfile.mkdtemp(prefix="prof-po-") + "/orders")
    base = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("p")
    )
    T0[0] = time.perf_counter()
    src = exact_file_chunks(
        base, ["o_orderkey"], 200, partition_keys=["o_orderstatus"]
    )
    lap("exact_file_chunks layout (partitioned)")
    raw = tempfile.mkdtemp(prefix="prof-poraw-")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    src.write.option("maxRecordsPerFile", "200").partitionBy(
        "o_orderstatus"
    ).parquet(raw)
    lap("RAW chunked partitioned write, maxRecordsPerFile=200")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    t.append(src, ["o_orderstatus"], max_records_per_file=200)
    lap("append total (write + harvest + commit)")
    v = t.compact(spark, where="o_orderstatus = 'F'")
    lap("compact(where F)")
    t._replay(v)
    lap("replay")
    t.snapshot(spark).groupBy("o_orderstatus").agg(
        F.count("*"), F.round(F.sum("p"), 2)
    ).collect()
    lap("snapshot agg")
    t.read_changes(spark, v - 1, v).count()
    lap("read_changes count")


def profile_commit_path(spark) -> None:
    print("== acid_commit_path_bloom_files ==")
    t = TransactionLog(
        tempfile.mkdtemp(prefix="prof-cp-") + "/orders", checkpoint_interval=1
    )
    base = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("p"),
    )
    T0[0] = time.perf_counter()
    t.append(base.limit(0))
    lap("schema append v1")
    t.add_bloom_index("o_orderkey")
    lap("add_bloom_index")
    T0[0] = time.perf_counter()
    src = exact_file_chunks(base, ["o_orderkey"], 150)
    lap("exact_file_chunks layout")
    raw = tempfile.mkdtemp(prefix="prof-cpraw-")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    src.write.option("maxRecordsPerFile", "150").parquet(raw)
    lap("RAW chunked write, maxRecordsPerFile=150")
    shutil.rmtree(raw)
    T0[0] = time.perf_counter()
    v = t.append(src, max_records_per_file=150)
    lap("append total (write + distributed bloom harvest + ckpt)")
    t._replay(v, use_checkpoint=False)
    lap("replay full")
    t._replay(v)
    lap("replay checkpointed")
    t.snapshot(spark).agg(F.count("*"), F.round(F.sum("p"), 2)).collect()
    lap("snapshot agg")


def main() -> None:
    spark = get_spark(app_name="profile-band3")
    # warm: small run of each phase at sf0.001 so JIT is outside timers
    warm = "/root/testdata/sf0.001"
    tw = TransactionLog(tempfile.mkdtemp(prefix="prof-warm-") + "/orders")
    wsrc = (
        load_table(spark, warm, "orders")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("p"))
        .orderBy("o_orderkey").coalesce(1)
    )
    tw.append(wsrc, ["o_orderstatus"], max_records_per_file=200)
    tw.compact(spark, where="o_orderstatus = 'F'")
    tw.snapshot(spark).agg(F.count("*")).collect()
    T0[0] = time.perf_counter()
    lap("(warm done)")
    profile_data_skipping(spark)
    profile_partial_optimize(spark)
    profile_commit_path(spark)
    spark.stop()


if __name__ == "__main__":
    main()
