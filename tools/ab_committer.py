#!/usr/bin/env python
"""A/B the FileOutputCommitter algorithm version on the band3-style
1000-tiny-file chunked write (VERDICT r11 item 6; the r11 v1-vs-v2
trial was noise-bound — this reruns it with >= 3 repetitions per arm,
interleaved, on an idle host).

v1 commits task outputs at JOB commit (driver-side serial rename per
task dir); v2 renames at TASK commit (parallel, at the cost of
observable partial output on job failure — the lakehouse staging dir
makes that moot here: files are invisible until the transaction log
references them).

Usage: python tools/ab_committer.py [reps]
Prints per-rep write-phase seconds for each arm; no artifacts written.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.chdir(REPO_ROOT)

SF = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
        get_spark,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.operators.layout import (
        exact_file_chunks,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
        load_table,
    )

    spark = get_spark(app_name="ab-committer")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("p")
    )
    rows_per_file = 150  # ~1000 files at sf0.1
    laid = exact_file_chunks(orders, ["o_orderkey"], rows_per_file)
    laid = laid.localCheckpoint(eager=True)  # isolate the WRITE phase

    conf_key = "mapreduce.fileoutputcommitter.algorithm.version"
    results: dict[str, list[float]] = {"v1": [], "v2": []}
    # warm
    d = tempfile.mkdtemp(prefix="abc-warm-")
    laid.write.option("maxRecordsPerFile", rows_per_file).parquet(
        d, mode="overwrite"
    )
    shutil.rmtree(d)
    for rep in range(reps):
        for arm, ver in (("v1", "1"), ("v2", "2")):
            spark.sparkContext._jsc.hadoopConfiguration().set(conf_key, ver)
            d = tempfile.mkdtemp(prefix=f"abc-{arm}-")
            t0 = time.perf_counter()
            laid.write.option("maxRecordsPerFile", rows_per_file).parquet(
                d, mode="overwrite"
            )
            dt = time.perf_counter() - t0
            nfiles = sum(1 for _ in os.scandir(d) if _.name.endswith(".parquet"))
            shutil.rmtree(d)
            results[arm].append(dt)
            print(f"rep{rep} {arm}: {dt:.3f}s ({nfiles} files)", flush=True)
    for arm, ts in results.items():
        print(f"{arm}: min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f}")


if __name__ == "__main__":
    main()
