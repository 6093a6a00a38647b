#!/usr/bin/env python
"""A/B/C the global_ordered_scan input pin at sf10 on the bigram-LM
perplexity pipeline (the heaviest exact_ntile consumer):

  A  pin via persist (as shipped r12)             — cached plan, no AQE
  B  pin via persist + canChangeCachedPlanOutputPartitioning=true
                                                  — cached plan, AQE on
  C  no pin (pre-r12 double execution)            — full AQE, 2 passes

One Spark session per variant (B's conf is session-wide), reps
interleaved inside each session, noop sink, cache cleared + GC between
reps.  Usage: python tools/ab_ntile_pin.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.chdir(REPO_ROOT)

SF10_DIR = "/tmp/spark_graft_sf10"


def run_variant(label: str, pin: bool, aqe_cache: bool, reps: int) -> list[float]:
    from pyspark.sql import SparkSession

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
        get_spark,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.operators import (
        layout,
    )

    layout.PIN_ORDERED_SCAN_INPUT = pin
    extra = {}
    if aqe_cache:
        extra["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = (
            "true"
        )
    spark = get_spark(app_name=f"ab-ntile-{label}", extra_conf=extra)

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.query_catalog_analytics import (
        bigram_perplexity_df,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources import (
        registry as reg,
    )

    # warm at sf0.001 (codegen/JIT), then measure the sf10 corpus
    bigram_perplexity_df(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    out: list[float] = []
    for rep in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        reg._VIEW_CACHE.clear()
        t0 = time.perf_counter()
        bigram_perplexity_df(spark, SF10_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        out.append(dt)
        print(
            f"{label} rep{rep}: {dt:.2f}s  load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()
    layout.PIN_ORDERED_SCAN_INPUT = True
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {}
    for label, pin, aqe in (
        ("A_pin", True, False),
        ("B_pin_aqecache", True, True),
        ("C_nopin", False, False),
    ):
        res[label] = run_variant(label, pin, aqe, reps)
        time.sleep(10)
    for k, v in res.items():
        print(f"{k}: min={min(v):.2f} med={sorted(v)[len(v)//2]:.2f} all={['%.1f' % x for x in v]}")


if __name__ == "__main__":
    main()
