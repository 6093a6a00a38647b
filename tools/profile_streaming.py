#!/usr/bin/env python
"""Phase profile of the streaming-sketch entries (VERDICT r11 item 7).

Splits each entry's wall clock into: source prep (write the N-file
replay dir), stream machinery (start → awaitTermination, minus the
per-batch sink work), per-batch sink work (timed inside the
foreachBatch apply), and the final readout aggregation — so the
"~1.3 s startup + ~0.3-0.8 s/batch" r9 cost law can be attributed to
engine overhead vs our sink writes before touching anything.

Usage: python tools/profile_streaming.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.chdir(REPO_ROOT)

SF = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
        get_spark,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
        load_table,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.streaming import (
        events as sev,
    )

    spark = get_spark(app_name="profile-streaming")
    # warm the streaming machinery once (JIT, sink classes)
    tag = hashlib.md5(b"warm").hexdigest()[:8]
    base = f"/tmp/psw_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id"
    ).repartition(2).write.parquet(f"{base}/src")
    sev.run_streaming_hll(spark, f"{base}/src", "user_id", f"{base}/work")

    batch_times: list[float] = []
    orig_hll_rows = sev.run_streaming_hll

    for rep in range(reps):
        for name, runner, key in [
            ("hll", sev.run_streaming_hll, "user_id"),
        ]:
            root = f"/tmp/psf_{name}_{rep}"
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.perf_counter()
            events = load_table(spark, SF, "events").select(key)
            events.repartition(4).write.parquet(f"{root}/src")
            t1 = time.perf_counter()

            # monkeypatch-free: time the batches by wrapping the module
            # helper the runner uses
            from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.functions.sketches import (
                hll_register_rows,
            )

            times: list[float] = []
            regs_dir = f"{root}/work/regs"

            def apply(batch_df, batch_id):
                b0 = time.perf_counter()
                (
                    hll_register_rows(batch_df, key)
                    .groupBy("idx")
                    .agg(F.max("rho").alias("m"))
                    .coalesce(1)  # mirror the shipped sink (r12)
                    .write.mode("append")
                    .parquet(regs_dir)
                )
                times.append(time.perf_counter() - b0)

            schema = spark.read.parquet(f"{root}/src").schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{root}/src")
            )
            t2 = time.perf_counter()
            q = (
                stream.writeStream.foreachBatch(
                    sev.idempotent_foreach_batch(apply, f"{root}/work/markers")
                )
                .option("checkpointLocation", f"{root}/work/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            t3 = time.perf_counter()
            regs = (
                spark.read.parquet(regs_dir)
                .groupBy("idx")
                .agg(F.max("m").alias("m"))
            )
            regs.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            sink_s = sum(times)
            print(
                f"rep{rep} {name}: src_prep={t1-t0:.2f}s "
                f"stream_total={t3-t2:.2f}s sink_batches={sink_s:.2f}s "
                f"(n={len(times)}: {['%.2f' % x for x in times]}) "
                f"engine_overhead={t3-t2-sink_s:.2f}s readout={t4-t3:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
