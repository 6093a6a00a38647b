#!/usr/bin/env python
"""Tour the ANN memory hierarchy end-to-end and print the trade-off a
user actually reasons about: exact baseline → LSH buckets → IVF probe
→ IVF-PQ ADC → Matryoshka prefix+re-rank, each with wall time, plus
the measured recall of the approximate path against the exact ground
truth and the MinHash sketch-calibration summary — the two
"measure, don't guess" readouts that decide whether an index geometry
is safe to trust at scale.

Usage:  python examples/run_ann_tour.py [sf_dir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry

    spark = get_spark(app_name="ann-tour-example")
    qs = entry.queries()

    ladder = [
        ("exact brute-force", "ann_cosine_topk"),
        ("LSH buckets", "ann_lsh_bucket_topk"),
        ("IVF 2-probe", "ann_ivf_topk"),
        ("IVF-PQ ADC", "ann_ivf_pq_adc_topk"),
        ("Matryoshka 16d+rerank", "ann_matryoshka_rerank_topk"),
    ]
    print(f"== ANN ladder at {sf_dir} (top-5, 3 queries) ==")
    for label, name in ladder:
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        print(f"{label:24s} {len(rows):3d} rows  {dt:6.2f}s")

    print("\n== recall of the IVF path vs exact ground truth ==")
    for r in qs["ann_recall_eval"](spark, sf_dir).collect():
        print(
            f"query {r['query_id']}: {r['n_hits']} of top-5 found, "
            f"recall {r['recall_at_k']}"
        )

    print("\n== MinHash sketch calibration (est vs exact Jaccard) ==")
    errs = qs["dedup_minhash_estimate_error"](spark, sf_dir)
    from pyspark.sql import functions as F

    summary = errs.agg(
        F.count("*").alias("pairs"),
        F.round(F.avg("abs_err"), 4).alias("mae"),
        F.round(F.max("abs_err"), 4).alias("worst"),
    ).collect()[0]
    print(
        f"{summary['pairs']} candidate pairs, MAE {summary['mae']}, "
        f"worst {summary['worst']}"
    )

    print("\n== contrastive pairs (1 positive + 5 hard negatives) ==")
    for r in qs["mine_hard_negatives"](spark, sf_dir).collect()[:6]:
        print(
            f"anchor {r['query_id']} {r['role']}#{r['rank']}: "
            f"vec {r['vec_id']} (label {r['label']}) cos {r['cos_sim']}"
        )


if __name__ == "__main__":
    main()
