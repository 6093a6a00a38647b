#!/usr/bin/env python
"""Run the training-corpus curation pipeline end-to-end: near-dup
removal (MinHash-LSH) → quality filter → deterministic train/holdout
split → partitioned parquet sink, plus the companion artifacts a
curation run produces (duplicate clusters, contamination report).

Usage:  python examples/run_curation.py [sf_dir] [outdir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp())

    import __spark_entry__ as entry

    spark = get_spark(app_name="curation-example")
    qs = entry.queries()

    curated = qs["curate_training_corpus"](spark, sf_dir)
    curated.write.mode("overwrite").partitionBy("split").parquet(
        str(outdir / "curated")
    )

    clusters = qs["dedup_duplicate_clusters"](spark, sf_dir)
    clusters.write.mode("overwrite").parquet(str(outdir / "dup_clusters"))

    contam = qs["text_contamination_overlap"](spark, sf_dir)
    contam.write.mode("overwrite").parquet(str(outdir / "contamination"))

    kept = spark.read.parquet(str(outdir / "curated"))
    by_split = {r.split: r.n for r in kept.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    print(f"curated corpus: {sum(by_split.values())} docs {by_split} -> {outdir}/curated")
    print(f"duplicate clusters: {spark.read.parquet(str(outdir / 'dup_clusters')).count()} membership rows")
    print(f"contaminated docs: {spark.read.parquet(str(outdir / 'contamination')).count()}")


if __name__ == "__main__":
    main()
