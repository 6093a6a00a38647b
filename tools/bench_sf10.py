#!/usr/bin/env python
"""sf10 scale-decade bench for the dedup/ANN tier (VERDICT r5 item 4).

``tools/bench_sf1.py`` proved every heavy query ≤5.1× at 10× the
driver corpus; this tool pushes the document/embedding tier one more
decade (100× sf0.1 → 500k docs / 200k vectors) and gates the
sf10/sf1 ratio at 20× — the same super-linearity law
(`tools/scale_check.py`) one scale up.  The round-5 offenders all
shared one cause — fixed-domain blocking keys — and the residual
fixed domains (16-bit simhash blocks, 8-bit LSH bands) are exactly
the ones another decade of corpus would saturate first.

Scaling recipe (documents/embeddings only — the subset below reads
nothing else):

* ``documents`` ×100 — replica-tagged tokens, exactly the bench_sf1
  recipe: within-replica near-dup structure preserved, zero
  cross-replica shingle overlap, so true pair volume grows linearly.
* ``embeddings`` ×100 — per-replica INDEPENDENT sign-hash jitter
  (``eps * (xxhash64(replica, j) mod 2 ? +1 : -1)``), NOT bench_sf1's
  linear ramp.  The ramp adds ``replica * 0.003 * pattern`` along one
  fixed direction; at 100 replicas the offset norm reaches ~5× the
  unit-vector norm, so all high replicas collapse toward the pattern
  direction and become MUTUALLY near-dup (quadratic true-pair
  volume — the corpus would be sick, not the engine).  Independent
  ±eps jitter (eps=0.1, jitter norm 0.8) keeps same-replica pair
  structure (both sides shift by the same vector, distances exact;
  cosine threshold 0.95 maps to ~0.918 on the base — a constant
  per-replica factor) while cross-replica cosine for the SAME
  original is ~c/1.64 ≤ 0.61 — far below threshold, so true pairs
  stay linear in the corpus.

Run:  python tools/bench_sf10.py            (writes BENCH_sf10.json)
Data: /tmp/spark_graft_sf10 (~1.2 GB, regenerated when missing or
      when the driver testdata changed); the sf1 corpus side comes
      from bench_sf1's generator (reused, regenerated if missing).
Exit: 1 when any query's sf10/sf1 ratio exceeds --ratio-limit (20).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_sf1  # noqa: E402  (sibling tool: sf1 corpus generator)

SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/spark_graft_sf10"
REPLICAS = 100
JITTER_EPS = 0.1

#: the document/embedding tier — every entry that reads ONLY the two
#: scaled tables (the CDC/TPC-H band stays covered by bench_sf1).
SUBSET = [
    "dedup_exact_text",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_duplicate_clusters",
    # hashed gram keys are the scale-primary span-dedup slot (see
    # bench_sf1.SUBSET note); the string-keyed sibling anchors parity
    # at the driver SFs only
    "dedup_shared_ngram_spans_hashed",
    "dedup_simhash_hamming_pairs",
    "dedup_edit_distance_pairs",
    "dedup_embedding_cosine_pairs_banded",
    # heaviest slot (~134s at sf10): within-cluster pairwise cosine is
    # SemDeDup's irreducible compute (the paper runs it on GPUs); the
    # r8 fixed-cluster-width + two-level-quantizer design holds the
    # ratio at ~4x (was 11.4x under the sqrt-k policy)
    "dedup_semdedup_embeddings",
    "ann_cosine_topk",
    "ann_lsh_multiprobe_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk",
    "embedding_pq_codes",
    "curate_training_corpus",
    "text_tfidf_top_terms",
    "text_bm25_search",
    "search_hybrid_rrf",
    # round-8 late additions (documents/embeddings only)
    "ann_ivf_pq_adc_topk",
    "ann_ivf_pq_persisted_topk",
    "ann_recall_eval",
    "ann_matryoshka_rerank_topk",
    "mine_hard_negatives",
    "text_bigram_perplexity",
    "dedup_minhash_estimate_error",
    "curate_ccnet_corpus",
    # round-9 additions (documents/embeddings only)
    "filter_repeated_blocks_c4",
    "text_trigram_stupid_backoff",
    "corpus_unimax_budget_mix",
    "stats_ks_test_chars",
    "dedup_minhash_containment_pairs",
    "quality_ensemble_vote",
    "ann_mmr_diversified_topk",
    # round 11: excess-loss curation pair (documents only)
    "corpus_doremi_proxy_weights",
    "curate_rho_loss_selection",
]

#: sf1 times under this are noise-dominated; ratio uses the floor.
SMALL_FLOOR_S = 0.3


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
        load_table,
    )

    docs = load_table(spark, SRC_SF, "documents")
    n_docs = docs.count()
    emb = load_table(spark, SRC_SF, "embeddings")
    n_emb = emb.count()
    replicas = spark.range(REPLICAS).withColumnRenamed("id", "replica")

    scaled_docs = (
        docs.crossJoin(replicas)
        .select(
            (F.col("doc_id") + F.col("replica") * n_docs).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(
                        F.lit("r"), F.col("replica").cast("string"), F.lit(":"), t
                    ),
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_docs.repartition(64).write.mode("overwrite").parquet(
        f"{OUT_DIR}/documents.parquet"
    )

    # independent ±eps sign-hash jitter per (replica, component);
    # replica 0 keeps the originals byte-exact so fixed ANN query ids
    # reference unmodified vectors.
    scaled_emb = (
        emb.crossJoin(replicas)
        .select(
            (F.col("vec_id") + F.col("replica") * n_emb).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, j) -> CAST(x + "
                f"  (CASE WHEN replica = 0 THEN CAST(0.0 AS DOUBLE) "
                f"        WHEN pmod(xxhash64(replica, j), 2) = 0 THEN {JITTER_EPS} "
                f"        ELSE {-JITTER_EPS} END) AS FLOAT))"
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(64).write.mode("overwrite").parquet(
        f"{OUT_DIR}/embeddings.parquet"
    )


def _fingerprint() -> dict:
    return {
        p.name: [p.stat().st_size, int(p.stat().st_mtime)]
        for p in sorted(Path(SRC_SF).glob("*.parquet"))
        if p.name in ("documents.parquet", "embeddings.parquet")
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratio-limit", type=float, default=20.0)
    ap.add_argument(
        "--queries", default=None, help="comma-separated subset override"
    )
    args = ap.parse_args()
    subset = args.queries.split(",") if args.queries else SUBSET

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
        get_spark,
    )
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench_sf10")

    # sf1 side: reuse bench_sf1's corpus (same staleness rule)
    sf1_fp = {
        p.name: [p.stat().st_size, int(p.stat().st_mtime)]
        for p in sorted(Path(SRC_SF).glob("*.parquet"))
    }
    sf1_marker = Path(bench_sf1.OUT_DIR) / "_source_fingerprint.json"
    if not (
        Path(f"{bench_sf1.OUT_DIR}/lineitem.parquet").exists()
        and sf1_marker.exists()
        and json.loads(sf1_marker.read_text()) == sf1_fp
    ):
        print("# generating sf1 corpus ...", file=sys.stderr)
        bench_sf1.generate(spark)
        sf1_marker.write_text(json.dumps(sf1_fp))

    marker = Path(OUT_DIR) / "_source_fingerprint.json"
    stale = True
    if Path(f"{OUT_DIR}/embeddings.parquet").exists() and marker.exists():
        stale = json.loads(marker.read_text()) != _fingerprint()
    if stale:
        print("# generating sf10 corpus ...", file=sys.stderr)
        t0 = time.perf_counter()
        generate(spark)
        marker.write_text(json.dumps(_fingerprint()))
        print(f"# generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    queries = entry_mod.queries()

    # bench-scoped log filter (same as bench.py): the plan-guard suite
    # proves every unpartitioned window sits over a bounded input, so
    # the WindowExec warning wall is noise that buries the per-entry
    # readout lines below.
    try:
        jvm = spark.sparkContext._jvm
        for _cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowExecBase",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                _cls, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:
        pass

    def _load() -> list[float] | None:
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:  # pragma: no cover
            return None

    # per-entry 1-min loadavg at slot START (VERDICT r10 item 1: the
    # decade run self-contaminates — loadavg rose 2.4→29 over r10's
    # run and the tail slots inherited it; a per-slot reading lets
    # each ratio self-adjudicate co-tenancy vs design)
    entry_load: dict[str, dict[str, float]] = {"sf1": {}, "sf10": {}}

    def measure(name, fn, sf_dir: str, label: str) -> float:
        spark.catalog.clearCache()
        # flatten the previous slot's GC debt (freed cache blocks,
        # shuffle buffers) OUTSIDE the measured window, then give
        # the 1-min loadavg a beat to decay before sampling it
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        la = _load()
        if la is not None:
            entry_load[label][name] = la[0]
        best = None
        for _attempt in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"# {label} {name}: {round(best, 3)}s", file=sys.stderr)
        return round(best, 3)

    # INTERLEAVED per entry (r11): the sf1 denominator and sf10
    # numerator of each ratio are measured ADJACENT in time, so both
    # see the same host state — run-to-run the r10/r11 artifacts
    # showed single slots swinging 4.1x↔7.1x purely because the two
    # passes sampled different phases of the run's own load curve
    loadavg_start = _load()
    sf1: dict[str, float] = {}
    sf10: dict[str, float] = {}
    half = len(subset) // 2
    loadavg_mid = None
    for idx, name in enumerate(subset):
        fn = queries.get(name)
        if fn is None:
            continue
        sf1[name] = measure(name, fn, bench_sf1.OUT_DIR, "sf1")
        sf10[name] = measure(name, fn, OUT_DIR, "sf10")
        if idx == half:
            loadavg_mid = _load()
    loadavg_end = _load()

    offenders = []
    ratios: dict[str, float] = {}
    for name, t10 in sf10.items():
        t1 = max(sf1.get(name, 0.0), SMALL_FLOOR_S)
        ratio = round(t10 / t1, 1)
        ratios[name] = ratio
        flag = " **SUPER-LINEAR**" if ratio > args.ratio_limit else ""
        print(f"# ratio {name}: {ratio}x{flag}", file=sys.stderr)
        if ratio > args.ratio_limit:
            offenders.append(name)

    out = {
        "metric": "sf10_docemb_wall_clock",
        "value": round(sum(sf10.values()), 3),
        "unit": "sec",
        "queries": sf10,
        "sf1_queries": sf1,
        "ratios": ratios,
        "sf": 10.0,
        "n_docs": 5000 * REPLICAS,
        "n_embeddings": 2000 * REPLICAS,
        "ratio_limit": args.ratio_limit,
        "offenders": offenders,
        # host-load annotation (VERDICT r8 item 3): the start reading is
        # the idleness signal; mid = between the sf1 and sf10 passes
        # (reflects the bench's own threads by then)
        "loadavg": {
            "start": loadavg_start,
            "mid": loadavg_mid,
            "end": loadavg_end,
        },
        # 1-min loadavg sampled at each slot's start (post-GC, 1s
        # settle) — a high reading on a high-ratio slot = co-tenancy,
        # not design
        "entry_loadavg": entry_load,
    }
    print(json.dumps(out))
    if args.queries:
        # subset/debug runs must never clobber the committed full record
        print("# subset run: BENCH_sf10.json NOT rewritten", file=sys.stderr)
        return 1 if offenders else 0
    (Path(REPO_ROOT) / "BENCH_sf10.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main())
