"""Commit-path microbench (r6 VERDICT items 1 + 7): decomposed timings
for the transaction log's write lifecycle — staging (bloom-indexed, so
data-proportional work runs executor-side), commit, checkpointed vs
full replay, checkpoint write — at a sweep of file counts and
rows-per-file.

Two claims this records round-over-round:

* **append latency is O(files), not O(rows-per-file), when a bloom
  index is declared** — the round-7 executor-side harvest removed the
  driver-side indexed-column read, so quadrupling rows-per-file at a
  fixed file count must not quadruple staging time (the distributed
  job absorbs it across local[32]);
* **replay/checkpoint stay O(files)** — their cost is the add-action
  count, never the data.

Usage::

    python tools/bench_commit_path.py            # writes BENCH_commit.json
    python tools/bench_commit_path.py --files 10000   # the big sweep point

Output: one JSON line per configuration with
``{files, rows_per_file, stage_commit_s, replay_ckpt_s, replay_full_s,
checkpoint_s}`` plus a summary dict, also written to
``BENCH_commit.json`` at the repo root.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (  # noqa: E402
    get_spark,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.lakehouse import (  # noqa: E402
    TransactionLog,
)


def run_config(spark, n_files: int, rows_per_file: int) -> dict:
    from pyspark.sql import functions as F

    t = TransactionLog(
        tempfile.mkdtemp(prefix="bench-commit-") + "/t",
        checkpoint_interval=10_000_000,  # manual checkpoint timing below
    )
    n_rows = n_files * rows_per_file
    src = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .coalesce(1)
    )
    t.append(src.limit(0))
    t.add_bloom_index("k")

    t0 = time.time()
    v = t.append(src, max_records_per_file=rows_per_file)
    stage_commit = time.time() - t0

    t0 = time.time()
    st_full = t._replay(v, use_checkpoint=False)
    replay_full = time.time() - t0

    t0 = time.time()
    t._write_checkpoint(v)
    checkpoint = time.time() - t0

    t0 = time.time()
    st_ckpt = t._replay(v)
    replay_ckpt = time.time() - t0

    assert st_full["files"] == st_ckpt["files"]
    assert len(st_full["files"]) == n_files, (len(st_full["files"]), n_files)
    assert all("bloom" in a for a in st_full["files"].values())
    return {
        "files": n_files,
        "rows_per_file": rows_per_file,
        "stage_commit_s": round(stage_commit, 3),
        "replay_full_s": round(replay_full, 3),
        "checkpoint_s": round(checkpoint, 3),
        "replay_ckpt_s": round(replay_ckpt, 3),
    }


def run_concurrency(spark, writers: int = 8) -> dict:
    """Disjoint-footprint multi-writer liveness (r7): N threads each
    deleting its OWN partition of one table.  Under the old strict RMW
    rule every loser raised for a caller re-run (O(N²) whole-operation
    retries in the worst case); under the conflict-matrix rebase all N
    land in ONE pass each — the recorded claim is zero caller re-runs
    (versions gapless on the first attempt).  Wall clocks are
    informational only: on local[32] each delete already saturates the
    box, so threaded ≈ serial here — the rebase's win is the avoided
    re-execution, which on a cluster is the whole delete's compute."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    def build():
        t = TransactionLog(tempfile.mkdtemp(prefix="bench-occ-") + "/t")
        src = spark.range(writers * 1000).select(
            F.col("id").alias("k"),
            (F.col("id") % writers).cast("string").alias("part"),
        )
        t.append(src, ["part"])
        return t

    t = build()
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=writers) as pool:
        versions = list(
            pool.map(
                lambda i: TransactionLog(t.table_path).delete_where(
                    spark, f"part = '{i}' AND k % 2 = 0"
                ),
                range(writers),
            )
        )
    threaded = time.time() - t0
    # gapless on the FIRST pass == zero caller re-runs: under the old
    # strict rule, all but one writer would have raised here
    assert sorted(versions) == list(range(2, writers + 2))

    t = build()
    t0 = time.time()
    for i in range(writers):
        t.delete_where(spark, f"part = '{i}' AND k % 2 = 0")
    serial = time.time() - t0
    return {
        "writers": writers,
        "caller_reruns": 0,
        "disjoint_threaded_s": round(threaded, 3),
        "serial_s": round(serial, 3),
    }


def run_log_scale(
    commits: int = 100_000,
    adds_per_commit: int = 10,
    interval: int = 10_000,
    churn_window: int | None = None,
) -> dict:
    """Lake-scale LOG replay (r7 VERDICT item 3): a synthetic log of
    ~10^5 commits / ~10^6 add actions — the metadata volume of a
    100 TB table — measuring cold ``snapshot()`` state reconstruction
    with and without checkpoints.

    The claim this records: replay is **O(checkpoint + tail)**, never
    a quadratic log walk — which requires BOTH (a) the read path
    starting from ``_last_checkpoint`` + ≤interval tail commits, and
    (b) the checkpoint WRITE path being incremental (previous
    checkpoint + tail; the r8 fix — a from-scratch replay per
    checkpoint write is O(commits²) over the table's life and shows
    up here as a build that never finishes).

    Commit records are synthesized straight through ``_try_commit``
    (the real commit primitive, including its checkpoint trigger) —
    no Spark session and no data files: replay cost is a pure
    function of the log, which is the point.

    Two shapes:

    * ``churn_window=None`` — pure append: live set == cumulative
      history (worst case for a checkpoint, which then carries every
      add ever written; the win is parquet+batch-parse vs 10^5 file
      opens).
    * ``churn_window=W`` — streaming ingest + TTL retention: commit v
      also removes commit v-W's files, so the live set stays ~W×adds
      while the HISTORY stays ~10^6 actions.  This is the realistic
      100 TB shape, and the checkpoint win is structural: the full
      walk must parse every action ever committed, the checkpointed
      replay reads a tiny live set + ≤interval tail.
    """
    log = TransactionLog(
        tempfile.mkdtemp(prefix="bench-logscale-") + "/t",
        checkpoint_interval=interval,
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    def paths(v: int) -> list[str]:
        return [
            f"p={v % 64}/part-{v:07d}-{i}.parquet"
            for i in range(adds_per_commit)
        ]

    t0 = time.time()
    for v in range(1, commits + 1):
        adds = [
            {
                "path": p,
                "size": 1048576,
                "rows": 1000,
                "partition_values": {"p": str(v % 64)},
                "stats": {
                    "k": {
                        "min": (v - 1) * adds_per_commit + i,
                        "max": (v - 1) * adds_per_commit + i + 999,
                        "nulls": 0,
                    }
                },
            }
            for i, p in enumerate(paths(v))
        ]
        rec = {
            "version": v,
            "op": "append" if churn_window is None else "delete",
            "dataChange": True,
            "ts": f"2026-01-01T00:00:00.{v:06d}Z",
            "txn": f"bench{v:07d}",
            "schema": schema,
            "partition_keys": ["p"],
            "add": adds,
        }
        if churn_window is not None and v > churn_window:
            rec["remove"] = paths(v - churn_window)
        log._try_commit(v, rec)
    build_s = time.time() - t0

    latest = log.latest_version()
    t0 = time.time()
    st_ckpt = log._replay(latest)
    replay_ckpt = time.time() - t0

    t0 = time.time()
    st_tail0 = log._replay(latest - (latest % interval))  # at a ckpt
    replay_at_ckpt = time.time() - t0

    t0 = time.time()
    st_full = log._replay(latest, use_checkpoint=False)
    replay_full = time.time() - t0

    n_adds = commits * adds_per_commit
    live = (
        n_adds
        if churn_window is None
        else min(commits, churn_window) * adds_per_commit
    )
    assert len(st_ckpt["files"]) == live, (len(st_ckpt["files"]), live)
    assert st_ckpt == st_full, "checkpointed state diverged from full walk"
    assert len(st_tail0["files"]) % adds_per_commit == 0
    return {
        "shape": "append-only" if churn_window is None else "churn",
        "commits": commits,
        "add_actions": n_adds,
        "live_files": live,
        "checkpoint_interval": interval,
        "build_s": round(build_s, 3),
        "replay_ckpt_tail_s": round(replay_ckpt, 3),
        "replay_at_checkpoint_s": round(replay_at_ckpt, 3),
        "replay_full_walk_s": round(replay_full, 3),
        "ckpt_speedup_x": round(replay_full / max(replay_ckpt, 1e-9), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=None,
                    help="single sweep point at this file count")
    ap.add_argument("--log-commits", type=int, default=100_000,
                    help="synthetic-log replay bench size")
    args = ap.parse_args()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # default sweep: file-count scaling at fixed rows/file (1k and the
    # r6-VERDICT 10k point), plus rows-per-file scaling at fixed files
    # (the executor-side-harvest claim: latency must NOT track rows)
    configs = (
        [(args.files, 100)]
        if args.files
        else [(1000, 100), (10000, 100), (1000, 400), (1000, 1600)]
    )
    results = [run_config(spark, nf, rpf) for nf, rpf in configs]
    for r in results:
        print(json.dumps(r))
    occ = run_concurrency(spark)
    print(json.dumps(occ))
    logscale = [
        run_log_scale(commits=args.log_commits),
        run_log_scale(commits=args.log_commits, churn_window=64),
    ]
    for r in logscale:
        print(json.dumps(r))
    out = {
        "metric": "commit_path_lifecycle",
        "unit": "sec",
        "configs": results,
        "concurrency": occ,
        "log_scale_replay": logscale,
    }
    Path(__file__).resolve().parent.parent.joinpath("BENCH_commit.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({"wrote": "BENCH_commit.json", "n": len(results)}))


if __name__ == "__main__":
    main()
