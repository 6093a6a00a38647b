#!/usr/bin/env python
"""Super-linearity detector (the round-5 lesson, operationalized).

Every round-5 scale bug had the same signature: a query whose sf1
(10x) time was far more than 10x its sf0.1 time, because a candidate
generator used a FIXED-domain blocking key (length buckets, 4-bit LSH
bands, 8-bit simhash blocks) whose bucket population grows linearly
with the corpus — making pair volume quadratic.

This tool reads the two recorded benches and flags any query whose
sf1/sf0.1 ratio exceeds ``RATIO_LIMIT`` (default 20 — 10x data with
2x slack for shuffle constants; the r5 offenders measured 55-180x
before their fixes, so the gap between healthy and sick is wide).

Run after regenerating both benches:
    python bench.py             (writes the sf0.1 numbers to stdout;
                                 pass --bench-json to point at a saved copy)
    python tools/bench_sf1.py   (writes BENCH_sf1.json)
    python tools/scale_check.py [--bench-json PATH]

Exit code 1 when any overlapping query is super-linear, so CI or the
per-round driver can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RATIO_LIMIT = 20.0
#: sf0.1 times under this are noise-dominated (JVM jitter ~100 ms);
#: compare against the floor instead of the raw number.
SMALL_FLOOR_S = 0.15


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--bench-json",
        default=None,
        help="saved bench.py output (one JSON line). Default: the most "
        "recent BENCH_r*.json in the repo root.",
    )
    ap.add_argument("--ratio-limit", type=float, default=RATIO_LIMIT)
    args = ap.parse_args()

    sf1 = json.loads((REPO / "BENCH_sf1.json").read_text())
    if args.bench_json:
        base = json.loads(Path(args.bench_json).read_text())
    else:
        rounds = sorted(REPO.glob("BENCH_r*.json"))
        if not rounds:
            print("no BENCH_r*.json found; pass --bench-json", file=sys.stderr)
            return 2
        base = json.loads(rounds[-1].read_text())
    base_q = dict(base.get("queries", {}))
    base_q.update(base.get("band2", {}).get("queries", {}))
    # bench_sf1 self-records its own sf0.1 leg for every heavy query —
    # prefer it (same JVM, same protocol) and fall back to the bench
    # bands for anything missing.
    base_q.update(sf1.get("sf01_queries", {}))

    bad = []
    print(f"{'query':42s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    for name, t1 in sorted(sf1["queries"].items()):
        t01 = base_q.get(name)
        if t01 is None:
            continue  # sf1-only entry: no same-query baseline recorded
        ratio = t1 / max(t01, SMALL_FLOOR_S)
        flag = "  <-- SUPER-LINEAR" if ratio > args.ratio_limit else ""
        print(f"{name:42s} {t01:8.3f} {t1:8.3f} {ratio:7.1f}{flag}")
        if ratio > args.ratio_limit:
            bad.append((name, ratio))
    if bad:
        print(
            f"\n{len(bad)} super-linear quer{'y' if len(bad)==1 else 'ies'} "
            f"(ratio > {args.ratio_limit}); suspect a fixed-domain blocking "
            "key — see SURVEY.md round-5 notes",
            file=sys.stderr,
        )
        return 1
    print("\nall overlapping queries scale linearly (within slack)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
