"""Competitor benchmark: our registry algorithms vs the from-scratch
buzhash baseline on the reference's workload shape (seeded random data,
2K/8K/64K config) — the sandbox analogue of
/root/reference/benchmarks/chunkers_test.go:23-412 (the Go competitor
libraries don't exist here, so the competitor is implemented in-repo with
the same oracle+kernel discipline; see plakar_ray/competitors.py).

Usage: python tools/bench_competitors.py [--mb 256] [--out BENCH/competitors.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import plakar_ray.competitors  # noqa: F401  (registers buzhash)
from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import chunk_lengths

ALGOS = ["fastcdc", "jc", "jc-v1.1.0", "ultracdc", "fastcdc4stadia", "buzhash"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--out", default="BENCH/competitors.json")
    args = ap.parse_args()

    opts = ChunkerOpts(2048, 65536, 8192)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=args.mb << 20, dtype=np.uint8)
    rows = {}
    for algo in ALGOS:
        chunk_lengths(algo, data[: 4 << 20], opts)  # warm caches/tables
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lens = chunk_lengths(algo, data, opts)
            best = min(best, time.perf_counter() - t0)
        rows[algo] = {
            "mb_per_s": round(args.mb / best, 1),
            "chunks": int(lens.shape[0]),
            "mean_len": int(lens.mean()),
        }
        print(f"{algo:16s} {rows[algo]['mb_per_s']:8.1f} MB/s  "
              f"{rows[algo]['chunks']:7d} chunks  mean {rows[algo]['mean_len']}")
    out = {
        "metric": "competitor_chunking_mb_per_s_single_core",
        "config": "2K/8K/64K seeded random",
        "mb": args.mb,
        "algos": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
