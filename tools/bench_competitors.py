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
    # Comparative CDC quality, mirroring the reference's analyze/resync
    # metrics (cmd/cdc/stats.go, cmd/cdc/resync.go): dedup ratio on a 2x
    # duplicated corpus, and resync shared% after 64 random insertions.
    import hashlib

    base = rng.integers(0, 256, size=16 << 20, dtype=np.uint8)
    dup_doc = np.concatenate([base, base])
    edited = base.copy()
    ins_pos = np.sort(rng.integers(0, base.shape[0], size=64))
    ins_byte = rng.integers(0, 256, size=64, dtype=np.uint8)
    edited = np.insert(edited, ins_pos, ins_byte)

    def digests(doc, lens):
        ends = np.cumsum(lens)
        out = {}
        for e, ln in zip(ends.tolist(), lens.tolist()):
            out.setdefault(hashlib.sha256(doc[e - ln : e].tobytes()).digest(), ln)
        return out

    for algo in ALGOS:
        lens = chunk_lengths(algo, dup_doc, opts)
        d = digests(dup_doc, lens)
        rows[algo]["dedup_ratio_2x"] = round(sum(d.values()) / dup_doc.shape[0], 4)
        orig = digests(base, chunk_lengths(algo, base, opts))
        lens_e = chunk_lengths(algo, edited, opts)
        ends = np.cumsum(lens_e)
        shared = sum(
            ln for e, ln in zip(ends.tolist(), lens_e.tolist())
            if hashlib.sha256(edited[e - ln : e].tobytes()).digest() in orig
        )
        rows[algo]["resync_shared_pct_64ins"] = round(100.0 * shared / edited.shape[0], 2)
        print(f"{algo:16s} dedup_2x {rows[algo]['dedup_ratio_2x']:.4f}  "
              f"resync {rows[algo]['resync_shared_pct_64ins']:.2f}%")

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
