"""Attribute the signature stage's 4->16 scaling plateau: Ray overhead vs
the host's shared-memory ceiling.

Runs the EXACT per-batch signature kernel (chunk boundaries + wfnv shingle
hash + permutation minima, stages/minhash.py machinery) under plain
multiprocessing at K procs over the same per-proc workload, no Ray at all.
If this in-process kernel also scales at ~0.75 from 4 to 16 procs, the
plateau is the host (shared LLC/DRAM) and the membw burn is the honest
denominator; if it scales ~1.0, the gap is Ray-side (task dispatch,
object-store copies) and worth engineering.

Usage: python tools/sig_kernel_scaling.py [n_low n_high] [doc_kb per_proc_mb]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(doc_bytes: int, total_bytes: int, q) -> None:
    import numpy as np
    import pyarrow as pa

    from plakar_ray.stages.minhash import MinHashStage

    n_docs = max(1, total_bytes // doc_bytes)
    rng = np.random.default_rng(1234)
    texts = [
        rng.integers(32, 127, doc_bytes, dtype=np.uint8).tobytes().decode("ascii")
        for _ in range(n_docs)
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(n_docs), type=pa.int64()), "text": pa.array(texts)}
    )
    stage = MinHashStage(algo="fastcdc", opts=None, num_perm=128, seed=1337)
    stage(batch)  # warm: build tables, compile, fault pages
    t0 = time.perf_counter()
    stage(batch)
    wall = time.perf_counter() - t0
    q.put((n_docs * doc_bytes) / wall / 1e6)


def run_level(k: int, doc_bytes: int, per_proc_mb: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(doc_bytes, per_proc_mb << 20, q))
        for _ in range(k)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    del t0
    return sum(rates)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    doc_kb = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    per_proc_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    out = {}
    # ABAB interleave so a contention window hits both levels equally.
    for _ in range(2):
        for k in (n_low, n_high):
            mbps = run_level(k, doc_kb << 10, per_proc_mb)
            out.setdefault(k, []).append(mbps)
            print(f"k={k}: aggregate {mbps:.0f} MB/s", flush=True)
    best_lo, best_hi = max(out[n_low]), max(out[n_high])
    eff = best_hi / (best_lo * (n_high / n_low))
    print(
        f"kernel-only scaling {n_low}->{n_high}: {best_lo:.0f} -> {best_hi:.0f} MB/s, "
        f"efficiency {eff:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
