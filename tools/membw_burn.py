"""Host memory-bandwidth scaling ceiling: the honest denominator for
native-kernel strong scaling on ONE box.

The round-3 native C kernels are DRAM-bound (~2.5 GB/s/core chunking +
sha256 digest traffic), so 4->16 worker scaling on a single host is capped
by how much extra bandwidth the 12 extra workers can actually draw from
the shared memory system — a ceiling that does NOT exist between cluster
NODES, each of which brings its own memory controllers. This burn measures
that ceiling directly: K processes each stream-copy a 512 MiB buffer
(read+write, the same traffic pattern as a boundary scan + digest pass)
and we report aggregate GB/s at both worker counts plus the host's own
bandwidth scaling efficiency. Engine scaling on this host should be judged
against THIS number, not against 1.0 (the multiprocessing analogue of
round 1's CPU burn test).

Usage: python tools/membw_burn.py [n_low n_high] [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 512
PASSES = 8


def _burn(q):
    src = np.random.default_rng(1).integers(0, 255, BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm / fault pages
    t0 = time.perf_counter()
    for _ in range(PASSES):
        np.copyto(dst, src)
    wall = time.perf_counter() - t0
    # read + write traffic per pass
    q.put((2 * PASSES * BUF_MB / 1024.0) / wall)


def measure(n_procs: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_burn, args=(q,)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/membw_burn_r3.json"
    results = {}
    for n in (n_low, n_high, n_low, n_high):  # ABAB to average host drift
        results.setdefault(n, []).append(measure(n))
    lo = max(results[n_low])
    hi = max(results[n_high])
    out = {
        "metric": f"host_membw_scaling_{n_low}_to_{n_high}_procs",
        "value": round(hi / (lo * n_high / n_low), 3),
        "unit": "ratio",
        "aggregate_gb_s": {str(n_low): round(lo, 1), str(n_high): round(hi, 1)},
        "all_runs_gb_s": {str(k): [round(v, 1) for v in vs] for k, vs in results.items()},
        "buf_mb": BUF_MB,
        "passes": PASSES,
        "note": "stream-copy read+write traffic; ABAB interleaved, best per level",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
