"""CPU-profile one chunking run — the pprof harness, SURVEY section 2 #28.

Mirrors the reference's profiling harness (profiling/profiling.go:18-61):
chunk a 512 MiB seeded-random corpus with one algorithm and emit a CPU
profile. The reference uses runtime/pprof on the Go chunker loop; here the
hot path is the vectorized NumPy kernel, so we run cProfile over
`registry.chunk_lengths` on the same workload and print the cumulative-time
table (plus save the raw .prof for `python -m pstats` / snakeviz).

No Ray involved — the kernels are pure single-process NumPy, which is
exactly what one Ray worker executes per block; profiling them standalone
profiles the distributed hot loop.

    python tools/profile_kernels.py [--method fastcdc] [--mib 512] [--top 25]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plakar_ray import registry  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="fastcdc",
                    help="registry algorithm name (default fastcdc)")
    ap.add_argument("--mib", type=int, default=512,
                    help="corpus size in MiB (reference uses 512)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/cdc_cpu.prof")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=args.mib << 20, dtype=np.uint8)

    # Untimed warm-up pass on a small slice: first call pays table setup /
    # JIT-ish numpy dispatch, same as the Go harness's steady-state loop.
    registry.chunk_lengths(args.method, data[: 4 << 20])

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    lengths = registry.chunk_lengths(args.method, data)
    prof.disable()
    dt = time.perf_counter() - t0

    prof.dump_stats(args.out)
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(args.top)
    print(s.getvalue())
    mb = args.mib
    print(f"method={args.method} corpus={mb} MiB chunks={lengths.size} "
          f"wall={dt:.2f}s throughput={mb / dt:.1f} MB/s profile={args.out}")
    print("inspect: python -m pstats", args.out)


if __name__ == "__main__":
    main()
