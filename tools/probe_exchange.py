"""Probe the LSH band-exchange tail: partition-count sensitivity at a
given CPU count.

Times the minhash end-to-end row (signature stage reused across probes;
exchange re-run per n_part) on the web-page scaling corpus, to pick the
PLAKAR_LSH_PARTITIONS default that lets the exchange scale with workers.

Usage: RAY_GRAFT_CPUS=16 python tools/probe_exchange.py [n_part ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_DOCS", "65536")  # 4 GiB default for probing
os.environ.setdefault("BENCH_DOC_BYTES", "65536")
os.environ.setdefault("BENCH_DUP_FRAC", "0.125")


def main() -> None:
    import ray

    import bench

    n_parts = [int(x) for x in sys.argv[1:]] or [8, 16, 32, 64]
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    corpus = bench.synthetic_corpus(cpus)
    total_mb = (bench.CORPUS_DOCS * bench.DOC_BYTES) / 1e6

    from plakar_ray.pipelines.dedup import near_dup_pairs

    # warm workers + aggregator machinery once, untimed
    near_dup_pairs(
        corpus.limit(512), "fastcdc", None, num_perm=128, bands=32,
        concurrency=(1, cpus), local_threshold=0,
    ).count()

    for np_ in n_parts:
        os.environ["PLAKAR_LSH_PARTITIONS"] = str(np_)
        walls = []
        for _ in range(3):
            t0 = time.time()
            n_edges = near_dup_pairs(
                corpus, "fastcdc", None, num_perm=128, bands=32,
                concurrency=(1, cpus), local_threshold=0,
            ).count()
            walls.append(time.time() - t0)
        best = min(walls)
        print(
            f"cpus={cpus} n_part={np_}: best {best:.2f}s "
            f"({total_mb / best:.0f} MB/s) runs={[round(w, 2) for w in walls]} "
            f"edges={n_edges}",
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
