"""Break down the minhash_512mb bench row: signature stage vs LSH
exchange tail, and the tail's sensitivity to partition count at the
small-corpus end (the 8-GiB-end probe is tools/probe_exchange.py).

The bench row is 128 x 4 MiB docs -> 4096 band rows; at that size the
hash-shuffle exchange is pure fixed cost, so this probe tells us whether
a size-aware n_part floor is worth it.

Usage: RAY_GRAFT_CPUS=32 python tools/probe_minhash_tail.py [n_part ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    import bench

    n_parts = [int(x) for x in sys.argv[1:]] or [2, 4, 8]
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    corpus = bench.synthetic_corpus(cpus)
    total_mb = (bench.CORPUS_DOCS * bench.DOC_BYTES) / 1e6

    from plakar_ray.pipelines.dedup import near_dup_pairs
    from plakar_ray.stages.minhash import minhash_signatures

    # warm
    near_dup_pairs(
        corpus.limit(min(512, bench.CORPUS_DOCS)), "fastcdc", None,
        num_perm=128, bands=32, concurrency=(1, cpus), local_threshold=0,
    ).count()

    for _ in range(3):
        t0 = time.time()
        minhash_signatures(
            corpus, algo="fastcdc", opts=None, num_perm=128,
            concurrency=(1, cpus),
        ).materialize()
        print(f"signatures only: {time.time() - t0:.2f}s", flush=True)

    for np_ in n_parts:
        os.environ["PLAKAR_LSH_PARTITIONS"] = str(np_)
        walls = []
        for _ in range(3):
            t0 = time.time()
            near_dup_pairs(
                corpus, "fastcdc", None, num_perm=128, bands=32,
                concurrency=(1, cpus), local_threshold=0,
            ).count()
            walls.append(time.time() - t0)
        print(
            f"cpus={cpus} n_part={np_}: best {min(walls):.2f}s "
            f"({total_mb / min(walls):.0f} MB/s) runs={[round(w, 2) for w in walls]}",
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
