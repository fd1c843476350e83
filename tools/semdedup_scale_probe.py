"""SemDeDup sharded-fit scale probe (round-5 verdict item #2 evidence).

Synthesizes a clustered embedding corpus far past the old 2048-sample
driver fit's regime, runs semantic_dedup end-to-end with the SHARDED
k-means fit forced (local fast path disabled), and records: fitted K (must
scale with n via target_cell_size), wall time, cell-size distribution
(max/p99 — no quadratic funnel), and dedup counts. One JSON line to
stdout; pass an output path to also write it under BENCH/.

    python tools/semdedup_scale_probe.py [n_vecs] [dim] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth(n: int, dim: int, seed: int = 9) -> pa.Table:
    """Skewed clustered corpus: 60% of rows in 8 dominant modes, the rest
    spread over 120 minor modes (mode noise sized so same-mode cosine ~0.92
    stays under the 0.95 threshold), 3% exact near-dups planted."""
    rng = np.random.default_rng(seed)
    major = rng.standard_normal((8, dim))
    minor = rng.standard_normal((120, dim))
    n_major = int(0.6 * n)
    picks_a = rng.integers(0, 8, n_major)
    picks_b = rng.integers(0, 120, n - n_major)
    vecs = np.vstack(
        [
            major[picks_a] + 0.35 * rng.standard_normal((n_major, dim)),
            minor[picks_b] + 0.35 * rng.standard_normal((n - n_major, dim)),
        ]
    ).astype(np.float32)
    n_dup = int(0.03 * n)
    src = rng.integers(0, n - n_dup, n_dup)
    vecs[n - n_dup :] = vecs[src] + 1e-4 * rng.standard_normal((n_dup, dim)).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), dim
            ),
        }
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="error",
        )

    from plakar_ray.stages import embed

    target_cell = 1024
    t = synth(n, dim)
    ds = ray.data.from_arrow(t).repartition(32)

    # force the sharded iteration path — the probe certifies the scale fit
    orig = embed._fit_kmeans_sharded

    def sharded_only(ds_, k, vec_col, seed, n_iters=4, local_threshold_bytes=0):
        return orig(ds_, k, vec_col, seed, n_iters, local_threshold_bytes=0)

    embed._fit_kmeans_sharded = sharded_only
    try:
        t0 = time.perf_counter()
        res = embed.semantic_dedup(
            ds, threshold=0.95, target_cell_size=target_cell
        ).to_pandas()
        wall = time.perf_counter() - t0
    finally:
        embed._fit_kmeans_sharded = orig

    sizes = res.groupby("cell").size().sort_values()
    k_expected = max(16, n // target_cell)
    report = {
        "metric": "semdedup_sharded_fit_probe",
        "n_vecs": n,
        "dim": dim,
        "target_cell_size": target_cell,
        "k_expected": int(k_expected),
        "cells_nonempty": int(sizes.shape[0]),
        "cell_max": int(sizes.max()),
        "cell_p99": int(sizes.quantile(0.99)),
        "cell_median": int(sizes.median()),
        "dropped": int((~res["kept"]).sum()),
        "wall_s": round(wall, 2),
        "unit": "sec",
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
