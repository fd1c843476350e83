"""label_propagation at real edge scale (VERDICT r2 item #6).

Synthesizes a deterministic >=2M-edge graph shaped like LSH candidate
output — many near-clique duplicate clusters plus long chains (the
diameter worst case label propagation must actually iterate on) — runs
the distributed label_propagation path, asserts exact equality against
the driver union-find on the same edges, and writes the convergence
metrics artifact.

Usage: python tools/run_labelprop_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = int(os.environ.get("LP_CLUSTERS", "200000"))
CLUSTER_SIZE = int(os.environ.get("LP_CLUSTER_SIZE", "10"))
N_CHAINS = int(os.environ.get("LP_CHAINS", "32"))
CHAIN_LEN = int(os.environ.get("LP_CHAIN_LEN", "2000"))


def synth_edges(seed: int = 7) -> pa.Table:
    """Near-clique clusters (ring + one chord per member, like salted LSH
    bucket stars) + long path chains. Node ids are shuffled so cluster
    membership is not contiguous in id space."""
    rng = np.random.default_rng(seed)
    n_cluster_nodes = N_CLUSTERS * CLUSTER_SIZE
    n_chain_nodes = N_CHAINS * CHAIN_LEN
    n_nodes = n_cluster_nodes + n_chain_nodes
    perm = rng.permutation(n_nodes).astype(np.int64)

    members = perm[:n_cluster_nodes].reshape(N_CLUSTERS, CLUSTER_SIZE)
    ring_a = members.reshape(-1)
    ring_b = np.roll(members, -1, axis=1).reshape(-1)
    chord_b = members[
        np.arange(N_CLUSTERS)[:, None],
        rng.integers(0, CLUSTER_SIZE, size=(N_CLUSTERS, CLUSTER_SIZE)),
    ].reshape(-1)

    chains = perm[n_cluster_nodes:].reshape(N_CHAINS, CHAIN_LEN)
    chain_a = chains[:, :-1].reshape(-1)
    chain_b = chains[:, 1:].reshape(-1)

    a = np.concatenate([ring_a, ring_a, chain_a])
    b = np.concatenate([ring_b, chord_b, chain_b])
    keep = a != b
    a, b = a[keep], b[keep]
    order = rng.permutation(a.shape[0])
    return pa.table(
        {
            "id_a": pa.array(a[order], type=pa.int64()),
            "id_b": pa.array(b[order], type=pa.int64()),
        }
    )


def main() -> None:
    import ray
    import ray.data as rd

    from plakar_ray.state.unionfind import connected_components_ds, label_propagation

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/labelprop_scale_r4.json"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )

    t0 = time.time()
    edges_tbl = synth_edges()
    n_edges = edges_tbl.num_rows
    print(f"edges: {n_edges:,}")
    edges_ds = rd.from_arrow(edges_tbl).repartition(64)

    def run_lp(threshold: int):
        metrics: list = []
        t1 = time.time()
        labels = label_propagation(
            edges_ds, metrics=metrics, finish_threshold=threshold
        ).materialize()
        wall = time.time() - t1
        lp = {}
        for batch in labels.iter_batches(batch_format="pyarrow"):
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
            lp.update(zip(ids.tolist(), cl.tolist()))
        return lp, wall, metrics

    # Default gated path (contract -> single-task finish under the gate).
    lp, lp_wall, metrics = run_lp(20_000_000)
    # Forced pure star-rounds path (finish_threshold=0) — the >gate shape.
    lp_rounds, rounds_wall, rounds_metrics = run_lp(0)

    t2 = time.time()
    uf = connected_components_ds(rd.from_arrow(edges_tbl))
    uf_wall = time.time() - t2

    assert len(lp) == len(uf), (len(lp), len(uf))
    mismatch = sum(1 for k, v in uf.items() if lp.get(k) != v)
    assert mismatch == 0, f"{mismatch} nodes disagree"
    assert lp_rounds == lp, "rounds path disagrees with gated path"
    n_clusters = len(set(uf.values()))

    result = {
        "metric": "labelprop_scale",
        "edges": n_edges,
        "nodes": len(uf),
        "clusters": n_clusters,
        "phases": len(metrics),
        "label_propagation_wall_s": round(lp_wall, 2),
        "rounds_path_wall_s": round(rounds_wall, 2),
        "rounds_path_rounds": len(rounds_metrics),
        "driver_unionfind_wall_s": round(uf_wall, 2),
        "equal_to_unionfind": True,
        "rounds_path_equal": True,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        "convergence": metrics,
        "rounds_convergence": rounds_metrics,
        "synth_total_wall_s": round(time.time() - t0, 2),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "convergence"}))
    ray.shutdown()


if __name__ == "__main__":
    main()
