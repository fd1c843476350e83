"""Embedding similarity quality gates: IVF recall vs brute force, and
hyperplane-LSH recall on planted high-cosine near-duplicates (its design
regime)."""

import numpy as np
import pyarrow as pa


def _planted_embeddings(n_base=300, n_dup=60, dim=64, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup_src = rng.integers(0, n_base, n_dup)
    # noise norm ~0.02*sqrt(64)=0.16 -> cosine ~0.987, safely above 0.95
    dups = base[dup_src] + 0.02 * rng.standard_normal((n_dup, dim))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups]).astype(np.float32)
    pairs = [(int(s), n_base + i) for i, s in enumerate(dup_src)]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), dim
            ),
        }
    )
    return t, pairs


def test_hyperplane_lsh_recall_on_near_dups(ray_session):
    import ray.data

    from plakar_ray.stages.embed import hyperplane_lsh_pairs

    t, planted = _planted_embeddings()
    got = (
        hyperplane_lsh_pairs(ray.data.from_arrow(t), threshold=0.9, n_bits=64, bands=8)
        .to_pandas()
        .drop_duplicates(subset=["id_a", "id_b"])
    )
    got_set = set(zip(got.id_a, got.id_b))
    hits = sum(1 for p in planted if p in got_set or (p[1], p[0]) in got_set)
    assert hits / len(planted) >= 0.9


def test_ivf_recall_vs_brute_force(ray_session):
    import ray.data

    from plakar_ray.stages.embed import brute_force_topk, ivf_topk

    t, _ = _planted_embeddings()
    ids = t.column("vec_id").to_numpy()[:15]
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()[:15]]
    )
    bf = brute_force_topk(ray.data.from_arrow(t), vecs, ids, k=5).to_pandas()
    ivf = ivf_topk(ray.data.from_arrow(t), vecs, ids, k=5, n_clusters=8, n_probe=4).to_pandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ivf_set = set(zip(ivf.query_id, ivf.neighbor_id))
    assert len(bf_set & ivf_set) / len(bf_set) >= 0.5
    # brute force is exact: the top neighbor of a planted dup must be its source
    assert len(bf) == 15 * 5


def test_semantic_dedup_matches_local_rule(ray_session):
    """SemDeDup (stages/embed.semantic_dedup) with fixed centroids equals
    a brute-force local evaluation of the same rule: a vector is dropped
    iff some smaller-id vector in its assigned cell clears the cosine
    threshold; dup_of is the smallest such id."""
    import ray.data

    from plakar_ray.stages.embed import semantic_dedup

    t, pairs = _planted_embeddings()
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cent = vecs[:8]
    thr = 0.95

    out = (
        semantic_dedup(
            ray.data.from_arrow(t), threshold=thr, centroids=cent
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cell = (vecs @ cn.T).argmax(axis=1)
    g = vecs @ vecs.T
    n = vecs.shape[0]
    exp_kept = np.ones(n, dtype=bool)
    exp_dup = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        cand = np.flatnonzero((cell[:j] == cell[j]) & (g[j, :j] >= thr))
        if cand.size:
            exp_kept[j] = False
            exp_dup[j] = cand[0]
    assert (out["cell"].to_numpy() == cell).all()
    assert (out["kept"].to_numpy() == exp_kept).all()
    assert (out["dup_of"].to_numpy() == exp_dup).all()
    # the planted near-identical copies must actually be dropped
    dropped = set(out.loc[~out["kept"], "vec_id"])
    same_cell_pairs = [(s, d) for s, d in pairs if cell[s] == cell[d]]
    assert same_cell_pairs and all(d in dropped for _, d in same_cell_pairs)


def test_topk_empty_corpus(ray_session):
    """An empty embedding corpus must yield an empty (schema-stable)
    result from both search paths — not a shape error in the fallback
    centroid matmul or a KeyError on the column-less driver frame."""
    import ray.data

    from plakar_ray.stages.embed import brute_force_topk, ivf_topk

    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float32(), 64)),
        }
    )
    q = np.random.default_rng(1).standard_normal((3, 64))
    for fn in (brute_force_topk, ivf_topk):
        t = fn(ray.data.from_arrow(empty), q, np.arange(3), k=5)
        assert t.num_rows == 0
        assert t.column_names == ["query_id", "rank", "neighbor_id", "cosine"]


def test_sharded_kmeans_bounds_cells_on_skewed_input(ray_session):
    """The 100-TB contract of SemDeDup is that per-cell work stays
    bounded: K scales with n (target_cell_size) and the sharded Lloyd
    fit must spread even a heavily SKEWED corpus (one dominant mode)
    across many cells rather than funneling it into one quadratic cell."""
    import ray.data

    from plakar_ray.stages.embed import _fit_kmeans_sharded, semantic_dedup

    rng = np.random.default_rng(7)
    dim = 16
    # 85% of rows live in one tight mode; the rest are 3 smaller modes
    modes = rng.standard_normal((4, dim))
    counts = [1700, 120, 100, 80]
    vecs = np.vstack(
        [m + 0.05 * rng.standard_normal((c, dim)) for m, c in zip(modes, counts)]
    ).astype(np.float32)
    n = vecs.shape[0]
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), dim
            ),
        }
    )
    # K scaling: n=2000, target 100 -> K=20 (floor n_clusters=16 < 20)
    out = (
        semantic_dedup(
            ray.data.from_arrow(t),
            threshold=0.999,
            n_clusters=16,
            target_cell_size=100,
        )
        .to_pandas()
    )
    sizes = out.groupby("cell").size()
    assert out["cell"].nunique() >= 10  # fit actually spread the corpus
    # no quadratic funnel: largest cell well under the skewed mode's 1700
    assert sizes.max() <= 0.35 * n
    # direct fit check: every centroid row is a unit vector, K as requested
    cent = _fit_kmeans_sharded(ray.data.from_arrow(t), 20, "embedding", seed=11)
    assert cent.shape == (20, dim)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


def test_sharded_kmeans_deterministic_and_fixed_centroid_twin_unchanged(ray_session):
    """Same seed + same blocks => identical centroids (resumable /
    driver-comparable); and the fixed-centroid path (the SQL-oracle twin
    semantic_dedup_det) must bypass the fit entirely."""
    import ray.data

    from plakar_ray.stages.embed import _fit_kmeans_sharded

    t, _ = _planted_embeddings()
    # force the SHARDED iteration path (threshold 0) — the scale path must
    # be deterministic, not just the small-corpus driver loop
    a = _fit_kmeans_sharded(
        ray.data.from_arrow(t), 8, "embedding", seed=3, local_threshold_bytes=0
    )
    b = _fit_kmeans_sharded(
        ray.data.from_arrow(t), 8, "embedding", seed=3, local_threshold_bytes=0
    )
    assert np.array_equal(a, b)
    c = _fit_kmeans_sharded(
        ray.data.from_arrow(t), 8, "embedding", seed=4, local_threshold_bytes=0
    )
    assert not np.array_equal(a, c)
    # the small-corpus driver loop runs the same update rule: same init,
    # same assignments, centroids equal up to summation order
    d = _fit_kmeans_sharded(ray.data.from_arrow(t), 8, "embedding", seed=3)
    assert np.allclose(a, d, rtol=1e-8, atol=1e-12)


def test_semantic_dedup_tiled_equals_untiled(ray_session):
    """Forcing tiny Gram tiles (the hot-cell memory guard) must not change
    the election."""
    import ray.data

    from plakar_ray.stages import embed

    t, _ = _planted_embeddings()
    cent = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()[:4]]
    )

    def run():
        return (
            embed.semantic_dedup(ray.data.from_arrow(t), threshold=0.95, centroids=cent)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    big = run()
    old = embed._GRAM_TILE_ELEMS
    embed._GRAM_TILE_ELEMS = 7  # a handful of rows per tile
    try:
        small = run()
    finally:
        embed._GRAM_TILE_ELEMS = old
    assert big.equals(small)
