"""Embedding similarity: brute-force cosine top-k (baseline) and an
IVF-bucketed approximate variant (scale path), plus embedding-cosine
near-duplicate pairs.

Pattern: the small side (query matrix / centroids) is broadcast once with
ray.put and read inside every map_batches task; the big side (the embedding
table) streams through in Arrow batches as float64 matrices. Per-batch top-k
results are tiny and merged driver-side — no shuffle at all for the
brute-force path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa



def _merge_topk_driver(merged, k: int, exclude_self: bool) -> pa.Table:
    """Vectorized per-query top-k over the gathered per-block candidates
    (the driver table is bounded by nq x k rows per block — small by
    contract). Exact semantics of the former pandas groupby merge: cosine
    desc, neighbor_id asc tie-break, rank 1..k, cosine rounded to 6dp."""
    if len(merged) == 0 or "query_id" not in merged.columns:
        # empty corpus: zero blocks reach the driver, the frame has no
        # columns at all — return the canonical empty result directly
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int32()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    qa = merged["query_id"].to_numpy()
    na = merged["neighbor_id"].to_numpy()
    ca = merged["cosine"].to_numpy()
    if exclude_self:
        keep = na != qa
        qa, na, ca = qa[keep], na[keep], ca[keep]
    order = np.lexsort((na, -ca, qa))
    qa, na, ca = qa[order], na[order], ca[order]
    if qa.shape[0]:
        starts = np.flatnonzero(np.concatenate(([True], qa[1:] != qa[:-1])))
        sizes = np.diff(np.concatenate((starts, [qa.shape[0]])))
        pos = np.arange(qa.shape[0]) - np.repeat(starts, sizes)
        keep = pos < k
        qa, na, ca = qa[keep], na[keep], ca[keep]
        rank = pos[keep] + 1
    else:
        rank = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "query_id": pa.array(qa, type=pa.int64()),
            "rank": pa.array(rank.astype(np.int32), type=pa.int32()),
            "neighbor_id": pa.array(na, type=pa.int64()),
            "cosine": pa.array(np.round(ca.astype(np.float64), 6), type=pa.float64()),
        }
    )


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = np.asarray(arr.offsets)
    dim = int(offs[1] - offs[0])
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _collect_table(ds) -> pa.Table | None:
    """Stream a (small, bounded-by-contract) Dataset into one Arrow table
    without the per-row object conversion of `to_pandas()`."""
    tbls = [
        t
        for t in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    ]
    return pa.concat_tables(tbls) if tbls else None


def _lloyd_step(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """One spherical-Lloyd update of `cent` against the full matrix `m`
    (the same sorted-reduceat math the sharded partials use); empty cells
    keep their previous centroid."""
    a = (m @ cent.T).argmax(axis=1)
    order = np.argsort(a, kind="stable")
    sa = a[order]
    starts = np.flatnonzero(np.concatenate(([True], sa[1:] != sa[:-1])))
    sums = np.add.reduceat(m[order], starts, axis=0)
    counts = np.diff(np.append(starts, sa.size))
    new = cent.copy()
    new[sa[starts]] = sums / counts[:, None]
    return _normalize(new)


def _fit_kmeans_sharded(
    ds,
    n_clusters: int,
    vec_col: str,
    seed: int,
    n_iters: int = 4,
    local_threshold_bytes: int = 64 << 20,
) -> np.ndarray | None:
    """Sharded spherical-Lloyd k-means fit over the FULL corpus.

    `ds` must be materialized (each iteration is one full pass over its
    blocks). Init draws n_clusters seed vectors via a seeded bounded
    random sample; each Lloyd iteration broadcasts the centroid matrix
    once (ray.put) and reduces SPARSE per-block partials — one
    (cell, count, sum-vector) row per non-empty cell per block, at most
    min(K, block_rows) rows — folded incrementally on the driver, so
    driver memory is O(K x dim) and per-block partial size is bounded
    regardless of corpus size. Empty cells keep their previous centroid.
    Deterministic for a given (blocks, seed).

    Small-corpus fast path: when the whole vector matrix fits in
    `local_threshold_bytes` (float64), the Lloyd iterations run on the
    driver over the full matrix — identical update rule, none of the
    ~0.2 s-per-pass Ray orchestration that would dominate a small fit.
    Scale runs always take the sharded path (the threshold is a byte
    bound, not a row count, so wide embeddings cross over early).

    Determinism requires stable BLOCK ORDER: Ray Data's streaming
    executor yields blocks in completion order by default, which would
    permute the init sample rows and the float64 fold order run-to-run.
    preserve_order is pinned for the duration of the fit (and restored
    after) so both the init draw and every fold accumulate in block
    order."""
    import ray

    exec_opts = ds.context.execution_options
    saved_order = exec_opts.preserve_order
    exec_opts.preserve_order = True
    try:
        return _fit_kmeans_sharded_ordered(
            ds, n_clusters, vec_col, seed, n_iters, local_threshold_bytes
        )
    finally:
        exec_opts.preserve_order = saved_order


def _fit_kmeans_sharded_ordered(
    ds,
    n_clusters: int,
    vec_col: str,
    seed: int,
    n_iters: int,
    local_threshold_bytes: int,
) -> np.ndarray | None:
    import ray

    n = ds.count()
    if n == 0:
        return None
    k = int(min(n_clusters, n))
    if n > k:
        init = _collect_table(
            ds.random_sample(min(1.0, (2.0 * k + 16.0) / n), seed=seed).limit(k)
        )
        if init is None or init.num_rows < k:  # freak thin draw: prefix fallback
            init = _collect_table(ds.limit(k))
    else:
        init = _collect_table(ds)
    sm = _normalize(_matrix(init, vec_col))
    rng = np.random.default_rng(seed)
    cent = sm[rng.choice(sm.shape[0], size=min(k, sm.shape[0]), replace=False)]
    dim = cent.shape[1]

    if local_threshold_bytes and n * dim * 8 <= local_threshold_bytes:
        full = _collect_table(ds.select_columns([vec_col]))
        m = _normalize(_matrix(full, vec_col))
        for _ in range(n_iters):
            cent = _lloyd_step(m, cent)
        return cent

    empty_partial = pa.table(
        {
            "cell": pa.array([], type=pa.int64()),
            "count": pa.array([], type=pa.int64()),
            "sum": pa.array([], type=pa.list_(pa.float64(), dim)),
        }
    )

    for _ in range(n_iters):
        cent_ref = ray.put(cent)

        def partial_stats(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_matrix(batch, vec_col))
            if m.shape[0] == 0:
                return empty_partial
            a = (m @ c.T).argmax(axis=1)
            order = np.argsort(a, kind="stable")
            sa = a[order]
            starts = np.flatnonzero(np.concatenate(([True], sa[1:] != sa[:-1])))
            sums = np.add.reduceat(m[order], starts, axis=0)
            return pa.table(
                {
                    "cell": pa.array(sa[starts], type=pa.int64()),
                    "count": pa.array(
                        np.diff(np.append(starts, sa.size)), type=pa.int64()
                    ),
                    "sum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1), type=pa.float64()), dim
                    ),
                }
            )

        sums = np.zeros((cent.shape[0], dim), dtype=np.float64)
        counts = np.zeros(cent.shape[0], dtype=np.int64)
        partials = ds.map_batches(
            partial_stats, batch_format="pyarrow", zero_copy_batch=True
        )
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            cells = b.column("cell").to_numpy(zero_copy_only=False)
            sv = b.column("sum")
            if isinstance(sv, pa.ChunkedArray):
                sv = sv.combine_chunks()
            s = sv.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
            # one iter_batches batch may merge several blocks' partials,
            # so cell ids can repeat: scatter-ADD, not assignment
            np.add.at(sums, cells, s)
            np.add.at(counts, cells, b.column("count").to_numpy(zero_copy_only=False))
        nz = counts > 0
        new = cent.copy()
        new[nz] = sums[nz] / counts[nz][:, None]
        cent = _normalize(new)
    return cent


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k: queries broadcast via ray.put, one matmul per
    batch, per-batch top-k merged on the driver.

    Returns (query_id, rank, neighbor_id, cosine) with rank 1..k ordered by
    (cosine desc, neighbor_id asc)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids)

    def batch_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = q @ m.T  # (nq, nb)
        nb = sims.shape[1]
        kk = min(k + (1 if exclude_self else 0), nb)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for qi in range(q.shape[0]):
            for j in part[qi]:
                rows.append((int(qids[qi]), int(ids[j]), float(sims[qi, j])))
        qa, na, ca = zip(*rows) if rows else ((), (), ())
        return pa.table(
            {
                "query_id": pa.array(qa, type=pa.int64()),
                "neighbor_id": pa.array(na, type=pa.int64()),
                "cosine": pa.array(ca, type=pa.float64()),
            }
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk_driver(parts.to_pandas(), k, exclude_self)


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    sample_size: int = 2048,
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """IVF approximate top-k: k-means centroids fitted with the sharded
    full-corpus Lloyd pass (_fit_kmeans_sharded — seeded-sample init,
    map-side sparse partials, driver fold bounded at K x dim), vectors
    assigned to centroids inside map_batches (centroids broadcast), search
    restricted to the n_probe closest centroids per query. Same output
    schema as brute_force_topk.

    `centroids` (optional, raw vectors — normalized here) skips the k-means
    fit; used by the driver-verified deterministic twin
    (entry.q_embedding_ivf_topk_det), which probes fixed centroids a DuckDB
    oracle can reproduce. `sample_size` is retained for signature
    compatibility; init sampling is sized by n_clusters now."""
    import ray

    del sample_size  # superseded by the sharded fit's k-sized init draw
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    else:
        ds = ds.materialize()
        cent = _fit_kmeans_sharded(ds, n_clusters, vec_col, seed)
        if cent is None:
            # empty ds: one zero centroid in QUERY dimensionality so the
            # probe matmul below stays shape-valid and finds nothing
            cent = np.zeros((1, np.asarray(queries).shape[-1]), dtype=np.float64)
    cent_ref = ray.put(cent)

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    probe_sets = [set(row.tolist()) for row in q_probe]
    q_ref = ray.put((qn, np.asarray(query_ids), probe_sets))

    def batch_topk(batch: pa.Table) -> pa.Table:
        centroids = ray.get(cent_ref)
        q, qids, probes = ray.get(q_ref)
        m = _normalize(_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        assign = (m @ centroids.T).argmax(axis=1)
        rows = []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            sims = m[mask] @ q[qi]
            sel_ids = ids[mask]
            kk = min(k + 1, sims.shape[0])
            part = np.argpartition(-sims, kk - 1)[:kk]
            for j in part:
                rows.append((int(qids[qi]), int(sel_ids[j]), float(sims[j])))
        qa, na, ca = zip(*rows) if rows else ((), (), ())
        return pa.table(
            {
                "query_id": pa.array(qa, type=pa.int64()),
                "neighbor_id": pa.array(na, type=pa.int64()),
                "cosine": pa.array(ca, type=pa.float64()),
            }
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk_driver(parts.to_pandas(), k, exclude_self)


def hyperplane_lsh_pairs(
    ds,
    threshold: float = 0.95,
    n_bits: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 23,
) -> "object":
    """Scale path for embedding near-dup: random-hyperplane (SRP) sketches.
    bit j = sign(v . r_j); cos(a,b) ~ cos(pi * hamming/n_bits). Sketches go
    through the same piece-groupby machinery as SimHash; verification uses
    the sketch-estimated cosine (no full-matrix broadcast). Returns a Dataset
    of (id_a, id_b, cosine_est)."""
    import ray

    rng = np.random.default_rng(seed)

    def sketch_batch(batch: pa.Table, planes_ref=None) -> pa.Table:
        m = _normalize(_matrix(batch, vec_col))
        planes = ray.get(planes_ref)
        bits = (m @ planes.T) > 0  # (n, n_bits)
        weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))[None, :]
        sk = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(sk, type=pa.uint64()),
            }
        )

    # Dim discovery from one row; planes broadcast once.
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = _matrix(first, vec_col).shape[1]
    planes_ref = ray.put(rng.standard_normal((n_bits, dim)))

    from functools import partial

    from plakar_ray.stages.simhash import simhash_pieces_batch

    sketches = ds.map_batches(
        partial(sketch_batch, planes_ref=planes_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pieces = sketches.map_batches(
        lambda b: simhash_pieces_batch(b, bands, id_col), batch_format="pyarrow"
    )
    max_ham = int(np.floor(np.arccos(min(threshold, 1.0)) / np.pi * n_bits))
    # Shared pigeonhole exchange tail (stages/simhash.py): hash-partition
    # on (piece_id, piece) + per-partition lexsort verify; n_bits adds the
    # sketch-estimated cosine per verified pair.
    from plakar_ray.stages.simhash import pieces_to_pairs

    return pieces_to_pairs(pieces, max_ham, id_col=id_col, n_bits=n_bits)


def cosine_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
) -> pa.Table:
    """All pairs with cosine >= threshold via block-pair matmul tasks.

    The EXACT O(N^2/2) baseline (the approximate scale paths are
    hyperplane_lsh_pairs and ivf_topk): embeddings are normalized per block
    inside map_batches and left IN THE OBJECT STORE (`materialize` +
    `to_arrow_refs`); each (i <= j) block pair becomes one map task that
    fetches exactly its two blocks. Nothing ever concentrates the full
    matrix on the driver or in one worker, so the object store can spill
    and the compute spreads across the cluster."""
    import ray
    import ray.data

    def norm_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        m = _normalize(_matrix(batch, vec_col))
        dim = m.shape[1] if m.ndim == 2 else 0
        return pa.table(
            {
                id_col: ids,
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1), type=pa.float64()), dim
                ),
            }
        )

    normalized = ds.map_batches(
        norm_batch, batch_format="pyarrow", batch_size=block, zero_copy_batch=True
    ).materialize()
    block_refs = normalized.to_arrow_refs()
    n_blocks = len(block_refs)

    def _unpack(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        vec = tbl.column("vec")
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        dim = vec.type.list_size
        m = vec.flatten().to_numpy(zero_copy_only=False).reshape(len(tbl), dim)
        return ids, m

    def pairs_for_block_pair(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for bi, bj in zip(
            batch.column("i").to_pylist(), batch.column("j").to_pylist()
        ):
            ids_i, mi = _unpack(ray.get(block_refs[bi]))
            ids_j, mj = (ids_i, mi) if bj == bi else _unpack(ray.get(block_refs[bj]))
            sims = mi @ mj.T
            ia, ib = np.nonzero(sims >= threshold)
            if bi == bj:
                keep = ib > ia
                ia, ib = ia[keep], ib[keep]
            ga, gb = ids_i[ia], ids_j[ib]
            lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(np.round(sims[ia, ib], 6))
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            c = np.concatenate(out_c)
        else:
            a = b = np.empty(0, dtype=np.int64)
            c = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "id_a": pa.array(a, type=pa.int64()),
                "id_b": pa.array(b, type=pa.int64()),
                "cosine": pa.array(c, type=pa.float64()),
            }
        )

    pair_index = [
        {"i": i, "j": j} for i in range(n_blocks) for j in range(i, n_blocks)
    ]
    parts = ray.data.from_items(pair_index).map_batches(
        pairs_for_block_pair, batch_format="pyarrow", batch_size=4
    )
    collected = [b for b in parts.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not collected:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(collected).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


_GRAM_TILE_ELEMS = 32_000_000  # float64 Gram elements per tile (~256 MB)


def _cell_dedup_partition(
    batch: pa.Table, threshold: float, id_col: str, vec_col: str
) -> pa.Table:
    """Cell-keyed exchange reduce: every vector of each of this
    partition's cells. Per cell (sorted by id): pairwise cosine via one
    normalized matmul; a vector is a duplicate iff some SMALLER-id vector
    in its cell clears the threshold, and `dup_of` is the smallest such
    id (-1 for kept vectors)."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "cell": pa.array([], type=pa.int64()),
            "kept": pa.array([], type=pa.bool_()),
            "dup_of": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, cells))
    ids, cells = ids[order], cells[order]
    m = _normalize(_matrix(batch.take(pa.array(order)), vec_col))
    out_kept = np.ones(ids.size, dtype=bool)
    out_dup = np.full(ids.size, -1, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], cells[1:] != cells[:-1])))
    ends = np.append(starts[1:], ids.size)
    for s, e in zip(starts.tolist(), ends.tolist()):
        n = e - s
        if n < 2:
            continue
        v = m[s:e]  # ids ascending within the cell
        # Row-tiled pairwise cosine: the Gram tile is bounded (~256 MB of
        # float64) instead of the full n^2 matrix, so one hot cell cannot
        # OOM the reduce task; compute stays the exact same rule.
        tile = max(1, _GRAM_TILE_ELEMS // max(n, 1))
        for t0 in range(0, n, tile):
            t1 = min(t0 + tile, n)
            g = v[t0:t1] @ v[:t1].T
            valid = np.arange(t1)[None, :] < np.arange(t0, t1)[:, None]
            hit = (g >= threshold) & valid
            dup = hit.any(axis=1)
            if dup.any():
                first = hit.argmax(axis=1)  # smallest qualifying id's position
                out_kept[s + t0 : s + t1][dup] = False
                out_dup[s + t0 : s + t1][dup] = ids[s:e][first[dup]]
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "cell": pa.array(cells, type=pa.int64()),
            "kept": pa.array(out_kept, type=pa.bool_()),
            "dup_of": pa.array(out_dup, type=pa.int64()),
        }
    )


def semantic_dedup(
    ds,
    threshold: float = 0.8,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    centroids: np.ndarray | None = None,
    target_cell_size: int = 1024,
    max_clusters: int = 65536,
    fit_iters: int = 4,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.03540): cluster the
    embedding space, then dedup WITHIN each cluster by pairwise cosine —
    the clustering turns the corpus-quadratic pair search into
    sum-of-cluster-size-squared work. Deviation from the paper's
    keep-farthest-from-centroid rule: the canonical survivor is the
    smallest id (this repo's keep-first house rule, shared with every
    other dedup family and the DuckDB oracle).

    Returns a Dataset of (id, cell, kept, dup_of): `kept` is False iff
    some smaller-id vector in the same cell has cosine >= threshold, and
    `dup_of` is the smallest such id (-1 when kept).

    Shape: centroids fitted by the SHARDED full-corpus Lloyd pass
    (_fit_kmeans_sharded: seeded-sample init, map-side sparse
    (cell,count,sum) partials, driver fold bounded at K x dim) — or
    passed fixed (the SQL-checkable twin entry.q_semantic_dedup_det) —
    broadcast via ray.put; assignment is one matmul per batch; ONE packed
    exchange on the cell id co-locates each cluster (a cluster is one
    group in one partition — never a driver table); the per-cell n^2
    matmul is the SemDeDup contract. K scales with corpus size:
    K = clamp(n / target_cell_size, [n_clusters, max_clusters]), so the
    expected cell is ~target_cell_size rows and per-cell work stays
    bounded as the corpus grows (the paper's K ~ n/1000 regime); the
    max_clusters ceiling bounds the broadcast centroid matrix (at 65536
    x 768 float64 ~ 400 MB — raise it only with object-store headroom)."""
    import ray
    import ray.data

    from plakar_ray.functions.exchange import packed_exchange

    empty_out = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "cell": pa.array([], type=pa.int64()),
            "kept": pa.array([], type=pa.bool_()),
            "dup_of": pa.array([], type=pa.int64()),
        }
    )
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    else:
        ds = ds.materialize()
        n = ds.count()
        if n == 0:
            return ray.data.from_arrow(empty_out)
        k = int(min(max(n_clusters, n // max(target_cell_size, 1)), max_clusters, n))
        cent = _fit_kmeans_sharded(ds, k, vec_col, seed, n_iters=fit_iters)
    cent_ref = ray.put(cent)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_matrix(batch, vec_col))
        cell = (m @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "cell": pa.array(cell, type=pa.int64()),
                vec_col: batch.column(vec_col),
            }
        )

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    assigned = ds.map_batches(
        assign_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    vec_type = pa.list_(pa.float32())
    assigned_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "cell": pa.array([], type=pa.int64()),
            vec_col: pa.array([], type=vec_type),
        }
    )
    return packed_exchange(
        assigned,
        ["cell"],
        max(8, cpus // 2),
        lambda b: _cell_dedup_partition(b, threshold, id_col, vec_col),
        assigned_empty,
    )
