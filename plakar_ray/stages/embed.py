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
    merged = parts.to_pandas()
    out_rows = []
    for qid, grp in merged.groupby("query_id"):
        if exclude_self:
            grp = grp[grp.neighbor_id != qid]
        grp = grp.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), 1):
            out_rows.append((int(qid), rank, int(r.neighbor_id), float(r.cosine)))
    out_rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int32()),
            "neighbor_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cosine": pa.array([round(r[3], 6) for r in out_rows], type=pa.float64()),
        }
    )


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
) -> pa.Table:
    """IVF approximate top-k: k-means centroids fitted on a sample
    (driver-side, few iterations), vectors assigned to centroids inside
    map_batches (centroids broadcast), search restricted to the n_probe
    closest centroids per query. Same output schema as brute_force_topk."""
    import ray

    sample = ds.limit(sample_size).to_pandas()
    sm = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    )
    rng = np.random.default_rng(seed)
    cent = sm[rng.choice(sm.shape[0], size=min(n_clusters, sm.shape[0]), replace=False)]
    for _ in range(8):  # Lloyd iterations on the sample
        assign = (sm @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = sm[assign == c]
            if members.shape[0]:
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
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
    merged = parts.to_pandas()
    out_rows = []
    for qid, grp in merged.groupby("query_id"):
        if exclude_self:
            grp = grp[grp.neighbor_id != qid]
        grp = grp.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(grp.iterrows(), 1):
            out_rows.append((int(qid), rank, int(r.neighbor_id), float(r.cosine)))
    out_rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int32()),
            "neighbor_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cosine": pa.array([round(r[3], 6) for r in out_rows], type=pa.float64()),
        }
    )


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

    def verified(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        shs = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, shs = ids[order], shs[order]
        uniq, first_idx = np.unique(ids, return_index=True)
        shs = shs[first_idx]
        m = uniq.shape[0]
        if m < 2:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine_est": pa.array([], type=pa.float64()),
                }
            )
        xor = shs[:, None] ^ shs[None, :]
        ham = np.zeros((m, m), dtype=np.int64)
        v = xor.copy()
        from plakar_ray.stages.simhash import _POP8

        for _ in range(8):
            ham += _POP8[(v & np.uint64(0xFF)).astype(np.int64)]
            v >>= np.uint64(8)
        ia, ib = np.nonzero(np.triu(ham <= max_ham, k=1))
        est = np.cos(np.pi * ham[ia, ib] / n_bits)
        return pa.table(
            {
                "id_a": pa.array(uniq[ia], type=pa.int64()),
                "id_b": pa.array(uniq[ib], type=pa.int64()),
                "cosine_est": pa.array(np.round(est, 6), type=pa.float64()),
            }
        )

    return pieces.groupby(["piece_id", "piece"]).map_groups(
        verified, batch_format="pyarrow"
    )


def cosine_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
) -> pa.Table:
    """All pairs with cosine >= threshold via blocked matmul: the embedding
    table is re-broadcast as normalized blocks; each map task compares its
    batch against every block at or after it (upper triangle)."""
    import ray

    full = ds.to_pandas()
    ids = full[id_col].to_numpy()
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in full[vec_col]]))
    m_ref = ray.put((ids, m))

    import ray.data

    starts = list(range(0, m.shape[0], block))
    blocks_ds = ray.data.from_items([{"start": s} for s in starts])

    def pairs_for_block(batch: pa.Table) -> pa.Table:
        all_ids, mm = ray.get(m_ref)
        out_a, out_b, out_c = [], [], []
        for s in batch.column("start").to_pylist():
            a = mm[s : s + block]
            sims = a @ mm[s:].T
            ia, ib = np.nonzero(sims >= threshold)
            keep = ib > ia  # strict upper triangle within the shifted frame
            for x, y in zip(ia[keep], ib[keep]):
                out_a.append(int(all_ids[s + x]))
                out_b.append(int(all_ids[s + y]))
                out_c.append(round(float(sims[x, y]), 6))
        return pa.table(
            {
                "id_a": pa.array(out_a, type=pa.int64()),
                "id_b": pa.array(out_b, type=pa.int64()),
                "cosine": pa.array(out_c, type=pa.float64()),
            }
        )

    parts = blocks_ds.map_batches(pairs_for_block, batch_format="pyarrow")
    collected = [b for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows]
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
