"""LSH banding: signatures -> band buckets -> candidate-pair edges.

The wide step of the near-dup pipeline. A signature of P slots splits into
`bands` bands of r = P/bands rows; documents sharing any band hash become
candidates. The shuffle is `groupby(band_id, band_hash)`.

Skew handling (explicit, per north_rule): boilerplate/empty pages create hot
buckets whose clique pair lists are quadratic. Two measures:
* Buckets emit STAR edges (every member -> bucket minimum), linear in bucket
  size and connectivity-equivalent for clustering.
* Optional salted keys: `salt_buckets=K` splits each bucket into K sub-buckets
  by id hash before the shuffle, bounding any single reducer group; a second,
  tiny shuffle over the K sub-bucket hubs restores connectivity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_FNV_OFF = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)
_GOLD = _U64(0x9E3779B97F4A7C15)


def band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, P) signatures -> (n, bands) uint64 band hashes (FNV-1a over the
    band's slots, salted with the band index)."""
    n, p = sigs.shape
    assert p % bands == 0, "num_perm must be divisible by bands"
    r = p // bands
    v = sigs.reshape(n, bands, r)
    h = np.full((n, bands), _FNV_OFF, dtype=np.uint64)
    for j in range(r):
        h = (h ^ v[:, :, j]) * _FNV_PRIME
    h ^= np.arange(bands, dtype=np.uint64) * _GOLD
    return h


def _sig_matrix(batch: pa.Table, sig_col: str) -> np.ndarray:
    arr = batch.column(sig_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    p = arr.type.list_size
    flat = arr.flatten()
    return flat.to_numpy(zero_copy_only=False).astype(np.uint64).reshape(len(batch), p)


class BandStage:
    """signatures batch -> band rows (id, band_id, band_hash[, salt])."""

    def __init__(
        self,
        bands: int,
        id_col: str = "doc_id",
        sig_col: str = "sig",
        min_shingles: int = 1,
        salt_buckets: int | None = None,
    ):
        self.bands = bands
        self.id_col = id_col
        self.sig_col = sig_col
        self.min_shingles = min_shingles
        self.salt_buckets = salt_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "n_shingles" in batch.column_names and self.min_shingles > 0:
            import pyarrow.compute as pc

            batch = batch.filter(
                pc.greater_equal(batch.column("n_shingles"), self.min_shingles)
            )
        n = len(batch)
        if n == 0:
            cols = {
                self.id_col: pa.array([], type=pa.int64()),
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.uint64()),
            }
            if self.salt_buckets:
                cols["salt"] = pa.array([], type=pa.int32())
            return pa.table(cols)
        sigs = _sig_matrix(batch, self.sig_col)
        bh = band_hashes(sigs, self.bands)
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        take = pa.array(np.repeat(np.arange(n), self.bands), type=pa.int64())
        cols = {
            self.id_col: ids.take(take),
            "band_id": pa.array(
                np.tile(np.arange(self.bands, dtype=np.int32), n), type=pa.int32()
            ),
            "band_hash": pa.array(bh.reshape(-1), type=pa.uint64()),
        }
        if self.salt_buckets:
            idv = ids.to_numpy(zero_copy_only=False)
            salt = (idv.astype(np.uint64) * _GOLD >> _U64(56)).astype(np.int32) % np.int32(
                self.salt_buckets
            )
            cols["salt"] = pa.array(np.repeat(salt, self.bands), type=pa.int32())
        return pa.table(cols)


def _star_edges(group: pa.Table, id_col: str) -> pa.Table:
    """Bucket members -> star edges to the bucket minimum (linear, not
    quadratic; connectivity-equivalent to the clique for clustering)."""
    ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
    if ids.shape[0] < 2:
        return pa.table(
            {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
        )
    hub = ids[0]
    return pa.table(
        {
            "id_a": pa.array(np.full(ids.shape[0] - 1, hub), type=pa.int64()),
            "id_b": pa.array(ids[1:], type=pa.int64()),
        }
    )


def _local_candidate_pairs(
    sig_ds, bands: int, id_col: str, min_shingles: int
):
    """Small-table fast path: the signature table fits comfortably on the
    driver, so bucket grouping is a numpy sort instead of a Ray groupby
    (which costs seconds of fixed orchestration per execution). Produces the
    same star edges as the distributed path."""
    import ray.data

    ids_parts, sig_parts = [], []
    for b in sig_ds.iter_batches(batch_format="pyarrow"):
        if "n_shingles" in b.column_names and min_shingles > 0:
            import pyarrow.compute as pc

            b = b.filter(pc.greater_equal(b.column("n_shingles"), min_shingles))
        if len(b) == 0:
            continue
        ids_parts.append(b.column(id_col).to_numpy(zero_copy_only=False))
        sig_parts.append(_sig_matrix(b, "sig"))
    if not ids_parts:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})
        )
    ids = np.concatenate(ids_parts)
    sigs = np.vstack(sig_parts)
    bh = band_hashes(sigs, bands)  # (n, bands); band_id already mixed in
    flat = bh.reshape(-1)
    flat_ids = np.repeat(ids, bands)
    order = np.argsort(flat, kind="stable")
    fh, fi = flat[order], flat_ids[order]
    boundary = np.concatenate(([True], fh[1:] != fh[:-1]))
    group_starts = np.nonzero(boundary)[0]
    group_ends = np.concatenate((group_starts[1:], [fh.shape[0]]))
    out_a, out_b = [], []
    for s, e in zip(group_starts.tolist(), group_ends.tolist()):
        if e - s < 2:
            continue
        members = np.unique(fi[s:e])
        if members.shape[0] < 2:
            continue
        out_a.append(np.full(members.shape[0] - 1, members[0]))
        out_b.append(members[1:])
    if not out_a:
        t = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})
    else:
        t = pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )
    return ray.data.from_arrow(t)


def candidate_pairs(
    sig_ds,
    bands: int,
    id_col: str = "doc_id",
    min_shingles: int = 1,
    salt_buckets: int | None = None,
    checkpoint: bool = True,
    local_threshold: int = 20_000,
):
    """signatures Dataset -> candidate edge Dataset (id_a < id_b, star per
    bucket). One groupby shuffle on (band_id, band_hash[, salt]); with salted
    keys, a second tiny shuffle over sub-bucket hubs restores connectivity.

    checkpoint=True materializes the signatures first: Ray's sort-based
    groupby executes its input more than once (boundary sampling + shuffle),
    which would re-run the expensive chunk+signature stage; the signature
    table (~1.5 KB/doc) is also the natural lineage/resume boundary.
    (Fusing the materialize with a repartition was measured ~2x slower than
    materialize + band-row coalescing, so they stay separate.)"""
    try:
        import ray

        n_part = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        n_part = 16
    if checkpoint:
        sig_ds = sig_ds.materialize()
        # Small signature tables take the driver-local grouping fast path
        # (identical star edges; salt is a shuffle-only concern).
        if local_threshold and sig_ds.count() <= local_threshold:
            return _local_candidate_pairs(sig_ds, bands, id_col, min_shingles)
    band_rows = sig_ds.map_batches(
        BandStage,
        fn_constructor_kwargs=dict(
            bands=bands, id_col=id_col, min_shingles=min_shingles,
            salt_buckets=salt_buckets,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    # Coalesce before the shuffle: band rows inherit the (often per-document)
    # input block structure, and a sort-based groupby over B blocks exchanges
    # O(B^2) objects. A handful of blocks per CPU keeps the all-to-all dense.
    try:
        well_blocked = sig_ds.num_blocks() <= 4 * n_part
    except Exception:
        well_blocked = False
    if not well_blocked:
        band_rows = band_rows.repartition(n_part)
    keys = ["band_id", "band_hash"] + (["salt"] if salt_buckets else [])
    edges = band_rows.groupby(keys).map_groups(
        lambda g: _star_edges(g, id_col), batch_format="pyarrow"
    )
    if not salt_buckets:
        return edges
    # Level 2: reconnect the K sub-buckets of each (band_id, band_hash) by
    # resending only each sub-bucket's hub (min id).
    hubs = band_rows.groupby(keys).map_groups(
        lambda g: pa.table(
            {
                "band_id": g.column("band_id")[:1],
                "band_hash": g.column("band_hash")[:1],
                id_col: pa.array(
                    [int(g.column(id_col).to_numpy(zero_copy_only=False).min())],
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    hub_edges = hubs.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _star_edges(g, id_col), batch_format="pyarrow"
    )
    return edges.union(hub_edges)
