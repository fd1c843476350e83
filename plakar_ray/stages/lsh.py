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


def _star_edges_vec(
    key_cols: tuple[np.ndarray, ...], ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray]]:
    """Vectorized grouped star edges: group rows by the composite key, dedupe
    member ids within each group, and emit (hub=min id) -> member edges.

    Returns (id_a, id_b, hubs, group_key_cols) where hubs/group_key_cols have
    one entry per group (of any size, including singletons) — callers that
    need per-group hub rows (salted reconnect) use them. Linear in rows, no
    per-group Python work beyond numpy slicing.
    """
    n = ids.shape[0]
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, [k[:0] for k in key_cols]
    order = np.lexsort((ids,) + tuple(key_cols))
    sid = ids[order]
    sk = [k[order] for k in key_cols]
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    if n > 1:
        acc = np.zeros(n - 1, dtype=bool)
        for k in sk:
            acc |= k[1:] != k[:-1]
        newg[1:] = acc
        # drop duplicate (group, id) rows — ids are sorted within each group
        dup = np.zeros(n, dtype=bool)
        dup[1:] = ~newg[1:] & (sid[1:] == sid[:-1])
        if dup.any():
            keep = ~dup
            sid = sid[keep]
            newg = newg[keep]
            sk = [k[keep] for k in sk]
    m = sid.shape[0]
    gstart = np.nonzero(newg)[0]
    gsize = np.diff(np.append(gstart, m))
    hubs = sid[gstart]
    id_a = np.repeat(hubs, gsize - 1)
    mask = np.ones(m, dtype=bool)
    mask[gstart] = False
    id_b = sid[mask]
    return id_a, id_b, hubs, [k[gstart] for k in sk]


def _empty_edges() -> pa.Table:
    return pa.table(
        {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
    )


class BucketStarEdges:
    """Per-hash-partition bucket grouping: after a keyed repartition on
    (band_id, band_hash[, salt]) every bucket lives wholly inside one block,
    so star edges come from one vectorized lexsort over the block — no global
    sort, no per-group UDF calls. With emit_hubs, each group additionally
    yields one hub row (kind=1) carrying (band_id, band_hash, hub) for the
    salted level-2 reconnect."""

    def __init__(self, id_col: str, with_salt: bool, emit_hubs: bool):
        self.id_col = id_col
        self.with_salt = with_salt
        self.emit_hubs = emit_hubs

    def __call__(self, batch: pa.Table) -> pa.Table:
        idv = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        bid = batch.column("band_id").to_numpy(zero_copy_only=False)
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        keys = (bid, bh)
        if self.with_salt:
            keys = keys + (batch.column("salt").to_numpy(zero_copy_only=False),)
        id_a, id_b, hubs, gkeys = _star_edges_vec(keys, idv)
        if not self.emit_hubs:
            return pa.table(
                {
                    "id_a": pa.array(id_a, type=pa.int64()),
                    "id_b": pa.array(id_b, type=pa.int64()),
                }
            )
        n_e, n_h = id_a.shape[0], hubs.shape[0]
        return pa.table(
            {
                "id_a": pa.array(np.concatenate((id_a, hubs)), type=pa.int64()),
                "id_b": pa.array(np.concatenate((id_b, hubs)), type=pa.int64()),
                "band_id": pa.array(
                    np.concatenate((np.zeros(n_e, dtype=np.int32), gkeys[0])),
                    type=pa.int32(),
                ),
                "band_hash": pa.array(
                    np.concatenate((np.zeros(n_e, dtype=np.uint64), gkeys[1])),
                    type=pa.uint64(),
                ),
                "kind": pa.array(
                    np.concatenate(
                        (np.zeros(n_e, dtype=np.int8), np.ones(n_h, dtype=np.int8))
                    ),
                    type=pa.int8(),
                ),
            }
        )


def _local_candidate_pairs(
    sig_ds, bands: int, id_col: str, min_shingles: int
):
    """Small-table fast path: the signature table fits comfortably on the
    driver, so bucket grouping is a numpy sort instead of a Ray shuffle
    (which costs seconds of fixed orchestration per execution). Groups on
    (band_id, band_hash) exactly like the distributed path, so the two paths
    are result-identical."""
    import ray.data

    ids_parts, sig_parts = [], []
    for b in sig_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if "n_shingles" in b.column_names and min_shingles > 0:
            import pyarrow.compute as pc

            b = b.filter(pc.greater_equal(b.column("n_shingles"), min_shingles))
        if len(b) == 0:
            continue
        ids_parts.append(b.column(id_col).to_numpy(zero_copy_only=False))
        sig_parts.append(_sig_matrix(b, "sig"))
    if not ids_parts:
        return ray.data.from_arrow(_empty_edges())
    ids = np.concatenate(ids_parts)
    sigs = np.vstack(sig_parts)
    bh = band_hashes(sigs, bands)  # (n, bands)
    band_idx = np.tile(np.arange(bands, dtype=np.int32), ids.shape[0])
    id_a, id_b, _, _ = _star_edges_vec(
        (band_idx, bh.reshape(-1)), np.repeat(ids, bands)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(id_a, type=pa.int64()),
                "id_b": pa.array(id_b, type=pa.int64()),
            }
        )
    )


def candidate_pairs(
    sig_ds,
    bands: int,
    id_col: str = "doc_id",
    min_shingles: int = 1,
    salt_buckets: int | None = None,
    checkpoint: bool = True,
    local_threshold: int = 20_000,
):
    """signatures Dataset -> candidate edge Dataset (star per bucket).

    The wide step is a PACKED hash-partition exchange, not a sort
    (functions/exchange.py): band rows are bucketed by
    hash(band_id, band_hash(, salt)) map-side and shipped as one Arrow IPC
    blob per (pack task, bucket) — each bucket's rows land wholly in one
    partition with no boundary sampling, no global sort, and no per-row
    shuffle cost. Each partition then produces its star edges with one
    vectorized lexsort (BucketStarEdges). With salted keys a second, tiny
    exchange over the per-sub-bucket hubs restores connectivity.

    checkpoint=True materializes the signatures first: the shuffle input is
    consumed by an all-to-all exchange and re-execution would re-run the
    expensive chunk+signature stage; the signature table (~1.5 KB/doc) is
    also the natural lineage/resume boundary."""
    import os

    from plakar_ray.functions.exchange import packed_exchange

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_part = int(os.environ.get("PLAKAR_LSH_PARTITIONS", "0"))
    if n_part <= 0:
        # Partition-count fixed cost is real (~50-70 ms per partition of
        # aggregator/finalization overhead measured on this host; A/B at
        # 16 cpus: n_part=8 best 1.50 s vs n_part=16 1.76 s on the same
        # exchange), so local runs keep partitions modest; a multi-node
        # deployment should set PLAKAR_LSH_PARTITIONS to ~2x total cluster
        # cores so every node holds a few partitions and no partition
        # exceeds worker memory.
        n_part = max(8, cpus // 4)
    if checkpoint:
        sig_ds = sig_ds.materialize()
        # Small signature tables take the driver-local grouping fast path
        # (identical star edges; salt is a shuffle-only concern).
        if local_threshold and sig_ds.count() <= local_threshold:
            return _local_candidate_pairs(sig_ds, bands, id_col, min_shingles)
        # Pre-exchange compaction now happens INSIDE the band+pack stage:
        # map_batches(batch_size=PACK_ROWS) bundles consecutive small sig
        # blocks into one task (and splits oversized ones), so small-block
        # per-task overhead is amortized without the extra object-store
        # pass a coalescing repartition cost (a 2.5 s barrier at 8 GiB /
        # 16 cpus).
    # Stateless task-pool stages: Band explode and per-partition grouping
    # hold no state worth an actor pool, and task pools skip the actor
    # startup cost that dominated the exchange tail (measured 11.9 -> 7.5 s).
    pack_rows = int(os.environ.get("PLAKAR_LSH_PACK_ROWS", "0"))
    if pack_rows == 0:
        # Auto-size pack tasks to ~16 MiB of signature input each (24 GiB /
        # 16 cpu A/B: 16 MiB tasks cut the tail 3.57 -> 2.64 s vs 8 MiB;
        # fewer, larger IPC blobs amortize per-task and per-blob overhead).
        # Metadata-only on the checkpointed table; streaming callers get
        # the measured-good fixed default.
        pack_rows = 16384
        if checkpoint:
            try:
                size = sig_ds.size_bytes() or 0
                cnt = sig_ds.count()
                row_b = max(1, size // max(1, cnt))
                pack_rows = max(2048, min(65536, (16 << 20) // row_b))
            except Exception:
                pass
    band_rows = sig_ds.map_batches(
        BandStage(
            bands=bands, id_col=id_col, min_shingles=min_shingles,
            salt_buckets=salt_buckets,
        ),
        # bundle small sig blocks into one pack task (<=0: one per block)
        batch_size=pack_rows if pack_rows > 0 else None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # PACKED exchange (functions/exchange.py): band rows are ~bands rows per
    # document, and Ray's row-granular hash shuffle costs ~3 us/row of
    # aggregator CPU — the measured fixed tail of this exchange. Packing
    # each block's rows into one Arrow IPC blob per key bucket makes the
    # shuffled row count ~n_blocks x n_buckets, independent of corpus size.
    keys = ["band_id", "band_hash"] + (["salt"] if salt_buckets else [])
    band_cols = {
        id_col: pa.array([], type=pa.int64()),
        "band_id": pa.array([], type=pa.int32()),
        "band_hash": pa.array([], type=pa.uint64()),
    }
    if salt_buckets:
        band_cols["salt"] = pa.array([], type=pa.int32())
    star = packed_exchange(
        band_rows, keys, n_part,
        BucketStarEdges(
            id_col=id_col, with_salt=bool(salt_buckets),
            emit_hubs=bool(salt_buckets),
        ),
        pa.table(band_cols),
    )
    if not salt_buckets:
        return star
    # Level 2: reconnect the K sub-buckets of each (band_id, band_hash) by
    # re-exchanging only each sub-bucket's hub (min id). The star output is
    # edge-scale (<< corpus), so materializing it to split edges/hubs is
    # cheap and avoids re-running the exchange twice.
    star = star.materialize()
    edges = star.filter(expr="kind == 0").select_columns(["id_a", "id_b"])
    hubs = star.filter(expr="kind == 1").select_columns(
        ["band_id", "band_hash", "id_a"]
    ).rename_columns({"id_a": id_col})
    hub_empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
        }
    )
    hub_edges = packed_exchange(
        hubs, ["band_id", "band_hash"], max(4, n_part // 4),
        BucketStarEdges(id_col=id_col, with_salt=False, emit_hubs=False),
        hub_empty,
    )
    return edges.union(hub_edges)
