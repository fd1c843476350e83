"""Deduplication pipelines: exact, MinHash/LSH near-dup clustering, resync.

The flagship pipeline (SURVEY.md §3.4):

    documents -> MinHashStage (fused CDC-chunk shingles -> signature, actor
    pool) -> BandStage flat-map -> groupby(band_id, band_hash[, salt]) ->
    star candidate edges -> union-find -> clusters (id, cluster_id=min id)

Exact dedup is a text-digest groupby (the distributed form of the
reference's `seen` set, cmd/cdc/stats.go:122-155, applied at document
granularity); resync re-expresses cmd/cdc/resync.go per document.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.functions.exchange import packed_exchange
from plakar_ray.opts import ChunkerOpts
from plakar_ray.sources.pages import apply_insertions, apply_spread_insertions
from plakar_ray.stages.chunk import ChunkerStage, chunk_dataset, default_pool_size
from plakar_ray.stages.lsh import candidate_pairs
from plakar_ray.stages.minhash import minhash_signatures
from plakar_ray.state.unionfind import connected_components_ds, label_propagation


# ------------------------------------------------------------ exact dedup ---


def _text_digest_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    from plakar_ray.functions.strhash import hex_string_array, md5_segments

    data, offsets = byte_views(batch.column(text_col))
    n = len(batch)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    stream = data[offsets[0] : offsets[-1]] if n else data[:0]
    d16 = md5_segments(lengths, stream)  # batched OpenSSL kernel
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_md5": hex_string_array(d16),
            "nbytes": pa.array(lengths, type=pa.int64()),
        }
    )


def exact_dup_groups(
    ds, id_col: str = "doc_id", text_col: str = "text",
    local_threshold: int = 1_000_000,
):
    """(id, group_id) where group_id = min id among byte-identical texts.

    One digest-keyed HASH-PARTITION exchange (no global sort, no per-group
    UDF dispatch over the mostly-singleton digest groups): every digest's
    rows land wholly in one partition, where one lexsort assigns each row
    its group's min id. Digest tables (one 40-byte row per doc — never the
    text) at or under `local_threshold` rows group on the driver instead:
    identical results, none of the exchange's fixed orchestration cost."""
    import ray.data

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    digests = ds.map_batches(
        lambda b: _text_digest_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def assign_groups(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "group_id": pa.array([], type=pa.int64()),
                }
            )
        md5 = np.asarray(
            batch.column("text_md5").to_numpy(zero_copy_only=False), dtype="S40"
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, md5))
        md5, ids = md5[order], ids[order]
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = md5[1:] != md5[:-1]
        gstart = np.flatnonzero(newg)
        gsize = np.diff(np.append(gstart, n))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "group_id": pa.array(
                    np.repeat(ids[gstart], gsize), type=pa.int64()
                ),
            }
        )

    digests = digests.materialize()
    if local_threshold and digests.count() <= local_threshold:
        tables = [b for b in digests.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        merged = pa.concat_tables(tables) if tables else _text_digest_batch(
            pa.table({id_col: pa.array([], type=pa.int64()),
                      text_col: pa.array([], type=pa.string())}),
            id_col, text_col,
        )
        return ray.data.from_arrow(assign_groups(merged))

    # Packed exchange (functions/exchange.py): one row per DOC would be
    # 10^12 row-granular shuffle rows at deployment scale; blobs make the
    # shuffled row count ~n_blocks x n_buckets instead.
    digest_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "text_md5": pa.array([], type=pa.string()),
            "nbytes": pa.array([], type=pa.int64()),
        }
    )
    return packed_exchange(
        digests, ["text_md5"], max(8, cpus // 4), assign_groups, digest_empty
    )


def exact_dedup_stats(
    ds, id_col: str = "doc_id", text_col: str = "text",
    local_threshold: int = 1_000_000,
) -> pa.Table:
    """Corpus-level exact-dedup metrics (document granularity analogue of the
    reference's measure: distinct-by-digest counts and byte ratio).

    The digest table is one 40-byte row per doc; at or under
    `local_threshold` rows every statistic comes from ONE driver pass
    (np.unique), skipping three fixed-cost distributed aggregates. Larger
    corpora take the distributed groupby (nbytes is digest-determined, so
    min(nbytes) is an exact representative)."""
    from ray.data.aggregate import Count, Min, Sum

    digests = ds.map_batches(
        lambda b: _text_digest_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if local_threshold and digests.count() <= local_threshold:
        md5s, lens = [], []
        for b in digests.iter_batches(batch_format="pyarrow", batch_size=None):
            if len(b):
                md5s.append(np.asarray(
                    b.column("text_md5").to_numpy(zero_copy_only=False), dtype="S40"
                ))
                lens.append(
                    b.column("nbytes").to_numpy(zero_copy_only=False).astype(np.int64)
                )
        md5 = np.concatenate(md5s) if md5s else np.empty(0, dtype="S40")
        ln = np.concatenate(lens) if lens else np.empty(0, dtype=np.int64)
        n_docs = int(md5.size)
        total_bytes = int(ln.sum())
        _, first = np.unique(md5, return_index=True)
        n_distinct = int(first.size)
        unique_bytes = int(ln[first].sum())
        return pa.table(
            {
                "n_docs": [n_docs],
                "n_distinct": [n_distinct],
                "n_dup_docs": [n_docs - n_distinct],
                "total_bytes": [total_bytes],
                "unique_bytes": [unique_bytes],
                "dedup_ratio": [unique_bytes / total_bytes if total_bytes else 0.0],
            }
        )
    totals = digests.aggregate(Count(), Sum("nbytes"))
    n_docs = int(totals["count()"])
    total_bytes = int(totals["sum(nbytes)"] or 0)
    uniq = digests.groupby("text_md5").min("nbytes")
    u = uniq.aggregate(Count(), Sum("min(nbytes)"))
    n_distinct = int(u["count()"])
    unique_bytes = int(u["sum(min(nbytes))"] or 0)
    return pa.table(
        {
            "n_docs": [n_docs],
            "n_distinct": [n_distinct],
            "n_dup_docs": [n_docs - n_distinct],
            "total_bytes": [total_bytes],
            "unique_bytes": [unique_bytes],
            "dedup_ratio": [unique_bytes / total_bytes if total_bytes else 0.0],
        }
    )


# --------------------------------------------------------- near-dup (LSH) ---


def near_dup_pairs(
    ds,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 1337,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int | None = None,
    concurrency=None,
    shingle: str = "cdc",
    local_threshold: int = 20_000,
):
    """documents -> candidate near-dup edge Dataset (id_a, id_b)."""
    sigs = minhash_signatures(
        ds, algo=algo, opts=opts, num_perm=num_perm, seed=seed,
        id_col=id_col, text_col=text_col, concurrency=concurrency, shingle=shingle,
    )
    return candidate_pairs(
        sigs, bands=bands, id_col=id_col, salt_buckets=salt_buckets,
        local_threshold=local_threshold,
    )


def near_dup_clusters(
    ds,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 1337,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int | None = None,
    concurrency=None,
    shingle: str = "cdc",
    local_threshold: int = 20_000,
    distributed_cc_threshold: int = 2_000_000,
    cc_metrics: list | None = None,
) -> pa.Table:
    """Flagship: near-duplicate clusters (id, cluster_id = min member id).

    Signature front-end (minhash_signatures) + clusters_from_signatures
    tail; see the latter for the clustering-path switch."""
    sigs = minhash_signatures(
        ds, algo=algo, opts=opts, num_perm=num_perm, seed=seed,
        id_col=id_col, text_col=text_col, concurrency=concurrency, shingle=shingle,
    )
    return clusters_from_signatures(
        sigs, bands=bands, id_col=id_col, salt_buckets=salt_buckets,
        local_threshold=local_threshold,
        distributed_cc_threshold=distributed_cc_threshold,
        cc_metrics=cc_metrics,
    )


def clusters_from_signatures(
    sigs,
    bands: int,
    id_col: str = "doc_id",
    salt_buckets: int | None = None,
    local_threshold: int = 20_000,
    distributed_cc_threshold: int = 2_000_000,
    cc_metrics: list | None = None,
) -> pa.Table:
    """Signature Dataset (id, sig, n_shingles) -> near-dup clusters
    (id, cluster_id = min member id): LSH banding -> candidate star edges
    -> connected components.

    Clustering path auto-switches on edge count: at or below
    `distributed_cc_threshold` edges, union-find streams the edge batches
    on the driver (edges ~ #dup-docs, orders of magnitude below the
    corpus); above it, state/unionfind.label_propagation runs fully
    distributed (labels co-shuffled with edges via hash joins — the driver
    never holds the edge set). Set the threshold to 0 to force the
    distributed path; `cc_metrics` receives its per-round convergence rows.
    """
    edges = candidate_pairs(
        sigs, bands=bands, id_col=id_col, salt_buckets=salt_buckets,
        local_threshold=local_threshold,
    ).materialize()
    if edges.count() > distributed_cc_threshold:
        labels = label_propagation(edges, metrics=cc_metrics)
        out = labels.to_arrow_refs()
        import ray

        t = pa.concat_tables([ray.get(r) for r in out])
        order = pa.compute.sort_indices(t.column("id"))
        t = t.take(order)
        return pa.table(
            {
                id_col: t.column("id"),
                "cluster_id": t.column("cluster_id"),
            }
        )
    comp = connected_components_ds(edges)
    if not comp:
        return pa.table(
            {id_col: pa.array([], type=pa.int64()), "cluster_id": pa.array([], type=pa.int64())}
        )
    ids = sorted(comp)
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array([comp[i] for i in ids], type=pa.int64()),
        }
    )


def near_dup_clusters_resumable(
    input_files: list[str],
    checkpoint_dir: str,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 1337,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int | None = None,
    distributed_cc_threshold: int = 2_000_000,
) -> pa.Table:
    """Checkpoint-resumable flagship: one lineage partition per input shard.

    The expensive stage (chunk+digest+signature) runs through
    state.lineage.run_stage — each input Parquet shard becomes a partition
    whose signature table is written once and skipped on re-runs (manifest
    rows carry the shard path + mtime digest). The LSH + clustering tail is
    cheap relative to signatures and re-runs from the checkpointed signature
    dataset. This is the 100 TB deployment shape: resume = anti-join of
    shards against completed manifests."""
    import os

    import pyarrow.parquet as pq

    from plakar_ray.stages.lsh import candidate_pairs
    from plakar_ray.stages.minhash import MinHashStage
    from plakar_ray.state.lineage import Partition, digest_of, run_stage

    def sign_shard(path: str) -> pa.Table:
        stage = MinHashStage(
            algo, opts, num_perm=num_perm, seed=seed, id_col=id_col, text_col=text_col
        )
        return stage(pq.read_table(path, columns=[id_col, text_col]))

    parts = [
        Partition(
            part_id=f"shard{i:04d}",
            payload=path,
            input_digest=digest_of(path, os.path.getmtime(path), algo, num_perm, seed, opts),
        )
        for i, path in enumerate(sorted(input_files))
    ]
    sig_ds, skipped, ran = run_stage(checkpoint_dir, "signatures", parts, sign_shard)

    edges = candidate_pairs(
        sig_ds, bands=bands, id_col=id_col, salt_buckets=salt_buckets, checkpoint=False
    ).materialize()
    if edges.count() > distributed_cc_threshold:
        import json

        import ray

        rounds: list = []
        labels = label_propagation(edges, metrics=rounds)
        t = pa.concat_tables([ray.get(r) for r in labels.to_arrow_refs()])
        t = t.take(pa.compute.sort_indices(t.column("id")))
        # Convergence evidence rides the lineage dir next to the stage
        # manifests: one row per propagation round.
        with open(os.path.join(checkpoint_dir, "clustering_convergence.json"), "w") as f:
            json.dump({"path": "label_propagation", "rounds": rounds}, f, indent=1)
        return pa.table({id_col: t.column("id"), "cluster_id": t.column("cluster_id")})
    comp = connected_components_ds(edges)
    ids = sorted(comp)
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array([comp[i] for i in ids], type=pa.int64()),
        }
    )


# -------------------------------------------- cross-doc substring dedup ---


def cross_doc_dup_bytes(
    ds,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int | None = None,
    local_threshold: int = 1_000_000,
):
    """Exact cross-document substring duplication at chunk granularity —
    the Ray-Data-native stand-in for suffix-array substring dedup (north
    rule): a substring shared verbatim between two documents shows up as
    chunks whose content digest appears in >= 2 DISTINCT documents (CDC
    boundaries synchronize on shared content, the reference's core
    property, cmd/cdc/stats.go:122-155).

    Returns a Dataset (doc_id, dup_chunks, dup_bytes) for every document
    that carries cross-document duplicated bytes. Two hash-partition
    exchanges (stages/lsh.py house style — no global sort, no per-group
    UDF dispatch over the mostly-singleton digest groups): digest-keyed
    over (digest64, id, length) rows with a vectorized per-partition
    cross-doc filter and map-side per-doc partial sums, then doc-keyed
    over the partials (dup-doc scale, << chunk scale). Run with the fixed
    chunker for the SQL-checkable variant; CDC for boundary-synchronized
    accuracy."""
    import numpy as np

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_part = max(8, cpus // 4)

    chunks = chunk_dataset(
        ds, algo, opts, id_col=id_col, text_col=text_col, batch_size=batch_size
    ).select_columns(["digest64", id_col, "length"])

    def partial_dup_sums(batch: pa.Table) -> pa.Table:
        """One hash partition holds every row of each of its digests: keep
        digests spanning >= 2 distinct docs, pre-sum lengths per doc."""
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "dup_chunks": pa.array([], type=pa.int64()),
                "dup_bytes": pa.array([], type=pa.int64()),
            }
        )
        n = batch.num_rows
        if n == 0:
            return empty
        dig = batch.column("digest64").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ln = batch.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dig))
        dig, ids, ln = dig[order], ids[order], ln[order]
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = dig[1:] != dig[:-1]
        newd = newg.copy()
        newd[1:] |= ids[1:] != ids[:-1]
        gstart = np.flatnonzero(newg)
        distinct = np.add.reduceat(newd.astype(np.int64), gstart)
        keep_group = distinct >= 2
        if not keep_group.any():
            return empty
        gsize = np.diff(np.append(gstart, n))
        keep = np.repeat(keep_group, gsize)
        ids, ln = ids[keep], ln[keep]
        if ids.size == 0:
            return empty
        # map-side combine: per-doc partials within this partition
        order2 = np.argsort(ids, kind="stable")
        ids, ln = ids[order2], ln[order2]
        newdoc = np.empty(ids.size, dtype=bool)
        newdoc[0] = True
        newdoc[1:] = ids[1:] != ids[:-1]
        dstart = np.flatnonzero(newdoc)
        return pa.table(
            {
                id_col: pa.array(ids[dstart], type=pa.int64()),
                "dup_chunks": pa.array(
                    np.diff(np.append(dstart, ids.size)), type=pa.int64()
                ),
                "dup_bytes": pa.array(np.add.reduceat(ln, dstart), type=pa.int64()),
            }
        )

    def merge_doc_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.group_by(id_col).aggregate(
            [("dup_chunks", "sum"), ("dup_bytes", "sum")]
        )
        return t.rename_columns([id_col, "dup_chunks", "dup_bytes"])

    # Chunk-digest tables (24-byte rows, no payload) at or under
    # `local_threshold` rows skip both exchanges and group on the driver —
    # identical results via the same vectorized functions.
    chunks = chunks.materialize()
    if local_threshold and chunks.count() <= local_threshold:
        import ray.data

        tables = [b for b in chunks.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        if not tables:
            return ray.data.from_arrow(partial_dup_sums(
                pa.table({"digest64": pa.array([], type=pa.uint64()),
                          id_col: pa.array([], type=pa.int64()),
                          "length": pa.array([], type=pa.int64())})
            ))
        return ray.data.from_arrow(
            merge_doc_partials(partial_dup_sums(pa.concat_tables(tables)))
        )

    # Packed exchanges (functions/exchange.py): one row per CHUNK is the
    # heaviest row count in the repo — blobs keep the shuffled row count at
    # ~n_blocks x n_buckets regardless of corpus size.
    chunk_empty = pa.table(
        {
            "digest64": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
            "length": pa.array([], type=pa.int64()),
        }
    )
    partials = packed_exchange(
        chunks, ["digest64"], n_part, partial_dup_sums, chunk_empty
    )
    # Second, tiny exchange: per-doc partials (<= one row per doc per
    # partition) re-keyed by doc and merged per partition.
    partial_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "dup_chunks": pa.array([], type=pa.int64()),
            "dup_bytes": pa.array([], type=pa.int64()),
        }
    )
    return packed_exchange(
        partials, [id_col], max(4, n_part // 2), merge_doc_partials,
        partial_empty,
    )


# ----------------------------------------- exact substring-span dedup -------

_GRAM_MUL = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
_GRAM_MUL_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
# Independent second multiplier (xxhash64 prime2 — a published constant):
# the clean transform pairs both hashes into an effective 128-bit gram key
# so a 64-bit collision can never delete non-duplicate text.
_GRAM_MUL2 = np.uint64(0xC2B2AE3D27D4EB4F)
_GRAM_MUL2_INV = np.uint64(pow(0xC2B2AE3D27D4EB4F, -1, 1 << 64))


def gram_window_hashes(
    data: np.ndarray,
    gram_len: int,
    tile: int = 1 << 22,
    mul: np.uint64 = _GRAM_MUL,
    mul_inv: np.uint64 = _GRAM_MUL_INV,
) -> np.ndarray:
    """Polynomial rolling hash of EVERY `gram_len`-byte window of `data`
    (uint8): H[p] = sum_{j<L} data[p+j] * MUL^(L-1-j) mod 2^64.

    Vectorized O(n) via the prefix identity (multiply-add is linear mod
    2^64, the same family as the gear window scan in kernels.py): with
    S[i] = sum_{k<i} data[k] * MULINV^k, H[p] = (S[p+L] - S[p]) * MUL^(p+L-1).
    Computed in overlapping tiles so working memory stays ~3 uint64 arrays
    of `tile` elements regardless of input size; the MUL^p / MULINV^p
    exponents cancel, so per-tile local exponents give identical values.
    """
    L = int(gram_len)
    n = int(data.size)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n - L + 1, dtype=np.uint64)
    m = min(int(tile), n - L + 1) + L - 1
    # Power tables are pure functions of m and the scratch is bounded by the
    # tile size: cache both per process. A map task calling this per batch
    # otherwise mmaps + munmaps ~130 MB of large numpy temporaries per call
    # — on hosts where first-touch page faults are slow (ballooned VMs,
    # this sandbox under neighbor load) that dominates the kernel itself.
    key = (m, int(mul))
    cached = _GRAM_SCRATCH.get(key)
    if cached is None:
        base = np.full(m, mul, dtype=np.uint64)
        base[0] = 1
        mp = np.multiply.accumulate(base)  # MUL^0 .. MUL^(m-1), wrapping
        basei = np.full(m, mul_inv, dtype=np.uint64)
        basei[0] = 1
        mip = np.multiply.accumulate(basei)  # MULINV^0 ..
        scratch = np.empty(m, dtype=np.uint64)
        # Small FIFO cache (ADVICE r3): alternating geometries (steady-state
        # vs short-tail blocks, or the clean path's two multipliers) must
        # not rebuild ~100 MB of power tables per call. Map tasks are
        # processes, so no cross-thread sharing of `scratch`.
        while len(_GRAM_SCRATCH) >= 3:
            _GRAM_SCRATCH.pop(next(iter(_GRAM_SCRATCH)))
        _GRAM_SCRATCH[key] = (mp, mip, scratch)
    else:
        mp, mip, scratch = cached
    for t0 in range(0, n - L + 1, int(tile)):
        t1 = min(t0 + int(tile), n - L + 1)  # window starts in [t0, t1)
        k = t1 - 1 + L - t0
        s = scratch[:k]
        np.multiply(data[t0 : t0 + k], mip[:k], out=s, casting="unsafe")
        np.cumsum(s, out=s)
        h = out[t0:t1]
        h[:] = s[L - 1 :]
        h[1:] -= s[: k - L]
        h *= mp[L - 1 : k]
    return out


_GRAM_SCRATCH: dict = {}


def _window_argmin_select(seg: np.ndarray, w: int) -> np.ndarray:
    """Leftmost argmin of every length-w sliding window of `seg`, deduped
    and sorted — equals np.unique(sliding_window_view(seg, w).argmin(1) +
    arange) but O(n) instead of O(n*w): van Herk / Gil-Werman two-level
    block minima (per-block prefix and suffix running argmins; a window
    spans one block suffix + the next block's prefix), with index
    bookkeeping that preserves np.argmin's leftmost tie-breaking (prefix
    updates on strict <, suffix right-to-left scan updates on <=, and the
    suffix part wins value ties because its indices are smaller)."""
    v = int(seg.size)
    if v <= w:
        return np.array([int(np.argmin(seg))], dtype=np.int64)
    nw = v - w + 1
    nb = (v + w - 1) // w
    pad = nb * w - v
    if pad:
        vals = np.concatenate(
            [seg, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=seg.dtype)]
        )
    else:
        vals = seg
    V = vals.reshape(nb, w)
    col = np.arange(w, dtype=np.int64)
    pv = np.minimum.accumulate(V, axis=1)
    new = np.empty((nb, w), dtype=bool)
    new[:, 0] = True
    new[:, 1:] = V[:, 1:] < pv[:, :-1]
    pi = np.maximum.accumulate(np.where(new, col[None, :], -1), axis=1)
    Vr = V[:, ::-1]
    svr = np.minimum.accumulate(Vr, axis=1)
    newr = np.empty((nb, w), dtype=bool)
    newr[:, 0] = True
    newr[:, 1:] = Vr[:, 1:] <= svr[:, :-1]
    sir = np.maximum.accumulate(np.where(newr, col[None, :], -1), axis=1)
    base = (np.arange(nb, dtype=np.int64) * w)[:, None]
    pvg = pv.reshape(-1)
    pig = (pi + base).reshape(-1)
    svg = svr[:, ::-1].reshape(-1)
    sig = ((w - 1) - sir[:, ::-1] + base).reshape(-1)
    k = np.arange(nw, dtype=np.int64)
    j = k + w - 1
    sel = np.where(svg[k] <= pvg[j], sig[k], pig[j])
    return np.unique(sel)


def _gram_rows_batch(
    batch: pa.Table, gram_len: int, id_col: str, text_col: str, winnow_w: int,
    dual: bool = False,
) -> pa.Table:
    """One (gram64, id, pos) row per L-byte window position (stride 1), or
    per winnowing-selected position when winnow_w > 1. `dual=True`
    (stride-1 only) appends an independent second hash column `gram64b`
    so consumers can key on an effective 128-bit gram identity."""
    L = int(gram_len)
    ecols = {
        "gram64": pa.array([], type=pa.uint64()),
        id_col: pa.array([], type=pa.int64()),
        "pos": pa.array([], type=pa.int64()),
    }
    if dual:
        ecols["gram64b"] = pa.array([], type=pa.uint64())
    empty = pa.table(ecols)
    if batch.num_rows == 0:
        return empty
    data, offsets = byte_views(batch.column(text_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    valid = np.maximum(lens - L + 1, 0)
    total = int(valid.sum())
    if total == 0:
        return empty
    if winnow_w > 1:
        # Winnowing selection (Schleimer et al., SIGMOD 2003): keep the
        # leftmost minimal hash of every w-window of each document's gram
        # sequence. Selection depends only on content, so two documents
        # sharing a span select the same intra-span positions — any shared
        # span of length >= L + w - 1 keeps a selected gram in BOTH docs.
        # Deployment path: ONE fused native pass per batch (rolling gram
        # hash + monotonic-deque selection over every doc segment,
        # _native/cdc.c:gram_winnow_multi) — the stride-1 hash array never
        # materializes at all; peak temporaries are the ~2/(w+1)-sized
        # selected-row output. Fallback: numpy h_all + per-doc
        # van Herk block-minima selection (differential-tested equal).
        from plakar_ray import _native

        w = int(winnow_w)
        lib = _native.load()
        if lib is not None and hasattr(lib, "gram_winnow_multi"):
            h, doc_idx, pos = _native.gram_winnow_multi(
                lib, data, offsets.astype(np.int64, copy=False), L, w,
                int(_GRAM_MUL),
            )
            if h.size == 0:
                return empty
            return pa.table(
                {
                    "gram64": pa.array(h, type=pa.uint64()),
                    id_col: pa.array(ids[doc_idx], type=pa.int64()),
                    "pos": pa.array(pos, type=pa.int64()),
                }
            )
        h_all = gram_window_hashes(data, L)
        hs, ds_, ps = [], [], []
        for d in range(lens.size):
            v = int(valid[d])
            if v == 0:
                continue
            seg = h_all[offsets[d] : offsets[d] + v]
            sel = _window_argmin_select(seg, w)
            hs.append(seg[sel])
            ds_.append(np.full(sel.size, ids[d], dtype=np.int64))
            ps.append(sel)
        if not hs:
            return empty
        return pa.table(
            {
                "gram64": pa.array(np.concatenate(hs), type=pa.uint64()),
                id_col: pa.array(np.concatenate(ds_), type=pa.int64()),
                "pos": pa.array(np.concatenate(ps), type=pa.int64()),
            }
        )
    h_all = gram_window_hashes(data, L)
    doc_idx = np.repeat(np.arange(lens.size), valid)
    run_start = np.cumsum(valid) - valid
    local = np.arange(total, dtype=np.int64) - np.repeat(run_start, valid)
    gpos = offsets[:-1][doc_idx] + local
    h = h_all[gpos]
    cols = {
        "gram64": pa.array(h, type=pa.uint64()),
        id_col: pa.array(ids[doc_idx], type=pa.int64()),
        "pos": pa.array(local, type=pa.int64()),
    }
    if dual:
        h2 = gram_window_hashes(data, L, mul=_GRAM_MUL2, mul_inv=_GRAM_MUL2_INV)
        cols["gram64b"] = pa.array(h2[gpos], type=pa.uint64())
    return pa.table(cols)


def _cross_doc_positions(batch: pa.Table, id_col: str) -> pa.Table:
    """One hash partition holds every row of each of its gram hashes: keep
    the (id, pos) rows whose gram spans >= 2 distinct documents."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return empty
    g = batch.column("gram64").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    pos = batch.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, g))
    g, ids, pos = g[order], ids[order], pos[order]
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = g[1:] != g[:-1]
    newd = newg.copy()
    newd[1:] |= ids[1:] != ids[:-1]
    gstart = np.flatnonzero(newg)
    distinct = np.add.reduceat(newd.astype(np.int64), gstart)
    keep_group = distinct >= 2
    if not keep_group.any():
        return empty
    gsize = np.diff(np.append(gstart, n))
    keep = np.repeat(keep_group, gsize)
    return pa.table(
        {
            id_col: pa.array(ids[keep], type=pa.int64()),
            "pos": pa.array(pos[keep], type=pa.int64()),
        }
    )


def _merge_span_batch(batch: pa.Table, merge_gap: int, span_len: int, id_col: str) -> pa.Table:
    """Per document (one hash partition holds all of a doc's rows): sort the
    duplicated-gram positions, merge intervals [p, p+L) whose starts are
    <= merge_gap apart, emit (id, dup_spans, dup_span_bytes). Positions at
    most L apart have overlapping-or-touching intervals, so each merged
    group covers exactly [min, max + L) — last - first + L bytes."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "dup_spans": pa.array([], type=pa.int64()),
            "dup_span_bytes": pa.array([], type=pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return empty
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    pos = batch.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, ids))
    ids, pos = ids[order], pos[order]
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = (ids[1:] != ids[:-1]) | (pos[1:] - pos[:-1] > merge_gap)
    sstart = np.flatnonzero(brk)  # one per merged span
    send = np.append(sstart[1:], n) - 1
    span_bytes = pos[send] - pos[sstart] + span_len
    span_doc = ids[sstart]
    newdoc = np.empty(sstart.size, dtype=bool)
    newdoc[0] = True
    newdoc[1:] = span_doc[1:] != span_doc[:-1]
    dstart = np.flatnonzero(newdoc)
    return pa.table(
        {
            id_col: pa.array(span_doc[dstart], type=pa.int64()),
            "dup_spans": pa.array(
                np.diff(np.append(dstart, sstart.size)), type=pa.int64()
            ),
            "dup_span_bytes": pa.array(
                np.add.reduceat(span_bytes, dstart), type=pa.int64()
            ),
        }
    )


def substring_dup_spans(
    ds,
    gram_len: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    winnow_w: int = 0,
    local_threshold: int = 2_000_000,
    batch_size: int | None = None,
):
    """Cross-document duplicated-SUBSTRING spans at byte granularity — the
    position-level realization of the north rule's suffix-array substring
    dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"). A maximal substring of length >= L shared verbatim by
    two documents is exactly the union of its duplicated L-byte grams, so
    stride-1 rolling-gram matching + per-document interval merge computes
    the merged byte coverage of every cross-document duplicated span >= L
    with no suffix array — and unlike one, it is a pure two-exchange
    shuffle plan (gram-keyed, then doc-keyed), the shape that scales.

    Returns a Dataset (id, dup_spans, dup_span_bytes) over documents that
    carry at least one duplicated span. Exact at winnow_w=0 (default):
    every position whose L-gram occurs in another document is covered.

    Scale path: stride-1 emission shuffles one 24-byte row per corpus byte.
    `winnow_w=w` (Schleimer et al. 2003 winnowing) cuts emission ~w/2-fold
    while still detecting every shared span >= L + w - 1 (selection is
    content-defined, so both copies select the same intra-span grams);
    span-byte totals then under-count span edges by < L + w bytes per span
    — a documented lower bound, tested for recall. The CDC-granularity
    sibling `cross_doc_dup_bytes` stays the coarse whole-corpus pass; this
    operator is the fine-grained measure (run corpus-wide at 100 TB with
    winnowing, or exact over suspect partitions)."""
    import ray
    import ray.data

    L = int(gram_len)
    merge_gap = L + max(0, int(winnow_w) - 1)

    grams = ds.map_batches(
        lambda b: _gram_rows_batch(b, L, id_col, text_col, int(winnow_w)),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return spans_from_gram_rows(grams, L, merge_gap, id_col, local_threshold)


def spans_from_gram_rows(
    grams,
    span_len: int,
    merge_gap: int,
    id_col: str = "doc_id",
    local_threshold: int = 2_000_000,
):
    """(gram64, id, pos) row Dataset -> (id, dup_spans, dup_span_bytes):
    the exchange tail of substring_dup_spans, shared with its md5 evidence
    twin (stages/evidence.substring_winnow_spans_md5) so the driver's SQL
    gate value-checks the SAME gram exchange, cross-doc matching, and
    interval merge that the production gram front-ends feed."""
    import ray
    import ray.data

    L = int(span_len)

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # Gram rows outnumber corpus bytes / (w/2); the gram-keyed reduce runs
    # one task per partition (batch == block), so reduce parallelism IS
    # n_part — size it to the cluster, not a fraction of it. The doc-keyed
    # second exchange carries only duplicated positions (tiny).
    n_part = max(8, cpus)

    if local_threshold:
        # The size gate needs a count, hence a materialize; the distributed
        # path (local_threshold=0 or large corpora) streams straight into
        # the hash exchange with no barrier.
        grams = grams.materialize()
    if local_threshold and grams.count() <= local_threshold:
        tables = [
            b
            for b in grams.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = (
            pa.concat_tables(tables)
            if tables
            else pa.table(
                {
                    "gram64": pa.array([], type=pa.uint64()),
                    id_col: pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        )
        return ray.data.from_arrow(
            _merge_span_batch(
                _cross_doc_positions(merged, id_col), merge_gap, L, id_col
            )
        )

    # Packed exchanges (functions/exchange.py): the gram exchange ships one
    # IPC blob per (block, bucket) instead of one row per gram — Ray's
    # row-wise hash shuffle costs ~3 us/row of aggregator CPU, which at one
    # gram row per w/2 corpus bytes would dominate the whole operator.
    gram_empty = pa.table(
        {
            "gram64": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    dup_pos = packed_exchange(
        grams, ["gram64"], n_part,
        lambda b: _cross_doc_positions(b, id_col), gram_empty,
    )
    pos_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    return packed_exchange(
        dup_pos, [id_col], max(8, n_part // 2),
        lambda b: _merge_span_batch(b, merge_gap, L, id_col), pos_empty,
    )


def _nonowner_positions(batch: pa.Table, id_col: str) -> pa.Table:
    """Per gram group (one hash partition holds every occurrence): if the
    gram spans >= 2 distinct documents, every occurrence EXCEPT the
    lexicographically smallest (id, pos) — the canonical copy that
    survives — is marked for removal."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return empty
    g = batch.column("gram64").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    pos = batch.column("pos").to_numpy(zero_copy_only=False)
    if "gram64b" in batch.column_names:
        # Effective 128-bit gram identity (ADVICE r3): a 64-bit collision
        # must never elect an owner across non-identical grams. Both hash
        # halves share the gram64 partition key, so pairing them here is
        # exact.
        g2 = batch.column("gram64b").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids, g2, g))
        g, g2, ids, pos = g[order], g2[order], ids[order], pos[order]
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = (g[1:] != g[:-1]) | (g2[1:] != g2[:-1])
    else:
        order = np.lexsort((pos, ids, g))
        g, ids, pos = g[order], ids[order], pos[order]
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = g[1:] != g[:-1]
    newd = newg.copy()
    newd[1:] |= ids[1:] != ids[:-1]
    gstart = np.flatnonzero(newg)
    distinct = np.add.reduceat(newd.astype(np.int64), gstart)
    gsize = np.diff(np.append(gstart, n))
    dup_group = np.repeat(distinct >= 2, gsize)
    dup_group[gstart] = False  # the owner (first row of its group) survives
    if not dup_group.any():
        return empty
    return pa.table(
        {
            id_col: pa.array(ids[dup_group], type=pa.int64()),
            "pos": pa.array(pos[dup_group], type=pa.int64()),
        }
    )


def _intervals_batch(batch: pa.Table, span_len: int, id_col: str) -> pa.Table:
    """Doc-keyed exchange reduce: merge one partition's removal POSITIONS
    (every position of each of its docs — one row per duplicated byte,
    stride-1) into disjoint per-doc coverage intervals [start, end).
    Fixed span length makes the merge a sorted diff: consecutive sorted
    positions p, q of one doc coalesce iff q <= p + L (overlap or
    adjacency — both read as one covered run downstream). Output volume
    is ~L x smaller than the position rows."""
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "start": pa.array([], type=pa.int64()),
            "end": pa.array([], type=pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return empty
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    pos = batch.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, ids))
    sid, spos = ids[order], pos[order]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (sid[1:] != sid[:-1]) | (spos[1:] > spos[:-1] + span_len)
    starts_at = np.flatnonzero(new)
    last_at = np.append(starts_at[1:], n) - 1
    return pa.table(
        {
            id_col: pa.array(sid[starts_at], type=pa.int64()),
            "start": pa.array(spos[starts_at], type=pa.int64()),
            "end": pa.array(spos[last_at] + span_len, type=pa.int64()),
        }
    )


def _clean_docs(
    docs: pa.Table,
    did: np.ndarray,
    rid: np.ndarray,
    rstart: np.ndarray,
    rend: np.ndarray,
    id_col: str,
    text_col: str,
    emit_text: bool,
) -> pa.Table:
    """Shared clean core: `docs` sorted by (unique) id; (rid, rstart,
    rend) are this doc set's DISJOINT merged removal intervals. Builds
    the byte coverage with one diff/cumsum over the concatenated doc
    buffer, slices the kept bytes out in one boolean gather, and emits
    per-doc accounting + md5 of the cleaned text. Every document appears
    in the output (zero-removal docs keep their full-text md5)."""
    data, offsets = byte_views(docs.column(text_col))
    total = int(offsets[-1])
    covered = np.zeros(total, dtype=bool)
    spans = np.zeros(did.size, dtype=np.int64)
    removed = np.zeros(did.size, dtype=np.int64)
    if rid.size:
        idx = np.searchsorted(did, rid)
        starts = offsets[:-1][idx] + rstart
        ends = starts + (rend - rstart)
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        covered = np.cumsum(delta[:-1]) > 0
        spans = np.bincount(idx, minlength=did.size).astype(np.int64)
        removed = np.bincount(
            idx, weights=(rend - rstart), minlength=did.size
        ).astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    kept = lens - removed
    kept_data = data[~covered]
    kept_off = np.concatenate([[0], np.cumsum(kept)])
    from plakar_ray.functions.strhash import hex_string_array, md5_segments

    md5s = hex_string_array(md5_segments(kept, kept_data))
    cols = {
        id_col: pa.array(did, type=pa.int64()),
        "removed_spans": pa.array(spans, type=pa.int64()),
        "removed_bytes": pa.array(removed, type=pa.int64()),
        "kept_bytes": pa.array(kept, type=pa.int64()),
        "cleaned_md5": md5s,
    }
    if emit_text:
        # kept bytes are already contiguous per doc: one zero-copy
        # large_binary assembly from (offsets, data). BINARY, not string:
        # removal spans are byte-aligned and may split multibyte UTF-8
        # codepoints (ADVICE r3) — emitting a string column would write
        # invalid Arrow data on non-ASCII corpora.
        cols["cleaned_text"] = pa.Array.from_buffers(
            pa.large_binary(),
            did.size,
            [None, pa.py_buffer(kept_off.astype(np.int64).tobytes()),
             pa.py_buffer(kept_data.tobytes())],
        )
    return pa.table(cols)


def _clean_partition(
    batch: pa.Table, id_col: str, text_col: str, emit_text: bool = False
) -> pa.Table:
    """Tagged-union co-shuffle reduce (fallback path): one partition
    holds a set of documents (start == -1 rows, carrying text) plus every
    merged removal interval of those documents."""
    cols = {
        id_col: pa.array([], type=pa.int64()),
        "removed_spans": pa.array([], type=pa.int64()),
        "removed_bytes": pa.array([], type=pa.int64()),
        "kept_bytes": pa.array([], type=pa.int64()),
        "cleaned_md5": pa.array([], type=pa.string()),
    }
    if emit_text:
        cols["cleaned_text"] = pa.array([], type=pa.large_binary())
    empty = pa.table(cols)
    if batch.num_rows == 0:
        return empty
    start_all = batch.column("start").to_numpy(zero_copy_only=False)
    is_doc = start_all == -1
    docs = batch.filter(pa.array(is_doc))
    if docs.num_rows == 0:
        return empty
    # documents, sorted by id for searchsorted routing of intervals
    did = docs.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(did, kind="stable")
    docs = docs.take(pa.array(order))
    did = did[order]
    rid = batch.column(id_col).to_numpy(zero_copy_only=False)[~is_doc]
    rstart = start_all[~is_doc]
    rend = batch.column("end").to_numpy(zero_copy_only=False)[~is_doc]
    return _clean_docs(
        docs, did, rid, rstart, rend, id_col, text_col, emit_text
    )


def substring_dedup_clean(
    ds,
    gram_len: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 2_000_000,
    batch_size: int | None = None,
    emit_text: bool = False,
    broadcast_threshold: int = 16_000_000,
):
    """The substring-dedup TRANSFORM (Lee et al. 2021): remove all but one
    occurrence of every cross-document duplicated span >= L, keeping the
    occurrence with the lexicographically smallest (id, pos) as canonical.
    Returns per-document accounting plus the md5 of the cleaned text —
    byte-exact evidence of what a cleaned-corpus writer would emit, in a
    driver-checkable size (the cleaned corpus itself is just the kept-byte
    gather in `_clean_docs`, one `write_parquet` away).

    Plan: stride-1 gram rows -> gram-keyed hash-partition exchange
    (per-gram owner election, non-owner positions out) -> doc-keyed
    exchange of the POSITIONS ONLY (16 B/row, no text), whose reduce
    merges each doc's positions into disjoint coverage intervals
    [start, end) — ~L x fewer rows than positions. The interval table is
    then BROADCAST (ray.put of three sorted int64 arrays, read zero-copy
    per task) and every document is rebuilt in place by one map over the
    original dataset; the corpus text never crosses an exchange. Above
    `broadcast_threshold` interval rows (~24 B each) it falls back to a
    tagged-union doc co-shuffle (interval rows start >= 0 unioned with
    doc rows start == -1 carrying text)."""
    import ray
    import ray.data

    L = int(gram_len)

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # Reduce-side parallelism == n_part (batch == block == one partition).
    n_part = max(8, cpus)

    ds = ds.materialize()  # consumed twice: gram rows + doc rebuild

    grams = ds.map_batches(
        lambda b: _gram_rows_batch(b, L, id_col, text_col, 0, dual=True),
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # One canonical text type on BOTH union sides: parquet readers commonly
    # yield large_string, and the Ray union does not promote schemas the
    # way the local concat_tables(promote_options=...) does.
    def _tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "start": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64), type=pa.int64()
                ),
                "end": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64), type=pa.int64()
                ),
                text_col: batch.column(text_col).cast(pa.large_string()),
            }
        )

    def _tag_intervals(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "start": batch.column("start"),
                "end": batch.column("end"),
                text_col: pa.array([""] * batch.num_rows, type=pa.large_string()),
            }
        )

    if local_threshold:
        grams = grams.materialize()  # gate needs a count; no barrier otherwise
    if local_threshold and grams.count() <= local_threshold:
        gtables = [
            b
            for b in grams.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        gm = (
            pa.concat_tables(gtables)
            if gtables
            else pa.table(
                {
                    "gram64": pa.array([], type=pa.uint64()),
                    id_col: pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                    "gram64b": pa.array([], type=pa.uint64()),
                }
            )
        )
        removals = _tag_intervals(
            _intervals_batch(_nonowner_positions(gm, id_col), L, id_col)
        )
        docs_tagged = ds.map_batches(
            _tag_docs, batch_format="pyarrow", zero_copy_batch=True
        )
        dtables = [
            b
            for b in docs_tagged.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = pa.concat_tables([removals] + dtables, promote_options="default")
        return ray.data.from_arrow(
            _clean_partition(merged, id_col, text_col, emit_text)
        )

    # Packed exchanges (functions/exchange.py) — stride-1 gram rows are one
    # row per corpus byte, so a row-granular shuffle is the dominant cost.
    gram_empty = pa.table(
        {
            "gram64": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
            "gram64b": pa.array([], type=pa.uint64()),
        }
    )
    pos_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    positions = packed_exchange(
        grams, ["gram64"], n_part,
        lambda b: _nonowner_positions(b, id_col), gram_empty,
    )
    intervals = packed_exchange(
        positions, [id_col], n_part,
        lambda b: _intervals_batch(b, L, id_col), pos_empty,
    ).materialize()

    if intervals.count() <= broadcast_threshold:
        # Small-side broadcast: each doc's merged intervals, sorted by
        # (id, start), in the object store once; rebuild tasks gather
        # their own docs' rows via searchsorted.
        from plakar_ray.functions.npu import batch_rows_for_keys, put_sorted_by_key

        ref = put_sorted_by_key(intervals, id_col, ["start", "end"])

        def _rebuild_broadcast(batch: pa.Table) -> pa.Table:
            ids_np = (
                batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            d_order = np.argsort(ids_np, kind="stable")
            docs = pa.table(
                {
                    id_col: batch.column(id_col).cast(pa.int64()),
                    text_col: batch.column(text_col).cast(pa.large_string()),
                }
            ).take(pa.array(d_order))
            d_ids = ids_np[d_order]
            rids, rstart, rend = batch_rows_for_keys(ref, d_ids)
            return _clean_docs(
                docs, d_ids, rids, rstart, rend, id_col, text_col, emit_text
            )

        return ds.map_batches(
            _rebuild_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    both = intervals.map_batches(
        _tag_intervals, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ds.map_batches(_tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    )
    tagged_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "start": pa.array([], type=pa.int64()),
            "end": pa.array([], type=pa.int64()),
            text_col: pa.array([], type=pa.large_string()),
        }
    )
    return packed_exchange(
        both, [id_col], n_part,
        lambda b: _clean_partition(b, id_col, text_col, emit_text),
        tagged_empty,
    )


# ----------------------------------------------------------------- resync ---


class ResyncStage:
    """Per-document edit-resilience (cmd/cdc/resync.go:39-147): chunk the
    original and an edited copy (k seeded insertions of m bytes), return the
    fraction of edited bytes carried by chunks whose digest exists in the
    original. Map-only: both versions of a document live in its row."""

    def __init__(
        self,
        algo: str,
        opts: ChunkerOpts | None = None,
        edits: int = 16,
        edit_size: int = 1,
        seed: int = 1,
        id_col: str = "doc_id",
        text_col: str = "text",
        digest: str = "sha256",
        edit_mode: str = "prng",
    ):
        self.chunker = ChunkerStage(algo, opts, id_col=id_col, text_col=text_col)
        self.edits = edits
        self.edit_size = edit_size
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col
        # md5 + 'spread' form the SQL-oracle twin: same chunk/membership
        # machinery, DuckDB-reproducible digest and edit positions.
        self._hash = hashlib.md5 if digest == "md5" else hashlib.sha256
        self.edit_mode = edit_mode

    def _digest_set(
        self, doc: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """(unique digest keys as a void array, their chunk lengths, total
        chunk bytes). sha256 rides the native segment kernel; md5 (the SQL
        twin family) keeps hashlib but packs straight into one buffer —
        either way set intersection happens in numpy, not a Python dict."""
        lengths = self.chunker.chunk_doc(doc)
        k = lengths.shape[0]
        width = 32 if self._hash is hashlib.sha256 else 16
        if k == 0:
            empty = np.empty(0, dtype=np.dtype((np.void, width)))
            return empty, np.empty(0, dtype=np.int64), 0
        if self._hash is hashlib.sha256:
            from plakar_ray.stages.chunk import ChunkerStage

            dig = ChunkerStage._digest_segments(lengths, doc)  # (k, 32)
        else:
            dig = np.empty((k, 16), dtype=np.uint8)
            ends = np.cumsum(lengths)
            starts = ends - lengths
            mv = memoryview(doc)
            md5 = self._hash
            for j, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
                dig[j] = np.frombuffer(md5(mv[a:b]).digest(), dtype=np.uint8)
        keys = dig.view(np.dtype((np.void, dig.shape[1]))).ravel()
        uk, idx = np.unique(keys, return_index=True)
        return uk, lengths[idx].astype(np.int64), int(lengths.sum())

    def _edited(self, doc: bytes) -> bytes:
        if self.edit_mode == "spread":
            return apply_spread_insertions(doc, self.edits, b"X" * self.edit_size)
        return apply_insertions(doc, self.edits, self.edit_size, self.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.text_col))
        n = len(batch)
        shared = np.zeros(n, dtype=np.float64)
        shared_b = np.zeros(n, dtype=np.int64)
        edited_b = np.zeros(n, dtype=np.int64)
        n_orig = np.zeros(n, dtype=np.int32)
        n_edit = np.zeros(n, dtype=np.int32)
        for i in range(n):
            doc = data[offsets[i] : offsets[i + 1]]
            orig_keys, _, _ = self._digest_set(doc)
            edited = self._edited(doc.tobytes())
            edit_keys, edit_lens, edited_bytes = self._digest_set(
                np.frombuffer(edited, dtype=np.uint8)
            )
            shared_mask = np.isin(edit_keys, orig_keys, assume_unique=True)
            shared_bytes = int(edit_lens[shared_mask].sum())
            shared[i] = shared_bytes / edited_bytes if edited_bytes else 0.0
            shared_b[i] = shared_bytes
            edited_b[i] = edited_bytes
            n_orig[i] = orig_keys.shape[0]
            n_edit[i] = edit_keys.shape[0]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "shared_frac": pa.array(shared),
                "shared_bytes": pa.array(shared_b, type=pa.int64()),
                "edited_bytes": pa.array(edited_b, type=pa.int64()),
                "chunks_orig": pa.array(n_orig, type=pa.int32()),
                "chunks_edited": pa.array(n_edit, type=pa.int32()),
            }
        )


def resync(
    ds,
    algo: str,
    opts: ChunkerOpts | None = None,
    edits: int = 16,
    edit_size: int = 1,
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
) -> pa.Table:
    """Corpus resync summary: mean per-document shared fraction + totals."""
    from ray.data.aggregate import Count, Mean

    if concurrency is None:
        concurrency = default_pool_size()
    per_doc = ds.map_batches(
        ResyncStage,
        fn_constructor_kwargs=dict(
            algo=algo, opts=opts, edits=edits, edit_size=edit_size, seed=seed,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    agg = per_doc.aggregate(Mean("shared_frac"), Count())
    return pa.table(
        {
            "algorithm": [algo],
            "edits": [edits],
            "edit_size": [edit_size],
            "mean_shared_frac": [float(agg["mean(shared_frac)"] or 0.0)],
            "n_docs": [int(agg["count()"])],
        }
    )


def resync_fixed_per_doc(
    ds,
    chunk_size: int = 256,
    edits: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
):
    """SQL-oracle twin of the resync pipeline: fixed-size chunks, md5 digests,
    and the deterministic 'spread' edit model, so DuckDB can reproduce the
    edited copy and the digest-membership bytes exactly. Returns the per-doc
    Dataset with integer shared/edited byte columns."""
    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        ResyncStage,
        fn_constructor_kwargs=dict(
            algo="fixed-v1.0.0",
            opts=ChunkerOpts(normal_size=chunk_size),
            edits=edits,
            edit_size=1,
            id_col=id_col,
            text_col=text_col,
            digest="md5",
            edit_mode="spread",
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
