"""Dedup store: the reference library's end use-case (content-addressed
chunk storage) as a Ray Data sink.

`write_unique_chunks` chunks a corpus, keeps exactly one copy of every
distinct chunk (by sha256), and writes a partitioned content-addressed store:
one Parquet directory per digest prefix so output is resumable and a chunk
is locatable by digest without reading everything. `restore_document`
reassembles a document from the store + its recipe (the chunk sequence) and
must reproduce the input byte-exactly — the Copy/reconstruction invariant
(chunkers.go:192-212, tests/golden_test.go:70-72) at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.opts import ChunkerOpts


class _ChunkWithBytes:
    """Chunk explode that also carries the chunk payload (for the store)."""

    def __init__(self, algo: str, opts: ChunkerOpts | None, id_col: str, text_col: str):
        from plakar_ray.stages.chunk import ChunkerStage

        self.inner = ChunkerStage(algo, opts, id_col=id_col, text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from plakar_ray.functions.arrowbytes import byte_views

        t = self.inner(batch)
        data, offsets = byte_views(batch.column(self.inner.text_col))
        ln = t.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        # ChunkerStage emits chunks doc-grouped in batch order with each
        # document's chunks tiling its bytes contiguously (empty docs emit
        # no rows AND no bytes), so the concatenated payload stream IS the
        # batch value buffer: the payload column is one LargeBinaryArray
        # over that buffer with cumsum(length) offsets — zero bytes copied,
        # zero per-chunk Python. The tiling invariant is checked end-to-end
        # (voff[-1] must land on the buffer end); any violation falls back
        # to an explicit vectorized gather.
        voff = np.empty(ln.shape[0] + 1, dtype=np.int64)
        voff[0] = offsets[0]
        np.cumsum(ln, out=voff[1:])
        voff[1:] += offsets[0]
        if voff[-1] != offsets[-1]:
            ids = batch.column(self.inner.id_col).to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            row = order[
                np.searchsorted(
                    ids[order], t.column(self.inner.id_col).to_numpy(zero_copy_only=False)
                )
            ]
            starts = offsets[row] + t.column("offset").to_numpy(zero_copy_only=False)
            total = int(ln.sum())
            gather = np.repeat(starts, ln) + (
                np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(ln) - ln, ln)
            )
            data = np.ascontiguousarray(data[gather])
            voff = np.concatenate(([0], np.cumsum(ln)))
        payload = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            ln.shape[0],
            [None, pa.py_buffer(voff), pa.py_buffer(data)],
        )
        return t.append_column("payload", payload)


def write_unique_chunks(
    ds,
    out_dir: str,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_bits: int = 4,
) -> dict:
    """Chunk + dedup-by-digest + write the content-addressed store.

    The store shuffle is keyed on digest (groupby -> first payload per
    digest); output is hash-partitioned by the digest's top `prefix_bits`
    bits into separate directories (resumable, no giant single file).
    Recipes (doc_id, chunk_idx, digest) are written alongside.
    Returns summary counts."""
    import os

    from ray.data.aggregate import Count, Sum

    from plakar_ray.stages.chunk import default_pool_size

    chunks = ds.map_batches(
        _ChunkWithBytes,
        fn_constructor_kwargs=dict(algo=algo, opts=opts, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool_size(),
    ).materialize()

    totals = chunks.aggregate(Count(), Sum("length"))
    total_chunks = int(totals["count()"])
    total_bytes = int(totals["sum(length)"] or 0)

    # Recipes: the per-document chunk sequence (no payloads).
    recipes = chunks.select_columns([id_col, "chunk_idx", "offset", "length", "digest"])
    os.makedirs(os.path.join(out_dir, "recipes"), exist_ok=True)
    recipes.write_parquet(os.path.join(out_dir, "recipes"))

    # Dedup by digest: hash-partition exchange (buckets co-located per
    # partition, no global sort), then a vectorized first-per-digest inside
    # each partition block.
    try:
        import ray

        n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    except Exception:
        n_part = 8
    sel = chunks.select_columns(["digest", "length", "payload"])

    def first_per_digest_block(batch: pa.Table) -> pa.Table:
        g = batch.group_by("digest").aggregate(
            [("length", "first"), ("payload", "first")]
        )
        digs = g.column("digest")
        if isinstance(digs, pa.ChunkedArray):
            digs = digs.combine_chunks()
        if len(g):
            w = digs.type.byte_width
            raw = np.frombuffer(digs.buffers()[1], dtype=np.uint8)
            first = raw[digs.offset * w : (digs.offset + len(digs)) * w : w]
        else:
            first = np.empty(0, dtype=np.uint8)
        buckets = (first >> (8 - prefix_bits)).astype(np.int32)
        return pa.table(
            {
                "digest": digs,
                "length": g.column("length_first"),
                "payload": g.column("payload_first"),
                "bucket": pa.array(buckets, type=pa.int32()),
            }
        )

    # Packed exchange (functions/exchange.py): one row per chunk WITH its
    # payload — blobs co-locate digests without a row-granular shuffle.
    from plakar_ray.functions.exchange import packed_exchange

    uniq = packed_exchange(
        sel, ["digest"], n_part, first_per_digest_block,
        sel.schema().base_schema.empty_table(),
    ).materialize()

    # Partitioned sink: one hive directory per digest-prefix bucket, written
    # by Ray's parallel writer — never concatenated on the driver.
    uniq.write_parquet(os.path.join(out_dir, "store"), partition_cols=["bucket"])

    import json

    with open(os.path.join(out_dir, "store_meta.json"), "w") as f:
        json.dump({"prefix_bits": prefix_bits}, f)

    u = uniq.aggregate(Count(), Sum("length"))
    n_buckets = 1 << prefix_bits
    return {
        "total_chunks": total_chunks,
        "unique_chunks": int(u["count()"]),
        "total_bytes": total_bytes,
        "unique_bytes": int(u["sum(length)"] or 0),
        "buckets": n_buckets,
    }


def ingest_delta(
    ds,
    out_dir: str,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental ingest: dedup a NEW snapshot against an EXISTING store
    and append only the chunks the store has never seen — the continuous-
    crawl shape (yesterday's corpus is stored; today's recrawl mostly
    repeats it).

    Scale design: the store's digest set is never broadcast or driver-
    materialized. New chunks are exchanged keyed on their digest-PREFIX
    bucket — the same partitioning the store is laid out in — so each
    reduce partition anti-joins its chunks against ONLY the store files
    of its own buckets (a co-partitioned semi-join; at 10^12 stored
    chunks a partition reads its buckets' digest column, nothing else).
    Appends are new parquet files in existing bucket directories
    (resumable, no rewrite); recipes for the new snapshot are appended
    alongside so restore_document covers both snapshots.

    Returns occurrence- and store-level accounting:
    ingested_chunks/bytes (all new-snapshot chunks), dup_vs_store_*
    (occurrences whose digest the store already had BEFORE this ingest;
    intra-snapshot repeats of a new digest count as new occurrences),
    new_unique_* (distinct digests appended)."""
    import glob
    import json
    import os

    from ray.data.aggregate import Count, Sum

    from plakar_ray.functions.exchange import packed_exchange
    from plakar_ray.stages.chunk import default_pool_size

    with open(os.path.join(out_dir, "store_meta.json")) as f:
        prefix_bits = int(json.load(f)["prefix_bits"])

    chunks = ds.map_batches(
        _ChunkWithBytes,
        fn_constructor_kwargs=dict(algo=algo, opts=opts, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool_size(),
    ).materialize()

    totals = chunks.aggregate(Count(), Sum("length"))
    ingested_chunks = int(totals["count()"])
    ingested_bytes = int(totals["sum(length)"] or 0)

    chunks.select_columns(
        [id_col, "chunk_idx", "offset", "length", "digest"]
    ).write_parquet(os.path.join(out_dir, "recipes"))

    try:
        import ray

        n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    except Exception:
        n_part = 8
    sel = chunks.select_columns(["digest", "length", "payload"])

    def _digest_s32(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(col.to_numpy(zero_copy_only=False), dtype="S32")

    def _bucket_of(dig: np.ndarray) -> np.ndarray:
        first = dig.view(np.uint8).reshape(dig.size, 32)[:, 0] if dig.size else np.empty(0, np.uint8)
        return (first >> (8 - prefix_bits)).astype(np.int64)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sbucket",
            pa.array(_bucket_of(_digest_s32(batch.column("digest"))), type=pa.int64()),
        )

    keyed = sel.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema(
        [
            ("digest", sel.schema().base_schema.field("digest").type),
            ("length", pa.int64()),
            ("payload", pa.large_binary()),
            ("bucket", pa.int32()),
            ("occ", pa.int64()),
            ("occ_bytes", pa.int64()),
        ]
    )

    def delta_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        dig = _digest_s32(batch.column("digest"))
        bkt = _bucket_of(dig)
        stored = []
        for b in np.unique(bkt):
            paths = glob.glob(f"{out_dir}/store/bucket={int(b)}/*.parquet")
            if not paths:
                continue
            import pyarrow.dataset as pads

            stored.append(
                _digest_s32(pads.dataset(paths).to_table(columns=["digest"]).column("digest"))
            )
        known = np.concatenate(stored) if stored else np.empty(0, dtype="S32")
        fresh = ~np.isin(dig, known)
        if not fresh.any():
            return out_schema.empty_table()
        t = batch.filter(pa.array(fresh))
        fdig, fbkt = dig[fresh], bkt[fresh]
        lens = t.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(fdig, kind="stable")
        sd = fdig[order]
        first = np.empty(sd.size, dtype=bool)
        first[0] = True
        first[1:] = sd[1:] != sd[:-1]
        gstart = np.flatnonzero(first)
        gsize = np.diff(np.append(gstart, sd.size))
        rep = order[gstart]  # first occurrence row per distinct new digest
        occ_bytes = np.add.reduceat(lens[order], gstart)
        u = t.take(pa.array(rep))
        return pa.table(
            {
                "digest": u.column("digest"),
                "length": u.column("length").cast(pa.int64()),
                "payload": u.column("payload").cast(pa.large_binary()),
                "bucket": pa.array(fbkt[rep].astype(np.int32), type=pa.int32()),
                "occ": pa.array(gsize.astype(np.int64), type=pa.int64()),
                "occ_bytes": pa.array(occ_bytes.astype(np.int64), type=pa.int64()),
            }
        )

    keyed_empty = pa.schema(
        [
            ("digest", sel.schema().base_schema.field("digest").type),
            ("length", sel.schema().base_schema.field("length").type),
            ("payload", sel.schema().base_schema.field("payload").type),
            ("sbucket", pa.int64()),
        ]
    ).empty_table()
    new_unique = packed_exchange(
        keyed, ["sbucket"], n_part, delta_partition, keyed_empty
    ).materialize()

    agg = new_unique.aggregate(
        Count(), Sum("length"), Sum("occ"), Sum("occ_bytes")
    )
    new_unique_chunks = int(agg["count()"])
    new_unique_bytes = int(agg["sum(length)"] or 0)
    new_occ = int(agg["sum(occ)"] or 0)
    new_occ_bytes = int(agg["sum(occ_bytes)"] or 0)

    if new_unique_chunks:
        new_unique.select_columns(
            ["digest", "length", "payload", "bucket"]
        ).write_parquet(os.path.join(out_dir, "store"), partition_cols=["bucket"])

    return {
        "ingested_chunks": ingested_chunks,
        "ingested_bytes": ingested_bytes,
        "dup_vs_store_chunks": ingested_chunks - new_occ,
        "dup_vs_store_bytes": ingested_bytes - new_occ_bytes,
        "new_unique_chunks": new_unique_chunks,
        "new_unique_bytes": new_unique_bytes,
    }


def store_paths_for_digests(out_dir: str, digests: list[bytes]) -> list[str]:
    """Only the store files whose digest-prefix bucket can contain one of
    `digests` — the pruning the bucket partitioning exists for. Falls back
    to every bucket when the store predates store_meta.json."""
    import glob
    import json
    import os

    meta = os.path.join(out_dir, "store_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            prefix_bits = int(json.load(f)["prefix_bits"])
        buckets = sorted({d[0] >> (8 - prefix_bits) for d in digests})
        paths = [
            p
            for b in buckets
            for p in glob.glob(f"{out_dir}/store/bucket={b}/*.parquet")
        ]
        return paths
    return glob.glob(f"{out_dir}/store/bucket=*/*.parquet")


def restore_document(out_dir: str, doc_id: int, id_col: str = "doc_id") -> bytes:
    """Reassemble one document from recipes + store (byte-exact Copy).

    Reads ONLY the digest-prefix buckets the recipe's digests map to
    (store_paths_for_digests) and pushes a digest membership filter into
    the parquet scan — never the whole store."""
    import glob

    import pyarrow.dataset as pads

    recipes = pads.dataset(glob.glob(f"{out_dir}/recipes/*.parquet"))
    rec = recipes.to_table(filter=pads.field(id_col) == doc_id).sort_by("chunk_idx")
    digests = rec.column("digest").to_pylist()
    if not digests:
        return b""
    paths = store_paths_for_digests(out_dir, digests)
    store = pads.dataset(paths)
    tbl = store.to_table(
        columns=["digest", "payload"],
        filter=pads.field("digest").isin(list(set(digests))),
    )
    payloads = dict(
        zip(tbl.column("digest").to_pylist(), tbl.column("payload").to_pylist())
    )
    return b"".join(payloads[d] for d in digests)
