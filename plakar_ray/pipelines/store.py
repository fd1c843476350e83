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
        # Rebuild payload slices from the source batch (zero-copy views).
        data, offsets = byte_views(batch.column(self.inner.text_col))
        ids = batch.column(self.inner.id_col).to_numpy(zero_copy_only=False)
        row_of = {int(v): i for i, v in enumerate(ids)}
        payloads = []
        for did, off, ln in zip(
            t.column(self.inner.id_col).to_pylist(),
            t.column("offset").to_pylist(),
            t.column("length").to_pylist(),
        ):
            base = offsets[row_of[int(did)]]
            payloads.append(data[base + off : base + off + ln].tobytes())
        return t.append_column("payload", pa.array(payloads, type=pa.binary()))


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
    from ray.data.context import ShuffleStrategy

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
    chunks.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        import ray

        n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    except Exception:
        n_part = 8
    parts = chunks.select_columns(["digest", "length", "payload"]).repartition(
        n_part, keys=["digest"], sort=False
    )

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

    uniq = parts.map_batches(
        first_per_digest_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # Partitioned sink: one hive directory per digest-prefix bucket, written
    # by Ray's parallel writer — never concatenated on the driver.
    uniq.write_parquet(os.path.join(out_dir, "store"), partition_cols=["bucket"])

    u = uniq.aggregate(Count(), Sum("length"))
    n_buckets = 1 << prefix_bits
    return {
        "total_chunks": total_chunks,
        "unique_chunks": int(u["count()"]),
        "total_bytes": total_bytes,
        "unique_bytes": int(u["sum(length)"] or 0),
        "buckets": n_buckets,
    }


def restore_document(out_dir: str, doc_id: int, id_col: str = "doc_id") -> bytes:
    """Reassemble one document from recipes + store (byte-exact Copy)."""
    import glob

    import pyarrow.dataset as pads

    recipes = pads.dataset(glob.glob(f"{out_dir}/recipes/*.parquet"))
    rec = recipes.to_table(filter=pads.field(id_col) == doc_id).sort_by("chunk_idx")
    store = pads.dataset(glob.glob(f"{out_dir}/store/bucket=*/*.parquet"))
    digests = rec.column("digest").to_pylist()
    need = set(digests)
    payloads: dict[bytes, bytes] = {}
    for batch in store.to_batches(columns=["digest", "payload"]):
        for d, p in zip(batch.column("digest").to_pylist(), batch.column("payload").to_pylist()):
            if d in need:
                payloads[d] = p
    return b"".join(payloads[d] for d in digests)
