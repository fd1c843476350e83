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

    import pyarrow.parquet as pq

    chunks = ds.map_batches(
        _ChunkWithBytes,
        fn_constructor_kwargs=dict(algo=algo, opts=opts, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    ).materialize()

    # Recipes: the per-document chunk sequence (no payloads).
    recipes = chunks.select_columns([id_col, "chunk_idx", "offset", "length", "digest"])
    os.makedirs(os.path.join(out_dir, "recipes"), exist_ok=True)
    recipes.write_parquet(os.path.join(out_dir, "recipes"))

    def first_per_digest(group: pa.Table) -> pa.Table:
        return group.select(["digest", "length", "payload"]).slice(0, 1)

    uniq = chunks.groupby("digest").map_groups(first_per_digest, batch_format="pyarrow")

    n_buckets = 1 << prefix_bits

    def bucket_of(batch: pa.Table) -> pa.Table:
        digs = batch.column("digest").to_pylist()
        buckets = [d[0] >> (8 - prefix_bits) for d in digs]
        return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))

    bucketed = uniq.map_batches(bucket_of, batch_format="pyarrow").materialize()
    total_unique = 0
    for b in range(n_buckets):
        part = bucketed.filter(expr=f"bucket == {b}")
        tbl = pa.concat_tables(
            list(part.iter_batches(batch_format="pyarrow"))
            or [pa.table({"digest": pa.array([], type=pa.binary(32)),
                          "length": pa.array([], type=pa.int32()),
                          "payload": pa.array([], type=pa.binary()),
                          "bucket": pa.array([], type=pa.int32())})]
        )
        d = os.path.join(out_dir, "store", f"bucket={b:02d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl.drop_columns(["bucket"]), os.path.join(d, "data.parquet"))
        total_unique += tbl.num_rows
    return {"unique_chunks": total_unique, "buckets": n_buckets}


def restore_document(out_dir: str, doc_id: int, id_col: str = "doc_id") -> bytes:
    """Reassemble one document from recipes + store (byte-exact Copy)."""
    import glob

    import pyarrow.dataset as pads

    recipes = pads.dataset(glob.glob(f"{out_dir}/recipes/*.parquet"))
    rec = recipes.to_table(filter=pads.field(id_col) == doc_id).sort_by("chunk_idx")
    store = pads.dataset(glob.glob(f"{out_dir}/store/bucket=*/data.parquet"))
    digests = rec.column("digest").to_pylist()
    need = set(digests)
    payloads: dict[bytes, bytes] = {}
    for batch in store.to_batches(columns=["digest", "payload"]):
        for d, p in zip(batch.column("digest").to_pylist(), batch.column("payload").to_pylist()):
            if d in need:
                payloads[d] = p
    return b"".join(payloads[d] for d in digests)
