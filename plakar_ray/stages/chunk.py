"""Chunk-explode stage: document rows -> chunk rows.

The Ray-Data-native equivalent of the reference's Split loop
(chunkers.go:214-232) + per-chunk sha256 digesting (cmd/cdc/stats.go:141):
a callable CLASS for `ds.map_batches(ChunkerStage(...), batch_format="pyarrow",
concurrency=N)` so gear tables / masks are derived once per actor in
__init__ (amortizing the reference's per-chunker Setup, chunkers.go:105-107),
not once per batch.

One input row (a document) becomes many output rows (its chunks). Chunk
identity is the sha256 content digest; digest64 is its first 8 bytes as a
little-endian uint64 for cheap downstream set operations (MinHash shingles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import get_algorithm

def default_pool_size():
    """Actor-pool sizing that leaves CPU headroom for upstream read/shuffle
    tasks: an actor pool sized to the whole cluster starves the stages that
    feed it (observed deadlock on an N-actor pool + read task on N CPUs).
    Autoscaling (1, cpus-1) lets the streaming executor balance stages."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return (1, max(1, cpus - 1))


CHUNK_SCHEMA_FIELDS = [
    ("chunk_idx", pa.int32()),
    ("offset", pa.int64()),
    ("length", pa.int32()),
    ("digest", pa.binary(32)),
    ("digest64", pa.uint64()),
]


class ChunkerStage:
    """pages/documents batch -> chunk table batch.

    Output columns: <id column copied>, chunk_idx, offset, length, digest,
    digest64. The id column keeps its input name and type.
    """

    def __init__(
        self,
        algo: str,
        opts: ChunkerOpts | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        with_digest: bool = True,
    ):
        self.spec = get_algorithm(algo)
        self.opts = self.spec.resolve_opts(opts)
        self.cfg = self.spec.setup(self.opts)  # gear/masks once per actor
        self.id_col = id_col
        self.text_col = text_col
        self.with_digest = with_digest

    def chunk_doc(self, doc: np.ndarray) -> np.ndarray:
        return self.spec.boundaries(self.cfg, self.opts, doc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.text_col))
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()

        n = len(batch)
        multi = self.spec.boundaries_multi
        if multi is not None and n > 1:
            # Batched frontier kernel: warm-up waves amortized across the
            # whole batch (kernels.boundaries_*_multi); cutpoint-identical
            # to the per-doc path.
            per_doc = multi(self.cfg, self.opts, data, offsets)
        else:
            per_doc = [
                self.chunk_doc(data[offsets[i] : offsets[i + 1]])
                for i in range(n)
            ]
        counts = np.fromiter((p.shape[0] for p in per_doc), dtype=np.int64, count=n)
        total = int(counts.sum())
        if total == 0:
            cols = {self.id_col: ids.take(pa.array([], type=pa.int64()))}
            cols.update(
                {
                    "chunk_idx": pa.array([], type=pa.int32()),
                    "offset": pa.array([], type=pa.int64()),
                    "length": pa.array([], type=pa.int32()),
                }
            )
            if self.with_digest:
                cols["digest"] = pa.array([], type=pa.binary(32))
                cols["digest64"] = pa.array([], type=pa.uint64())
            return pa.table(cols)

        # Chunks tile each document's bytes exactly, and documents are
        # contiguous in the batch stream — so the global cumsum of chunk
        # lengths IS each chunk's position in data[offsets[0]:offsets[-1]],
        # and within-doc offsets fall out by subtracting the owning doc's
        # stream base. No per-doc (let alone per-chunk) Python.
        all_len = np.concatenate(per_doc) if n > 1 else per_doc[0]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        goff = np.cumsum(counts) - counts
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(goff, counts)
        ends_g = np.cumsum(all_len)
        starts_g = ends_g - all_len
        within = starts_g - (offsets[doc_of] - offsets[0])

        cols = {
            self.id_col: ids.take(pa.array(doc_of, type=pa.int64())),
            "chunk_idx": pa.array(chunk_idx.astype(np.int32), type=pa.int32()),
            "offset": pa.array(within, type=pa.int64()),
            "length": pa.array(all_len.astype(np.int32), type=pa.int32()),
        }
        if self.with_digest:
            stream = data[offsets[0] : offsets[-1]]
            d32 = self._digest_segments(all_len, stream)
            cols["digest"] = pa.Array.from_buffers(
                pa.binary(32), total, [None, pa.py_buffer(d32)]
            )
            cols["digest64"] = pa.array(
                np.ascontiguousarray(d32[:, :8]).view(np.uint64).ravel(),
                type=pa.uint64(),
            )
        return pa.table(cols)

    @staticmethod
    def _digest_segments(lengths: np.ndarray, stream: np.ndarray) -> np.ndarray:
        """(k, 32) sha256 digests of the chunk segments tiling `stream` —
        native OpenSSL kernel (sha.c) when available, hashlib loop
        otherwise (identical bytes)."""
        from plakar_ray import _native

        sha_lib = _native.load_sha()
        if sha_lib is not None:
            return _native.sha256_segments_full(sha_lib, lengths, stream)
        out = np.empty((lengths.shape[0], 32), dtype=np.uint8)
        mv = memoryview(stream)
        ends = np.cumsum(lengths)
        starts = ends - lengths
        for j, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
            out[j] = np.frombuffer(hashlib.sha256(mv[a:b]).digest(), dtype=np.uint8)
        return out


from functools import lru_cache


@lru_cache(maxsize=64)
def _cached_stage(algo: str, opts: ChunkerOpts | None, id_col: str, text_col: str,
                  with_digest: bool) -> "ChunkerStage":
    return ChunkerStage(algo, opts, id_col=id_col, text_col=text_col, with_digest=with_digest)


def chunk_dataset(
    ds,
    algo: str,
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = None,
    batch_size: int | None = None,
    with_digest: bool = True,
    use_actors: bool = False,
):
    """documents Dataset -> chunk-table Dataset (the §3.4 explode step).

    Two execution modes:
    * stateless tasks (default): stage objects are built once per worker
      PROCESS via an lru_cache — setup cost amortizes exactly like an actor's
      __init__ but reuses Ray's warm worker pool (no actor cold-start).
      Correct for all unkeyed algorithms whose setup is cheap and
      deterministic.
    * actor pool (use_actors=True): for keyed gear tables or other expensive
      derived state that should be built once per actor and never per task
      argument (e.g. blake3 key derivation).
    """
    if use_actors:
        if concurrency is None:
            concurrency = default_pool_size()
        return ds.map_batches(
            ChunkerStage,
            fn_constructor_kwargs=dict(
                algo=algo, opts=opts, id_col=id_col, text_col=text_col,
                with_digest=with_digest,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def apply(batch):
        stage = _cached_stage(algo, opts, id_col, text_col, with_digest)
        return stage(batch)

    return ds.map_batches(
        apply,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
