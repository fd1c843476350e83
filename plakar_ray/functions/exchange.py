"""Packed keyed exchange: block-granular shuffle instead of row-granular.

Ray Data's hash-shuffle repartition hashes and routes every ROW: measured
on this host it costs ~3 us/row of aggregator CPU, so a 16M-row gram
exchange burns ~50 s of CPU partitioning 390 MB while the real kernels
need ~7 s (stats in BENCH/substring_scale_r4.json's plan). At 10^12-doc
scale that per-row constant IS the exchange.

This module keeps the exchange's semantics (all rows of one key land in
exactly one reduce batch) while shuffling ~n_blocks x n_buckets rows
total, independent of corpus row count:

  map side:   bucket = splitmix64(key columns) % n_buckets (vectorized
              numpy), one stable argsort + ONE table gather per block,
              then each bucket's zero-copy slice is serialized as a
              single Arrow IPC blob -> rows (bucket:int32, blob:binary)
  exchange:   repartition(n_part, keys=["bucket"]) moves only the blobs
              (n_buckets = PACK_FACTOR x n_part so partitions average
              PACK_FACTOR buckets and balls-in-bins skew stays small)
  reduce:     each partition IPC-reads its blobs back into one Arrow
              table (buffers reference the blob memory, no row decode)
              and runs the caller's per-partition reduce function

Key columns may be integer-valued (ids, band hashes, gram hashes) or
string/binary (hex digests) — binary keys are folded to u64 with a
vectorized FNV-1a over their fixed-width padded bytes. Multi-column keys
are mixed per-column through the same finalizer. Distinct keys may share
a bucket (that only widens a reduce group, never splits one), so exact
key equality implies bucket equality — the contract a keyed exchange
needs.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

PACK_FACTOR = 4

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

PACKED_SCHEMA = pa.schema(
    [("bucket", pa.int32()), ("blob", pa.large_binary())]
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public constant avalanche), vectorized."""
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _column_u64(col) -> np.ndarray:
    """Key column -> one u64 per row. Ints pass through; string/binary
    keys hash their ACTUAL bytes (length-aware vectorized FNV-1a), so a
    key's value — and therefore its bucket — is identical no matter which
    block it appears in or what other keys share the block. (An earlier
    version folded numpy S-dtype padded bytes, whose width is the BLOCK
    maximum — the same key could land in different buckets across blocks,
    silently splitting its reduce group for variable-width key columns.)"""
    t = col.type
    if pa.types.is_integer(t):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    if pa.types.is_fixed_size_binary(t):
        w = t.byte_width
        raw = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        b = raw[col.offset * w : (col.offset + len(col)) * w].reshape(len(col), w)
        h = np.full(len(col), _FNV_OFF, dtype=np.uint64)
        for j in range(w):
            h = (h ^ b[:, j]) * _FNV_PRIME
        return h
    from plakar_ray.functions.arrowbytes import byte_views
    from plakar_ray.functions.strhash import fnv1a64_slices

    data, offsets = byte_views(col)
    return fnv1a64_slices(offsets[:-1], offsets[1:], data)


def bucket_ids(batch: pa.Table, key_cols: list[str], n_buckets: int) -> np.ndarray:
    """Per-row bucket in [0, n_buckets) from the key columns."""
    with np.errstate(over="ignore"):
        h = np.full(batch.num_rows, _SPLITMIX_GAMMA, dtype=np.uint64)
        for c in key_cols:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = _mix64(h + _column_u64(col) * _SPLITMIX_GAMMA)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def pack_batch(batch: pa.Table, key_cols: list[str], n_buckets: int) -> pa.Table:
    """One (bucket, blob) row per non-empty bucket of this block."""
    if batch.num_rows == 0:
        return PACKED_SCHEMA.empty_table()
    b = bucket_ids(batch, key_cols, n_buckets)
    order = np.argsort(b, kind="stable")
    sb = b[order]
    gathered = batch.take(pa.array(order))
    # bucket boundaries in the sorted order
    starts = np.searchsorted(sb, np.arange(n_buckets, dtype=np.int64))
    ends = np.append(starts[1:], sb.size)
    buckets, blobs = [], []
    for p in range(n_buckets):
        s, e = int(starts[p]), int(ends[p])
        if s == e:
            continue
        sl = gathered.slice(s, e - s)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, sl.schema) as w:
            w.write_table(sl)
        buckets.append(p)
        blobs.append(memoryview(sink.getvalue()))
    return pa.table(
        {
            "bucket": pa.array(buckets, type=pa.int32()),
            "blob": pa.array(blobs, type=pa.large_binary()),
        }
    )


def unpack_batch(batch: pa.Table, empty: pa.Table) -> pa.Table:
    """IPC-read every blob of one reduce partition into one Arrow table."""
    col = batch.column("blob") if batch.num_rows else None
    tables = []
    if col is not None:
        for chunk in col.chunks:
            for i in range(len(chunk)):
                with pa.ipc.open_stream(chunk[i].as_buffer()) as r:
                    tables.append(r.read_all())
    if not tables:
        return empty
    return pa.concat_tables(tables, promote_options="default")


def packed_exchange(
    ds,
    key_cols: list[str],
    n_part: int,
    reduce_fn: Callable[[pa.Table], pa.Table],
    empty: pa.Table,
    pack_factor: int = PACK_FACTOR,
):
    """ds -> pack by key bucket -> blob shuffle -> per-partition reduce.

    `reduce_fn` sees one Arrow table holding EVERY row of each of its
    buckets' keys (the same contract as `repartition(keys=...)` +
    `map_batches(batch_size=None)`); `empty` is the zero-row input table
    it receives for partitions that got no blobs."""
    from ray.data.context import ShuffleStrategy

    n_buckets = max(1, int(pack_factor)) * int(n_part)

    packed = ds.map_batches(
        lambda b: pack_batch(b, key_cols, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    packed.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    parts = packed.repartition(int(n_part), keys=["bucket"], sort=False)
    return parts.map_batches(
        lambda b: reduce_fn(unpack_batch(b, empty)),
        batch_size=None,  # batch == block == one complete hash partition
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
