"""Broadcast (map-side) joins: the scale pattern for small-side lookups.

Ray Data has no relational join primitive; at 100 TB the correct pattern for
a small dimension side is `ray.put` once + per-batch dictionary-encode inside
map_batches — never an all-to-all shuffle. The big side streams through
untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def broadcast_join(
    ds,
    small: pa.Table,
    on: str,
    small_on: str | None = None,
    columns: list[str] | None = None,
    how: str = "inner",
):
    """Join a Dataset against a small in-memory table.

    The small table is broadcast via ray.put; every batch maps its key column
    through a hash index and takes the matching small-side rows (inner drops
    non-matching rows; left keeps them with nulls)."""
    import ray

    small_on = small_on or on
    cols = columns or [c for c in small.column_names if c != small_on]
    index = {k: i for i, k in enumerate(small.column(small_on).to_pylist())}
    small_ref = ray.put((index, small.select(cols)))

    def apply(batch: pa.Table) -> pa.Table:
        idx, dim = ray.get(small_ref)
        keys = batch.column(on).to_pylist()
        rows = [idx.get(k, -1) for k in keys]
        rows_arr = np.asarray(rows, dtype=np.int64)
        if how == "inner":
            keep = rows_arr >= 0
            batch = batch.filter(pa.array(keep))
            rows_arr = rows_arr[keep]
            take = pa.array(rows_arr, type=pa.int64())
        else:
            take = pa.array(
                [r if r >= 0 else None for r in rows_arr.tolist()], type=pa.int64()
            )
        out = batch
        for c in cols:
            out = out.append_column(c, dim.column(c).take(take))
        return out

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
