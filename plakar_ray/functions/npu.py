"""Small shared NumPy helpers for broadcast-side row selection.

Used by the clean transforms (pipelines/paragraphs.py,
pipelines/dedup.py substring clean): a removal table sorted by doc id is
broadcast once, and every rebuild task gathers just its own docs' rows.
"""

from __future__ import annotations

import numpy as np


def concat_ranges(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Concatenate the index ranges [lo_i, hi_i) into one index vector —
    vectorized equivalent of np.concatenate([arange(l, h) ...])."""
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    return np.repeat(lo, counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(counts) - counts, counts)
    )


def rows_for_sorted_keys(r_keys: np.ndarray, want: np.ndarray) -> np.ndarray:
    """Indices into the key-sorted array `r_keys` of every row whose key
    appears in `want` (sorted, unique) — two searchsorteds + range concat."""
    lo = np.searchsorted(r_keys, want, "left")
    hi = np.searchsorted(r_keys, want, "right")
    return concat_ranges(lo, hi)


def put_sorted_by_key(ds, key_col: str, cols: list[str]):
    """Pull a small materialized Dataset to the driver (bounded by the
    caller's broadcast threshold), sort its rows by `key_col`, and
    ray.put the requested columns as int64 arrays (key first). Returns
    the ObjectRef; rebuild tasks pair it with `batch_rows_for_keys`."""
    import pyarrow as pa
    import ray

    tables = [
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)
    ]
    if tables:
        merged = pa.concat_tables(tables, promote_options="default")
        arrays = [
            merged.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in [key_col] + [c for c in cols if c != key_col]
        ]
        order = np.lexsort(tuple(reversed(arrays)))
        arrays = [a[order] for a in arrays]
    else:
        arrays = [np.empty(0, np.int64) for _ in range(1 + len(cols))]
    return ray.put(tuple(arrays))


def batch_rows_for_keys(ref, want: np.ndarray) -> tuple[np.ndarray, ...]:
    """Rows of a `put_sorted_by_key` broadcast belonging to the (sorted,
    unique) keys `want` — zero-copy object-store read + range gather."""
    import ray

    arrays = ray.get(ref)
    sel = rows_for_sorted_keys(arrays[0], want)
    return tuple(a[sel] for a in arrays)
