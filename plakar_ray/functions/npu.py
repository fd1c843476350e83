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
