"""Zero-copy byte views over Arrow string/binary columns.

A pyarrow StringArray/BinaryArray already stores row payloads contiguously as
UTF-8/raw bytes; these helpers expose each row as a NumPy uint8 slice of that
buffer without per-row copies — the batch-kernel equivalent of the reference's
chunk-aliases-scan-buffer design (chunkers.go:134-141).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def byte_views(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (data, offsets) such that row i's bytes are
    data[offsets[i]:offsets[i+1]]. Nulls become empty slices."""
    if isinstance(arr, pa.ChunkedArray):
        # combine_chunks COPIES even when there is only one chunk — alias
        # the single chunk instead (the common map_batches case).
        if arr.num_chunks == 1:
            arr = arr.chunk(0)
        else:
            arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    else:
        raise TypeError(f"expected string/binary column, got {t}")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ].astype(np.int64, copy=False)
    data_buf = buffers[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    return data, offsets


def row_bytes(data: np.ndarray, offsets: np.ndarray, i: int) -> np.ndarray:
    return data[offsets[i] : offsets[i + 1]]
