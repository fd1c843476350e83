"""Vectorized string hashing over Arrow token lists.

FNV-1a is sequential over a string's bytes, but independent across strings:
iterating over byte POSITIONS (bounded by the longest token) with one
vector gather + xor/mul per position hashes every token of a batch in
O(max_len) numpy passes instead of a per-byte Python loop. Produces
bit-identical values to the scalar FNV-1a loops it replaces
(stages/simhash.py, stages/minhash.py word-3-gram shingles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_FNV_OFF = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)


def splitmix64(z: np.ndarray) -> np.ndarray:
    z = z + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def fnv1a64_slices(starts: np.ndarray, ends: np.ndarray, data: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of data[starts[i]:ends[i]] for every i, vectorized across
    slices. `data` is a uint8 array; returns uint64 hashes."""
    n = starts.shape[0]
    h = np.full(n, _FNV_OFF, dtype=np.uint64)
    if n == 0:
        return h
    lens = ends - starts
    max_len = int(lens.max())
    # Process longest-first so the active set is a shrinking prefix: one
    # argsort buys O(1) "which strings still have bytes" per position.
    order = np.argsort(-lens, kind="stable")
    s_sorted = starts[order].astype(np.int64)
    l_sorted = lens[order]
    h_sorted = h[order]
    # alive count at byte position j = number of strings with len > j
    alive_at = np.searchsorted(-l_sorted, -np.arange(1, max_len + 1), side="right")
    for j in range(max_len):
        k = alive_at[j]
        if k == 0:
            break
        b = data[s_sorted[:k] + j].astype(np.uint64)
        h_sorted[:k] = (h_sorted[:k] ^ b) * _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h_sorted
    return out


def fnv1a64_segments(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of each contiguous segment of `data` (segments tile the
    byte stream exactly, the shape CDC chunk lengths have over a document
    stream). Native C fast path (~4 GB/s); the vectorized positional scan
    is the fallback and produces identical values."""
    from plakar_ray import _native

    lib = _native.load()
    if lib is not None:
        return _native.fnv_segments(lib, lengths, data)
    ends = np.cumsum(lengths.astype(np.int64, copy=False))
    starts = ends - lengths
    return fnv1a64_slices(starts, ends, data)


def wfnv64_segments(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Word-wise FNV-1a variant per contiguous segment: one xor-multiply per
    8-byte little-endian word, zero-padded tail word, then a final
    (h ^ len) * PRIME mix so padded tails can't collide with shorter
    segments. ~6 GB/s in the native kernel (the byte-serial hashes are
    latency-chain-bound at <1 GB/s) — the default CDC chunk-shingle family
    for the near-dup path. Repo-defined, not standard FNV-1a."""
    from plakar_ray import _native

    lib = _native.load()
    if lib is not None:
        return _native.wfnv_segments(lib, lengths, data)
    return _wfnv64_segments_np(lengths, data)


def _wfnv64_segments_np(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Bit-identical vectorized fallback for wfnv64_segments: iterate over
    WORD positions (longest-first shrinking active prefix, as in
    fnv1a64_slices), assembling each segment's j-th little-endian word from
    up to 8 byte gathers."""
    n = lengths.shape[0]
    h = np.full(n, _FNV_OFF, dtype=np.uint64)
    if n == 0:
        return h
    lengths = lengths.astype(np.int64, copy=False)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    nwords = (lengths + 7) >> 3
    max_w = int(nwords.max())
    order = np.argsort(-nwords, kind="stable")
    s_sorted = starts[order]
    l_sorted = lengths[order]
    nw_sorted = nwords[order]
    h_sorted = h[order]
    alive_at = np.searchsorted(-nw_sorted, -np.arange(1, max_w + 1), side="right")
    for j in range(max_w):
        k = alive_at[j]
        if k == 0:
            break
        base = s_sorted[:k] + 8 * j
        rem = l_sorted[:k] - 8 * j  # bytes remaining in this word, >= 1
        w = np.zeros(k, dtype=np.uint64)
        for b in range(8):
            m = rem > b
            if not m.any():
                break
            w[m] |= data[base[m] + b].astype(np.uint64) << _U64(8 * b)
        h_sorted[:k] = (h_sorted[:k] ^ w) * _FNV_PRIME
    h_sorted = (h_sorted ^ l_sorted.astype(np.uint64)) * _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h_sorted
    return out


def sha256_segments(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """First-8-bytes-of-sha256 of each contiguous segment of `data`.

    `lengths` tile `data` exactly (sum(lengths) == data.size) — the shape
    CDC chunk lengths naturally have over a document byte stream. hashlib's
    C sha256 runs >1 GB/s at CDC chunk sizes (~8 KB mean), so the Python
    loop here is NOT the hot part — it is one C call per chunk, ~128 calls
    per MB. (A fully-vectorized multiply-gather polynomial hash was tried
    and measured 35x SLOWER: 24 bytes of memory traffic per input byte.)
    Same hash family the per-doc signature path always used, so recall
    gates and md5 evidence twins are unaffected."""
    n = lengths.shape[0]
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    from plakar_ray import _native

    sha_lib = _native.load_sha()
    if sha_lib is not None:
        d32 = _native.sha256_segments_full(sha_lib, lengths, data)
        return np.ascontiguousarray(d32[:, :8]).view(np.uint64).ravel()
    import hashlib

    ends = np.cumsum(lengths.astype(np.int64, copy=False))
    starts = ends - lengths
    mv = memoryview(data)
    sha256 = hashlib.sha256
    for j, (s0, e0) in enumerate(zip(starts.tolist(), ends.tolist())):
        out[j] = int.from_bytes(sha256(mv[s0:e0]).digest()[:8], "little")
    return out


def arrow_token_lists(lists) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decompose a list<string> array into (tok_starts, tok_ends, data,
    doc_offsets) numpy views — zero-copy into the Arrow buffers."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    doc_off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    bufs = flat.buffers()
    off_buf = np.frombuffer(bufs[1], dtype=np.int32)
    tok_off = off_buf[flat.offset : flat.offset + len(flat) + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    # doc_off indexes into the flat token array; normalize to 0-based
    doc_off = doc_off - doc_off[0]
    return tok_off[:-1], tok_off[1:], data, doc_off


def reduceat_fixed(values: np.ndarray, offsets: np.ndarray, op=np.add) -> np.ndarray:
    """Segmented reduction with correct empty-segment semantics: segment i is
    values[offsets[i]:offsets[i+1]]; empty segments yield op's identity (0
    for add) instead of numpy's reduceat quirk (element at the index)."""
    starts = offsets[:-1]
    sizes = np.diff(offsets)
    n_seg = starts.shape[0]
    shape = (n_seg,) + values.shape[1:]
    out = np.zeros(shape, dtype=values.dtype)
    if values.shape[0] == 0 or n_seg == 0:
        return out
    # reduceat over the NON-EMPTY segments' starts only (strictly
    # increasing, so each reduces exactly its own run). Clamping empty
    # trailing starts to len-1 instead would steal the final row from the
    # last non-empty segment's reduction.
    nz = sizes > 0
    if nz.any():
        out[nz] = op.reduceat(values, starts[nz], axis=0)
    return out


_HEXMAP = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def md5_segments(lengths: np.ndarray, stream: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 md5 digests of the segments tiling `stream` — native
    OpenSSL kernel (sha.c:md5_segments_full) when available, hashlib loop
    otherwise (identical bytes)."""
    from plakar_ray import _native

    lengths = np.asarray(lengths, dtype=np.int64)
    sha_lib = _native.load_sha()
    if sha_lib is not None:
        return _native.md5_segments_full(sha_lib, lengths, stream)
    import hashlib

    out = np.empty((lengths.shape[0], 16), dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    mv = memoryview(stream)
    for j, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
        out[j] = np.frombuffer(hashlib.md5(mv[a:b]).digest(), dtype=np.uint8)
    return out


def hex_string_array(digests: np.ndarray) -> pa.Array:
    """(n, k) uint8 digest rows -> Arrow string array of 2k-char lowercase
    hex — vectorized nibble lookup, one buffer build, no per-row Python."""
    n, k = digests.shape
    hx = np.empty((n, 2 * k), dtype=np.uint8)
    hx[:, 0::2] = _HEXMAP[digests >> 4]
    hx[:, 1::2] = _HEXMAP[digests & 0x0F]
    off = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * (2 * k)).tobytes())
    return pa.Array.from_buffers(pa.string(), n, [None, off, pa.py_buffer(hx)])
