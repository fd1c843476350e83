"""Scalar reference oracles — exact, slow, test-grade.

Pure-Python re-derivations of the reference's cut-point algorithms
(citations inline into /root/reference). These are the *spec*: the vectorized
kernels in kernels.py are differential-tested against them, mirroring the
reference's own optimized-vs-reference-loop test strategy
(chunkers/fastcdc/reference_test.go, jc/reference_test.go,
ultracdc/reference_test.go).

All arithmetic is explicitly wrapped mod 2^64 (& MASK64) to match Go uint64.
"""

from __future__ import annotations

from plakar_ray.gear import GEAR, GEAR64_STADIA
from plakar_ray.opts import (
    MASK64,
    ULTRACDC_LEST,
    ULTRACDC_MASK_L,
    ULTRACDC_MASK_S,
    ChunkerOpts,
)

_POPCOUNT_AA = [bin(b ^ 0xAA).count("1") for b in range(256)]


def cut_fastcdc(
    opts: ChunkerOpts, data: bytes, n: int, mask_s: int, mask_l: int, gear=None
) -> int:
    """FastCDC normalized-chunking cut point (fastcdc.go:225-253)."""
    g = [int(x) for x in (GEAR if gear is None else gear)]
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size
    elif n <= normal_size:
        normal_size = n

    fp = 0
    mask = mask_s
    i = min_size
    while i < n:
        if i == normal_size:
            mask = mask_l
        fp = ((fp << 1) + g[data[i]]) & MASK64
        if (fp & mask) == 0:
            return i
        i += 1
    return i


def cut_jc(
    opts: ChunkerOpts,
    data: bytes,
    n: int,
    mask_c: int,
    mask_j: int,
    jump_length: int,
    spec_faithful: bool,
    gear=None,
) -> int:
    """JC jump-chunking cut point (jc.go:205-244)."""
    g = [int(x) for x in (GEAR if gear is None else gear)]
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    if spec_faithful:
        # Paper Algorithm 1: only MaxSize clamp; short final segments are
        # still scanned (jc.go:211-217).
        if n >= max_size:
            n = max_size
    elif n <= normal_size:
        # Legacy: return a final sub-NormalSize segment whole (jc.go:219-223).
        return n
    elif n >= max_size:
        n = max_size

    fp = 0
    i = min_size
    while i < n:
        fp = ((fp << 1) + g[data[i]]) & MASK64
        if (fp & mask_j) == 0:
            if (fp & mask_c) == 0:
                return i
            fp = 0
            i += jump_length
        else:
            i += 1
    return min(i, n)


def cut_ultracdc(opts: ChunkerOpts, data: bytes, n: int, spec_faithful: bool) -> int:
    """UltraCDC cut point: 8-byte-window Hamming distance to the 0xAA pattern,
    low-entropy-string fast path (ultracdc.go:101-240)."""
    assert n <= len(data)
    mask_s, mask_l = ULTRACDC_MASK_S, ULTRACDC_MASK_L
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size

    low_entropy_count = 0
    mask = mask_s
    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size
    elif n <= normal_size:
        normal_size = n
    # One full 8-byte window past MinSize is needed for the initial distance
    # (ultracdc.go:138-147).
    if n < min_size + 8:
        return n

    out_win = data[min_size : min_size + 8]
    dist = sum(_POPCOUNT_AA[v] for v in out_win)

    i = min_size + 8
    while i <= n - 8:
        if i >= normal_size:
            mask = mask_l
        in_win = data[i : i + 8]
        if in_win == out_win:
            low_entropy_count += 1
            if low_entropy_count >= ULTRACDC_LEST:
                return i + 8
            i += 8
            continue
        low_entropy_count = 0
        for j in range(8):
            if (dist & mask) == 0:
                # Spec (v1.0.0) cuts at the window's right edge, legacy at the
                # exact matching byte (ultracdc.go:199-212).
                return i + 8 if spec_faithful else i + j
            dist += _POPCOUNT_AA[data[i + j]] - _POPCOUNT_AA[data[i + j - 8]]
        out_win = in_win
        i += 8
    return n


def cut_stadia(opts: ChunkerOpts, data: bytes, n: int) -> int:
    """FastCDC4Stadia cut point: 64-bit gear, all-1s seed, threshold compare,
    regression cut points (fastcdc4stadia.go:77-149)."""
    assert n <= len(data)
    g = [int(x) for x in GEAR64_STADIA]
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    thresh = MASK64 // (normal_size - min_size + 1)

    if n <= min_size:
        return n
    if n >= max_size:
        n = max_size

    regression_len = n
    regression_mask = 0  # 0 => matches anything
    fp = MASK64
    k_hash_bits = 64
    i = min_size - k_hash_bits if min_size > k_hash_bits else 0
    while i < min_size:
        fp = ((fp << 1) + g[data[i]]) & MASK64
        i += 1
    while i < n:
        if (fp & regression_mask) == 0:
            if fp <= thresh:
                return i
            regression_len = i
            regression_mask = MASK64
            while (fp & regression_mask) != 0:
                regression_mask = (regression_mask << 1) & MASK64
        fp = ((fp << 1) + g[data[i]]) & MASK64
        i += 1
    if (fp & regression_mask) != 0:
        return regression_len
    return i


def cut_fixed(opts: ChunkerOpts, data: bytes, n: int) -> int:
    """Fixed-size cut point (fixed.go:74-79)."""
    return n if n < opts.normal_size else opts.normal_size


def chunk_lengths_oracle(algo: str, data: bytes, opts: ChunkerOpts | None = None) -> list[int]:
    """Drive the Next() stream semantics with the scalar oracle: windows of at
    most MaxSize, tail chunk (< MinSize) ends the stream (chunkers.go:160-190).
    Zero-length chunks (empty input) are dropped, matching the reference
    harness collectNext (tests/harness_test.go:134-149)."""
    from plakar_ray.registry import get_algorithm

    spec = get_algorithm(algo)
    o = spec.resolve_opts(opts)
    cfg = spec.setup(o)

    lengths: list[int] = []
    pos = 0
    total = len(data)
    while pos < total:
        n = min(total - pos, o.max_size)
        window = data[pos : pos + n]
        cut = spec.oracle_cut(cfg, o, window, n)
        if cut > 0:
            lengths.append(cut)
        pos += cut
        if cut < o.min_size:
            break
    return lengths
