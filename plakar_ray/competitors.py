"""Competitor baseline: buzhash (cyclic-polynomial) CDC chunker.

The reference benchmarks its chunkers against third-party Go libraries
(restic/chunker, jotfs, askeladdk, tigerwill90, mhofmann —
/root/reference/benchmarks/chunkers_test.go:23-412). Those libraries don't
exist in this environment, so the comparable is a from-scratch buzhash
chunker — the public rolling-hash family used by borg/casync — built with
the same scalar-oracle + vectorized-kernel discipline as the reference
ports and registered through the user-extension surface
(registry.register_chunker), exercising the Register semantics of
/root/reference/chunkers.go:59-67 with a genuinely new algorithm.

Definition (window w = 64):
    H_i = XOR_{j=0}^{min(i,63)} rotl64(T[b_{i-j}], j)
    cut at length L = i+1 in [min_size, max_size) when (H_i & mask) == 0,
    mask = normal_size - 1 (power-of-two normal => mean chunk ~ normal).
Because min_size >= 64 (the reference's option bounds) the 64-byte window
is always saturated and chunk-interior at every checkable position, so the
per-chunk-reset scalar oracle and the continuous dense scan agree exactly —
the kernel needs no warm-up phase at all. rotl distributes over XOR, so the
dense scan uses the same log-doubling trick as the gear kernels
(kernels._gear_window64) with (rotl, xor) in place of (shift, add).
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

from plakar_ray.opts import ChunkerOpts, DEFAULTS_FASTCDC
from plakar_ray.registry import ALGORITHMS, AlgorithmSpec, register_chunker

_U64 = np.uint64
_MASK64 = 0xFFFFFFFFFFFFFFFF

# Deterministic byte->uint64 table (seeded; the competitor analogue of the
# published Gear table — any fixed random table defines the algorithm).
BUZ_TABLE = np.random.default_rng(0x62757A68).integers(
    0, 1 << 64, size=256, dtype=np.uint64
)
_BUZ_LIST = [int(x) for x in BUZ_TABLE]


def _rotl_vec(x: np.ndarray, s: int) -> np.ndarray:
    return (x << _U64(s)) | (x >> _U64(64 - s))


def buz_window64(h: np.ndarray, in_place: bool = False) -> np.ndarray:
    """F[i] = XOR_{j=0}^{min(i,63)} rotl64(h[i-j], j) via log-doubling:
    6 rot-xor passes (rotl distributes over XOR and composes additively,
    mirroring kernels._gear_window64's shifted adds)."""
    f = h if in_place else h.copy()
    for k in range(6):
        s = 1 << k
        if s >= f.shape[0]:
            break
        f[s:] ^= _rotl_vec(f[:-s], s)
    return f


_TILE = 1 << 16


def _buz_candidates(data: np.ndarray, mask: int) -> list:
    """Absolute positions i where (H_i & mask) == 0, tile-by-tile (63-byte
    overlap keeps the window exact across tile edges)."""
    n = data.shape[0]
    out: list[np.ndarray] = []
    m = _U64(mask)
    for start in range(0, n, _TILE):
        lo = max(0, start - 63)
        hi = min(n, start + _TILE)
        f = buz_window64(BUZ_TABLE[data[lo:hi]], in_place=True)
        seg = f[start - lo :]
        rel = np.nonzero((seg & m) == 0)[0]
        if rel.shape[0]:
            out.append(rel + start)
    if not out:
        return []
    return np.concatenate(out).tolist()


def cut_buzhash(opts: ChunkerOpts, data, n: int, mask: int) -> int:
    """Scalar oracle, one cutpoint (the Algorithm(opts, data, n) shape of
    chunkers.go:31-36): rolling update H = rotl1(H) ^ T[in] ^ T[out] (the
    out term is rotl(T, 64) == T once 64 bytes are in the window)."""
    if n <= opts.min_size:
        return n
    bound = min(n, opts.max_size)
    h = 0
    for i in range(bound):
        h = ((h << 1) | (h >> 63)) & _MASK64
        h ^= _BUZ_LIST[data[i]]
        if i >= 64:
            h ^= _BUZ_LIST[data[i - 64]]
        if i + 1 >= opts.min_size and (h & mask) == 0:
            return i + 1
    return bound


def boundaries_buzhash(data: np.ndarray, opts: ChunkerOpts, mask: int) -> np.ndarray:
    """All chunk lengths of one document: ONE dense candidate scan + a
    sparse sequential walk. Window saturation at min_size >= 64 makes the
    dense full-window hashes exact at every checkable position, so there is
    no per-chunk warm-up (differential-tested vs cut_buzhash)."""
    total = int(data.shape[0])
    if total == 0:
        return np.empty(0, dtype=np.int64)
    min_size, max_size = opts.min_size, opts.max_size
    cands = _buz_candidates(data, mask)
    n_cand = len(cands)
    lengths: list[int] = []
    s = 0
    j = 0
    while s < total:
        n = min(total - s, max_size)
        if n <= min_size:
            lengths.append(n)
            break
        j = bisect_left(cands, s + min_size - 1, j)
        cut = -1
        if j < n_cand and cands[j] < s + n:
            cut = cands[j] - s + 1
        L = cut if cut > 0 else n
        lengths.append(L)
        s += L
    return np.asarray(lengths, dtype=np.int64)


def _validate_buzhash(o: ChunkerOpts) -> None:
    from plakar_ray.opts import validate_triple

    validate_triple(o)
    if o.normal_size & (o.normal_size - 1):
        raise ValueError("buzhash requires power-of-two NormalSize")
    # window-saturation precondition for the no-warm-up kernel; the
    # reference's own bounds already guarantee it (chunkers option domain)
    if o.min_size < 64:
        raise ValueError("buzhash requires MinSize >= 64")


def _mk_buzhash() -> AlgorithmSpec:
    def setup(o: ChunkerOpts) -> dict:
        return {"mask": o.normal_size - 1}

    return AlgorithmSpec(
        name="buzhash",
        defaults=DEFAULTS_FASTCDC,  # 2K/8K/64K, same comparison footing
        setup=setup,
        validate=_validate_buzhash,
        oracle_cut=lambda cfg, o, data, n: cut_buzhash(o, data, n, cfg["mask"]),
        boundaries=lambda cfg, o, data: boundaries_buzhash(data, o, cfg["mask"]),
    )


def register_competitors() -> None:
    """Idempotent registration of the competitor algorithms."""
    if "buzhash" not in ALGORITHMS:
        register_chunker(_mk_buzhash())


register_competitors()
