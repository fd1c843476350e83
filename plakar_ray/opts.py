"""Chunker options, defaulting, validation, and mask/jump derivation.

Mirrors the configuration semantics of the reference exactly — the masks
decide the chunk boundaries, so every defaulting rule is replicated
bit-for-bit (reference citations inline). No code is copied; Go semantics are
re-derived and re-expressed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MiB = 1024 * 1024
GiB = 1024 * MiB
SIZE_FLOOR = 64
SIZE_CEIL = GiB

MASK64 = 0xFFFFFFFFFFFFFFFF


class OptionError(ValueError):
    pass


@dataclass(frozen=True)
class ChunkerOpts:
    """(MinSize, MaxSize, NormalSize, Key) — reference chunkers.go:24-29.

    A value of 0 means "use the algorithm default" (chunkers.go:86-98).
    """

    min_size: int = 0
    max_size: int = 0
    normal_size: int = 0
    key: bytes | None = None

    def with_defaults(self, defaults: "ChunkerOpts") -> "ChunkerOpts":
        """Back-fill zero-valued sizes from per-algorithm defaults
        (chunkers.go:86-98)."""
        return ChunkerOpts(
            min_size=self.min_size or defaults.min_size,
            max_size=self.max_size or defaults.max_size,
            normal_size=self.normal_size or defaults.normal_size,
            key=self.key,
        )


# Per-algorithm defaults (fastcdc.go:158-165, jc.go:183-190, ultracdc.go:60-66,
# fixed.go:40-47, fastcdc4stadia.go:46-52).
DEFAULTS_FASTCDC = ChunkerOpts(2 * 1024, 64 * 1024, 8 * 1024)
DEFAULTS_JC = ChunkerOpts(2 * 1024, 64 * 1024, 8 * 1024)
DEFAULTS_ULTRACDC = ChunkerOpts(2 * 1024, 64 * 1024, 10 * 1024)
DEFAULTS_STADIA = ChunkerOpts(2 * 1024, 64 * 1024, 8 * 1024)
DEFAULTS_FIXED = ChunkerOpts(64 * 1024, 64 * 1024, 64 * 1024)


def generate_spaced_mask(one_count: int, total_bits: int = 64) -> int:
    """Spread `one_count` 1-bits evenly over a 64-bit word
    (fastcdc.go:105-122, identical helper in jc.go:91-108)."""
    if one_count >= total_bits:
        return MASK64
    if one_count <= 0:
        return 0
    step = total_bits // one_count
    mask = 0
    for i in range(one_count):
        pos = total_bits - 1 - i * step
        if pos >= 0:
            mask |= 1 << pos
    return mask


def calculate_fastcdc_masks(normal_size: int, normal_level: int) -> tuple[int, int]:
    """FastCDC strict/loose masks from log2(NormalSize) ± normalLevel bits
    (fastcdc.go:92-103). Uses float log2 exactly like the reference."""
    bits = int(math.log2(float(normal_size)))
    mask_s = generate_spaced_mask(bits + normal_level, 64)
    mask_l = generate_spaced_mask(bits - normal_level, 64)
    return mask_s, mask_l


def embed_mask(mask_c: int) -> int:
    """JC jump mask: unset the least-significant 1-bit of the cut mask
    (jc.go:110-116)."""
    if mask_c == 0:
        return 0
    return mask_c & (mask_c - 1)


def jc_jump_length(normal_size: int) -> int:
    """jumpLength = 2^(c+j) / (2^c - 2^j), c = log2(Normal)-1, j = c-1
    (jc.go:157-164)."""
    bits = int(math.log2(float(normal_size)))
    c_ones = bits - 1
    j_ones = c_ones - 1
    return (1 << (c_ones + j_ones)) // ((1 << c_ones) - (1 << j_ones))


# Legacy hard-coded masks, used by legacy variants always and by versioned
# variants at the exact default triple (fastcdc.go:179-182, jc.go:166-172).
FASTCDC_LEGACY_MASK_S = 0x0003590703530000
FASTCDC_LEGACY_MASK_L = 0x0000D90003530000
JC_LEGACY_MASK_C = 0x590003570000
JC_LEGACY_MASK_J = 0x590003560000

# UltraCDC constants (ultracdc.go:109-118).
ULTRACDC_MASK_S = 0x2F
ULTRACDC_MASK_L = 0x2C
ULTRACDC_LEST = 64

_DEFAULT_TRIPLE = (2 * 1024, 64 * 1024, 8 * 1024)


def fastcdc_masks(opts: ChunkerOpts, legacy: bool, normal_level: int = 2) -> tuple[int, int]:
    """Mask selection incl. the legacy/default-triple special case
    (fastcdc.go:179-184)."""
    if legacy or (opts.min_size, opts.max_size, opts.normal_size) == _DEFAULT_TRIPLE:
        return FASTCDC_LEGACY_MASK_S, FASTCDC_LEGACY_MASK_L
    return calculate_fastcdc_masks(opts.normal_size, normal_level)


def jc_masks(opts: ChunkerOpts, legacy: bool) -> tuple[int, int]:
    """JC cut/jump mask selection incl. legacy/default-triple special case
    (jc.go:166-172)."""
    if legacy or (opts.min_size, opts.max_size, opts.normal_size) == _DEFAULT_TRIPLE:
        return JC_LEGACY_MASK_C, JC_LEGACY_MASK_J
    bits = int(math.log2(float(opts.normal_size)))
    mask_c = generate_spaced_mask(bits - 1, 64)
    return mask_c, embed_mask(mask_c)


def _size_ok(v: int) -> bool:
    return SIZE_FLOOR <= v <= SIZE_CEIL


def validate_triple(opts: ChunkerOpts) -> None:
    """Shared min<normal<max validation (fastcdc.go:195-207, jc.go:192-203,
    ultracdc.go:72-87)."""
    if opts.normal_size == 0 or not _size_ok(opts.normal_size):
        raise OptionError("NormalSize is required and must be 64B <= NormalSize <= 1GB")
    if not _size_ok(opts.min_size) or opts.min_size >= opts.normal_size:
        raise OptionError(
            "MinSize is required and must be 64B <= MinSize <= 1GB && MinSize < NormalSize"
        )
    if not _size_ok(opts.max_size) or opts.max_size <= opts.normal_size:
        raise OptionError(
            "MaxSize is required and must be 64B <= MaxSize <= 1GB && MaxSize > NormalSize"
        )


def validate_fastcdc(opts: ChunkerOpts, keyed: bool, normal_level: int = 2) -> None:
    """FastCDC adds power-of-two NormalSize + normalLevel constraints
    (fastcdc.go:195-223)."""
    validate_triple(opts)
    if opts.normal_size & (opts.normal_size - 1):
        raise OptionError("NormalSize must be a power of two")
    if not 0 <= normal_level < 32:
        raise OptionError("NormalLevel must be between 0 and 31")
    if int(math.log2(float(opts.min_size))) < normal_level:
        raise OptionError("NormalSize must be at least 2^NormalLevel")
    if keyed and opts.key is None:
        raise OptionError("key is required for keyed FastCDC")


def validate_fixed(opts: ChunkerOpts) -> None:
    """Fixed chunker: single power-of-two size (fixed.go:61-72)."""
    if not _size_ok(opts.normal_size):
        raise OptionError("ChunkSize is required and must be 64B <= ChunkSize <= 1GB")
    if opts.normal_size & (opts.normal_size - 1):
        raise OptionError("NormalSize must be a power of two")
    if opts.min_size != opts.normal_size or opts.max_size != opts.normal_size:
        raise OptionError(
            "a fixed chunker uses a single size: MinSize and MaxSize must equal NormalSize"
        )


@dataclass(frozen=True)
class SizeProfile:
    """A (min, normal, max) triple — the reference test harness concept
    (tests/harness_test.go:58-74)."""

    name: str
    min: int
    normal: int
    max: int

    def opts(self, key: bytes | None = None) -> ChunkerOpts:
        return ChunkerOpts(self.min, self.max, self.normal, key)


# Golden-test size profiles (harness_test.go:70-74).
PROFILES = {
    "2K-8K-64K": SizeProfile("2K-8K-64K", 2 * 1024, 8 * 1024, 64 * 1024),
    "256K-512K-1M": SizeProfile("256K-512K-1M", 256 * 1024, 512 * 1024, 1024 * 1024),
    "1M-4M-16M": SizeProfile("1M-4M-16M", 1024 * 1024, 4 * MiB, 16 * MiB),
    # Small profile for short web documents (not in the reference harness;
    # same validation rules).
    "64-256-4K": SizeProfile("64-256-4K", 64, 256, 4096),
}
