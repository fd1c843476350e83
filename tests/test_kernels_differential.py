"""Differential tests: vectorized kernels vs scalar oracles.

Mirrors the reference's optimized-vs-reference-loop strategy
(chunkers/fastcdc/reference_test.go:31-122, jc/reference_test.go:28-105,
ultracdc/reference_test.go:87-147): same configs, fill patterns and boundary
lengths, cutpoint-for-cutpoint equality.
"""

import numpy as np
import pytest

from plakar_ray.opts import ChunkerOpts
from plakar_ray.oracle import chunk_lengths_oracle
from plakar_ray.registry import chunk_lengths

ALGOS = [
    "fastcdc",
    "fastcdc-v1.0.0",
    "jc",
    "jc-v1.0.0",
    "jc-v1.1.0",
    "ultracdc",
    "ultracdc-v1.0.0",
    "fastcdc4stadia",
    "fixed-v1.0.0",
]

PROFILES = [
    ChunkerOpts(64, 512, 128),
    ChunkerOpts(256, 4096, 1024),
    ChunkerOpts(2048, 65536, 8192),
]

_rng = np.random.default_rng(42)
_RANDOM = _rng.integers(0, 256, 400_000, dtype=np.uint8).tobytes()


def _make(pattern: str, n: int) -> bytes:
    if pattern == "random":
        return _RANDOM[:n]
    if pattern == "zeros":
        return bytes(n)
    if pattern == "repeat":
        return (b"plakar" * (n // 6 + 1))[:n]
    if pattern == "sparse":
        b = bytearray(n)
        for i in range(0, n, 997):
            b[i] = i & 0xFF
        return bytes(b)
    raise ValueError(pattern)


# Boundary lengths around min/normal/max plus a multi-chunk length.
LENGTHS = [0, 1, 63, 64, 65, 127, 128, 129, 500, 4096, 65535, 65536, 65537, 300_000]


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("pattern", ["random", "zeros", "repeat", "sparse"])
def test_kernel_matches_oracle(algo, pattern):
    for opts in PROFILES:
        if algo == "fixed-v1.0.0":
            opts = ChunkerOpts(0, 0, 1024)
        for n in LENGTHS:
            data = _make(pattern, n)
            want = chunk_lengths_oracle(algo, data, opts)
            got = chunk_lengths(algo, data, opts).tolist()
            assert got == want, (algo, pattern, n, opts)


@pytest.mark.parametrize("algo", ALGOS)
def test_invariants(algo):
    """Reconstruction + size bounds, as tests/chunkers_test.go:35-1095."""
    opts = ChunkerOpts(256, 4096, 1024)
    if algo == "fixed-v1.0.0":
        opts = ChunkerOpts(0, 0, 1024)
    data = _make("random", 200_000)
    lengths = chunk_lengths(algo, data, opts).tolist()
    assert sum(lengths) == len(data)
    spec_min = 1024 if algo == "fixed-v1.0.0" else 256
    spec_max = 1024 if algo == "fixed-v1.0.0" else 4096
    for l in lengths[:-1]:
        assert spec_min <= l <= spec_max
    assert lengths[-1] <= spec_max


def test_empty_input_no_chunks():
    for algo in ALGOS:
        assert chunk_lengths(algo, b"", None).tolist() == []


@pytest.mark.parametrize("spec", [False, True])
def test_ultracdc_tile_tail_positions(spec):
    """Regression: candidate positions in the final <=7 bytes of a document.

    The tiled candidate scan in boundaries_ultracdc previously iterated
    `range(8, total - 7, _TILE)`, never starting a tile whose first position
    falls inside the last 7 bytes; a first mask hit there (reachable after an
    unaligned cut, which legacy UltraCDC produces routinely) was dropped,
    silently merging the oracle's short tail chunk into the previous chunk.
    Crafted doc: constant Hamming-to-0xAA distance 8 everywhere (no hits, no
    lag-8 equality runs) except two planted 0xAA windows — one early to force
    an unaligned first cut, one whose dist ramp puts the first late candidate
    inside the dropped zone.
    """
    from plakar_ray.kernels import _TILE, boundaries_ultracdc

    opts = ChunkerOpts(2048, 1 << 16, 8192)
    choices = [0xAA ^ (1 << k) for k in range(8)]
    total = _TILE + 15
    doc = np.array(
        [choices[(i % 8 + i // 8) % 8] for i in range(total)], dtype=np.uint8
    )
    # early unaligned cut + late tail candidate (legacy cuts at the exact
    # byte, spec at the window edge, so the dist ramp start that lands the
    # short tail in the dropped zone differs by variant)
    late = _TILE + 11 if not spec else _TILE + 8
    for p0 in (2057, late):
        doc[p0 - 8 : p0] = 0xAA
    name = "ultracdc-v1.0.0" if spec else "ultracdc"
    want = chunk_lengths_oracle(name, bytes(doc), opts)
    got = boundaries_ultracdc(doc, opts, spec).tolist()
    assert got == want
    assert len(want) == 3 and want[-1] <= 7  # the case the old loop merged


def test_simhash_batch_matches_scalar():
    """Vectorized positional-FNV simhash == per-token scalar loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from plakar_ray.stages.simhash import simhash64, simhash_batch

    rng = np.random.default_rng(9)
    texts = []
    for _ in range(100):
        nw = int(rng.integers(0, 60))
        words = [
            "".join(chr(97 + c) for c in rng.integers(0, 36, rng.integers(1, 12)))
            for _ in range(nw)
        ]
        texts.append(" !@# ".join(words))
    texts += ["", "   ", "a", "THE the THE", "x1 y2 z3"]
    lists = pc.split_pattern_regex(pc.utf8_lower(pa.array(texts)), "[^a-z0-9]+")
    vec = simhash_batch(lists)
    for i in range(len(texts)):
        toks = [t for t in lists[i].as_py() if t]
        assert int(vec[i]) == simhash64(toks), i


def test_word3_batch_matches_scalar():
    """Vectorized joined-stream word-3-gram signatures == per-doc scalar
    path (same bytes, FNV, padding, signature minima)."""
    import pyarrow as pa

    from plakar_ray.stages.minhash import MinHashStage

    st = MinHashStage(shingle="word3", num_perm=48, seed=7)
    rng = np.random.default_rng(11)
    texts = []
    for _ in range(100):
        nw = int(rng.integers(0, 40))
        words = [
            "".join(chr(97 + c) for c in rng.integers(0, 36, rng.integers(1, 10)))
            for _ in range(nw)
        ]
        texts.append(" ".join(words))
    texts += ["", "one", "two words", "three word doc", "    ", "a b", "x"]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = st(batch)
    sig = np.asarray(
        out.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(len(texts), 48)
    nsh = out.column("n_shingles").to_numpy(zero_copy_only=False)
    for i, s in enumerate(texts):
        sh = st._word3_shingles(np.frombuffer(s.encode(), dtype=np.uint8))
        assert nsh[i] == sh.shape[0]
        if sh.shape[0]:
            ref = st.signature(np.unique(sh))
        else:
            ref = np.full(48, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        assert (sig[i] == ref).all(), i


def test_warm_fps_matches_matrix():
    """_warm_fps (log-doubling) vs the direct (L, L) shift-matrix definition
    fp[d] = sum_{j<=d} h[d-j] << j (mod 2^64), across all warm-up lengths."""
    from plakar_ray.kernels import _warm_fps

    rng = np.random.default_rng(42)
    for L in (1, 2, 3, 7, 16, 31, 32, 33, 62, 63):
        h = rng.integers(0, 1 << 64, size=L, dtype=np.uint64)
        d = np.arange(L)
        shifts = np.maximum(d[:, None] - d[None, :], 0).astype(np.uint64)
        valid = d[:, None] >= d[None, :]
        want = np.where(valid, np.left_shift(h[None, :], shifts), np.uint64(0)).sum(
            axis=1, dtype=np.uint64
        )
        got = _warm_fps(h.copy())
        assert np.array_equal(got, want), L


def test_multi_doc_matches_per_doc():
    """Batched frontier kernels (boundaries_*_multi) are cutpoint-identical
    to the per-document kernels across fills, sizes and configs — including
    empty docs, sub-MinSize docs, and short tails."""
    from plakar_ray.registry import get_algorithm

    rng = np.random.default_rng(77)
    docs = []
    for i in range(40):
        kind = i % 4
        ln = int(rng.integers(0, 30000)) if kind < 2 else [0, 1, 63, 64, 100, 4096][i % 6]
        if kind == 0:
            d = rng.integers(0, 256, ln, dtype=np.uint8)
        elif kind == 1:
            d = np.frombuffer((b"plakar" * (ln // 6 + 1))[:ln], dtype=np.uint8)
        else:
            d = np.zeros(ln, dtype=np.uint8)
        docs.append(d)
    data = np.concatenate(docs)
    offsets = np.cumsum([0] + [d.shape[0] for d in docs])
    for algo in ("fastcdc", "fastcdc-v1.0.0", "jc", "jc-v1.0.0", "jc-v1.1.0", "fastcdc4stadia",
                 "ultracdc", "ultracdc-v1.0.0"):
        spec = get_algorithm(algo)
        for opts in (ChunkerOpts(64, 512, 128), ChunkerOpts(256, 4096, 1024)):
            o = spec.resolve_opts(opts)
            cfg = spec.setup(o)
            got = spec.boundaries_multi(cfg, o, data, offsets)
            for i, d in enumerate(docs):
                want = chunk_lengths(algo, d, opts)
                assert got[i].tolist() == want.tolist(), (algo, opts, i)
