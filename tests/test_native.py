"""Native-vs-numpy kernel equivalence.

The native C kernels (plakar_ray/_native/cdc.c) dispatch at the top of
every public boundaries_* function; with them loaded, the rest of the
suite (golden, differential, hypothesis) gates the NATIVE path. This
module is what keeps the numpy fallback honest: it forces load() to
return None and pins cutpoint equality on documents engineered to hit
every resolution branch (random, all-zero low-entropy, lag-8 periodic,
planted boundary patterns, tiny/tail sizes).
"""

from __future__ import annotations

import numpy as np
import pytest

from plakar_ray import _native, kernels
from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import ALGORITHMS, get_algorithm

pytestmark = pytest.mark.skipif(
    _native.load() is None, reason="native kernels unavailable (no gcc)"
)

ALGOS = [n for n in ALGORITHMS if not n.startswith("fixed") and n != "buzhash"]


def _docs() -> list[np.ndarray]:
    rng = np.random.default_rng(7)
    period = np.tile(rng.integers(0, 256, 8, dtype=np.uint8), 4000)
    return [
        np.empty(0, dtype=np.uint8),
        rng.integers(0, 256, 1, dtype=np.uint8),
        rng.integers(0, 256, 63, dtype=np.uint8),
        rng.integers(0, 256, 2048, dtype=np.uint8),
        rng.integers(0, 256, 70_001, dtype=np.uint8),
        np.zeros(40_000, dtype=np.uint8),  # ultracdc low-entropy forced cuts
        period,  # lag-8 equal windows without being constant
        np.concatenate([np.zeros(9000, np.uint8), rng.integers(0, 256, 9000, np.uint8)]),
    ]


@pytest.fixture()
def numpy_only(monkeypatch):
    """Force every kernels dispatch in this test to the numpy fallback."""
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", True)


@pytest.mark.parametrize("algo", ALGOS)
def test_native_matches_numpy_per_doc(algo, numpy_only, monkeypatch):
    spec = get_algorithm(algo)
    o = spec.resolve_opts(ChunkerOpts(key=b"k" * 32) if algo == "kfastcdc" else None)
    cfg = spec.setup(o)
    lib = _native._compile_and_bind()
    assert lib is not None
    for doc in _docs():
        want = spec.boundaries(cfg, o, doc).tolist()  # numpy (forced)
        monkeypatch.setattr(_native, "_lib", lib)
        got = spec.boundaries(cfg, o, doc).tolist()  # native
        monkeypatch.setattr(_native, "_lib", None)
        assert got == want, (algo, doc.shape[0])


@pytest.mark.parametrize("algo", ALGOS)
def test_native_multi_matches_per_doc(algo):
    """Native multi == native per-doc on a packed batch buffer (includes
    empty docs between non-empty ones)."""
    spec = get_algorithm(algo)
    if spec.boundaries_multi is None:
        pytest.skip("no multi kernel")
    o = spec.resolve_opts(None)
    cfg = spec.setup(o)
    docs = _docs()
    data = np.concatenate(docs)
    offsets = np.cumsum([0] + [d.shape[0] for d in docs], dtype=np.int64)
    multi = spec.boundaries_multi(cfg, o, data, offsets)
    assert len(multi) == len(docs)
    for got, doc in zip(multi, docs):
        assert got.tolist() == spec.boundaries(cfg, o, doc).tolist()


def test_segment_hashes_native_vs_numpy_vs_scalar():
    """fnv1a64_segments and wfnv64_segments: native C == vectorized numpy ==
    a scalar spec recomputation, over mixed segment lengths incl. 0 and
    sub-word tails."""
    from plakar_ray.functions.strhash import (
        _wfnv64_segments_np,
        fnv1a64_slices,
        fnv1a64_segments,
        wfnv64_segments,
    )

    rng = np.random.default_rng(13)
    lengths = np.array([0, 1, 3, 7, 8, 9, 15, 16, 17, 255, 256, 8192, 5], dtype=np.int64)
    data = rng.integers(0, 256, int(lengths.sum()), dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths

    lib = _native._compile_and_bind()
    assert lib is not None

    # byte FNV-1a: native vs the long-vetted positional numpy scan
    h_native = _native.fnv_segments(lib, lengths, data)
    assert h_native.tolist() == fnv1a64_slices(starts, ends, data).tolist()
    assert fnv1a64_segments(lengths, data).tolist() == h_native.tolist()

    # wfnv: native vs numpy fallback vs scalar spec
    w_native = _native.wfnv_segments(lib, lengths, data)
    assert w_native.tolist() == _wfnv64_segments_np(lengths, data).tolist()
    assert wfnv64_segments(lengths, data).tolist() == w_native.tolist()

    OFF, P, M = 0xCBF29CE484222325, 0x100000001B3, (1 << 64) - 1

    def scalar_wfnv(b: bytes) -> int:
        h = OFF
        for j in range(0, len(b) // 8 * 8, 8):
            h = ((h ^ int.from_bytes(b[j : j + 8], "little")) * P) & M
        rem = len(b) % 8
        if rem:
            tail = b[len(b) - rem :] + b"\0" * (8 - rem)
            h = ((h ^ int.from_bytes(tail, "little")) * P) & M
        return ((h ^ len(b)) * P) & M

    for i in range(len(lengths)):
        seg = data[starts[i] : ends[i]].tobytes()
        assert int(w_native[i]) == scalar_wfnv(seg), i

    # padded-tail vs shorter-segment disambiguation: "ab" != "ab\0"
    two = np.array([2, 3], dtype=np.int64)
    buf = np.frombuffer(b"ab" + b"ab\0", dtype=np.uint8)
    out = wfnv64_segments(two, buf)
    assert out[0] != out[1]


def test_minhash_minima_native_matches_numpy(monkeypatch):
    """Native perm-minima == numpy reduceat fallback == per-doc scalar
    signature(), including empty docs at the edges and in the middle."""
    from plakar_ray.stages.minhash import MinHashStage, _perm_minima

    rng = np.random.default_rng(29)
    counts = np.array([0, 1, 17, 0, 4096, 3, 0], dtype=np.int64)
    shingles = rng.integers(0, 1 << 63, int(counts.sum()), dtype=np.uint64) * 2 + 1
    st = MinHashStage(num_perm=128, seed=1337)

    lib = _native._compile_and_bind()
    assert lib is not None
    got = _perm_minima(shingles, counts, st.a, st.b)  # native (lib loaded)

    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", True)
    want = _perm_minima(shingles, counts, st.a, st.b)  # numpy fallback
    assert got.dtype == want.dtype and got.shape == want.shape
    assert (got == want).all()

    # scalar spec: per-doc signature() on each run; empty docs all-0xFF
    off = np.cumsum(counts) - counts
    for d in range(counts.shape[0]):
        run = shingles[off[d] : off[d] + counts[d]]
        if counts[d] == 0:
            assert (got[d] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        else:
            assert got[d].tolist() == st.signature(run).tolist()


def test_reduceat_fixed_trailing_empty_segments():
    """Trailing empty segments must not truncate the last non-empty
    segment's reduction (regression: the old len-1 clamp stole its final
    row), and interior empties yield the identity."""
    from plakar_ray.functions.strhash import reduceat_fixed

    v = np.arange(1, 7, dtype=np.int64)  # [1..6]
    off = np.array([0, 2, 2, 6, 6, 6], dtype=np.int64)
    got = reduceat_fixed(v, off)
    assert got.tolist() == [3, 0, 18, 0, 0]  # 18 includes the final row (6)

    m = np.arange(12, dtype=np.int64).reshape(6, 2)
    got2 = reduceat_fixed(m, off)
    assert got2.tolist() == [[2, 4], [0, 0], [28, 32], [0, 0], [0, 0]]

    assert reduceat_fixed(np.empty((0, 2), np.int64),
                          np.array([0, 0, 0], np.int64)).tolist() == [[0, 0], [0, 0]]


def test_native_winnow_select_differential():
    """Native monotonic-deque winnow selection == the numpy block-minima
    selection (and thus np.argmin leftmost tie-breaking), including
    tie-heavy 2-value, constant and periodic inputs."""
    import numpy as np

    from plakar_ray import _native
    from plakar_ray.pipelines.dedup import _window_argmin_select

    lib = _native.load()
    if lib is None or not hasattr(lib, "winnow_select"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for trial in range(150):
        v = int(rng.integers(1, 300))
        w = int(rng.integers(2, 50))
        hi = [2**63, 4, 2, 16][trial % 4]
        seg = rng.integers(0, hi, v, dtype=np.uint64).astype(np.uint64)
        out = np.empty(v, dtype=np.int64)
        dq = np.empty(v, dtype=np.int64)
        assert np.array_equal(
            _native.winnow_select(lib, seg, w, out, dq),
            _window_argmin_select(seg, w),
        ), (trial, v, w, hi)


def test_native_gram_winnow_multi_differential():
    """Fused rolling-gram-hash + winnow C kernel == the numpy fallback
    (gram_window_hashes + _window_argmin_select per doc segment) on random,
    constant (all-tie), periodic and planted-duplicate-span corpora, for
    stride-1 (w<=1), small/large w, and w > v edge geometries."""
    import numpy as np

    from plakar_ray import _native
    from plakar_ray.pipelines.dedup import (
        _GRAM_MUL,
        _window_argmin_select,
        gram_window_hashes,
    )

    lib = _native.load()
    if lib is None or not hasattr(lib, "gram_winnow_multi"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    for L, w in [(64, 32), (16, 8), (8, 1), (5, 4), (64, 200), (4, 2), (3, 7)]:
        docs = []
        for i in range(43):
            n = int(rng.integers(0, 700))
            if i % 6 == 0:
                docs.append(np.full(n, 65, np.uint8))
            elif i % 9 == 0:
                docs.append(np.tile(np.array([65, 66], np.uint8), n // 2 + 1)[:n])
            else:
                docs.append(rng.integers(32, 127, n, dtype=np.uint8))
        if docs[1].size > 250 and docs[3].size > 250:
            docs[3][:250] = docs[1][:250]  # shared span across docs
        data = np.concatenate(docs)
        offs = np.zeros(len(docs) + 1, np.int64)
        offs[1:] = np.cumsum([d.size for d in docs])
        h_n, d_n, p_n = _native.gram_winnow_multi(lib, data, offs, L, w, int(_GRAM_MUL))
        h_all = gram_window_hashes(data, L)
        hs, ds_, ps = [], [], []
        for d in range(len(docs)):
            v = docs[d].size - L + 1
            if v <= 0:
                continue
            seg = h_all[offs[d] : offs[d] + v]
            sel = (
                _window_argmin_select(seg, w)
                if w > 1
                else np.arange(v, dtype=np.int64)
            )
            hs.append(seg[sel])
            ds_.append(np.full(sel.size, d, np.int32))
            ps.append(sel)
        assert np.array_equal(h_n, np.concatenate(hs)), (L, w, "hash")
        assert np.array_equal(d_n, np.concatenate(ds_)), (L, w, "doc")
        assert np.array_equal(p_n, np.concatenate(ps)), (L, w, "pos")


def test_md5_segments_native_matches_hashlib():
    """Native OpenSSL md5 segment kernel == hashlib loop, and the hex
    encoder matches hexdigest()."""
    import hashlib

    import numpy as np

    from plakar_ray import _native
    from plakar_ray.functions.strhash import hex_string_array, md5_segments

    rng = np.random.default_rng(3)
    lens = rng.integers(0, 500, 64).astype(np.int64)
    stream = rng.integers(0, 256, int(lens.sum()), dtype=np.uint8)
    d16 = md5_segments(lens, stream)
    hexes = hex_string_array(d16).to_pylist()
    ends = np.cumsum(lens)
    mv = memoryview(stream)
    for j, (a, b) in enumerate(zip((ends - lens).tolist(), ends.tolist())):
        assert hexes[j] == hashlib.md5(mv[a:b]).hexdigest()
    lib = _native.load_sha()
    if lib is not None:
        assert np.array_equal(_native.md5_segments_full(lib, lens, stream), d16)
