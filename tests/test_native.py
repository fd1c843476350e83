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
