"""Competitor chunker (buzhash) gates: differential oracle parity,
invariants, registry-extension behavior, and comparative dedup sanity —
the analogue of the reference's benchmarks module assertions
(/root/reference/benchmarks/chunkers_test.go:23-412)."""

import numpy as np
import pytest

import plakar_ray.competitors as C
from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import ALGORITHMS, chunk_lengths, get_algorithm

CONFIGS = [(64, 512, 128), (256, 4096, 1024), (2048, 65536, 8192)]
FILLS = ["rand", "zeros", "repeat"]
LENGTHS = [0, 1, 63, 64, 100, 1000, 5000, 20000, 100000]


def _fill(kind: str, ln: int, rng) -> np.ndarray:
    if kind == "rand":
        return rng.integers(0, 256, size=ln, dtype=np.uint8)
    if kind == "zeros":
        return np.zeros(ln, dtype=np.uint8)
    return np.frombuffer((b"plakar" * (ln // 6 + 1))[:ln], dtype=np.uint8)


@pytest.mark.parametrize("cfgt", CONFIGS)
def test_buzhash_kernel_matches_oracle(cfgt):
    rng = np.random.default_rng(11)
    spec = get_algorithm("buzhash")
    opts = ChunkerOpts(*cfgt)
    o = spec.resolve_opts(opts)
    cfg = spec.setup(o)
    for fill in FILLS:
        for ln in LENGTHS:
            data = _fill(fill, ln, rng)
            lens, s = [], 0
            while s < ln:
                cut = C.cut_buzhash(o, data[s:], ln - s, cfg["mask"])
                lens.append(cut)
                s += cut
            got = chunk_lengths("buzhash", data, opts)
            assert got.tolist() == lens, (cfgt, fill, ln)


def test_buzhash_invariants():
    rng = np.random.default_rng(12)
    opts = ChunkerOpts(256, 4096, 1024)
    data = rng.integers(0, 256, size=200_000, dtype=np.uint8)
    lens = chunk_lengths("buzhash", data, opts)
    assert lens.sum() == data.shape[0]
    assert (lens[:-1] >= 256).all() and (lens[:-1] <= 4096).all()
    assert lens[-1] <= 4096
    # mean ~ min + normal (geometric past the min offset)
    assert 900 < lens.mean() < 1800


def test_buzhash_registration_idempotent_and_validated():
    assert "buzhash" in ALGORITHMS
    C.register_competitors()  # second call is a no-op, not an error
    spec = get_algorithm("buzhash")
    with pytest.raises(ValueError):
        spec.validate(ChunkerOpts(256, 4096, 1000))  # non-power-of-two normal
    with pytest.raises(ValueError):
        spec.validate(ChunkerOpts(32, 4096, 1024))  # window unsaturated


def test_buzhash_dedup_comparable_to_fastcdc():
    """Duplicated corpus: a content-defined competitor must rediscover the
    shared region (dedup ratio well under 1), same gate the reference
    applies to its own algorithms (cmd/cdc/cdc_test.go:43-87)."""
    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=150_000, dtype=np.uint8)
    doc = np.concatenate([base, base])  # 2x duplication
    opts = ChunkerOpts(256, 4096, 1024)
    import hashlib

    def ratio(algo):
        lens = chunk_lengths(algo, doc, opts)
        ends = np.cumsum(lens)
        seen, uniq = set(), 0
        for e, ln in zip(ends.tolist(), lens.tolist()):
            d = hashlib.sha256(doc[e - ln : e].tobytes()).digest()
            if d not in seen:
                seen.add(d)
                uniq += ln
        return uniq / doc.shape[0]

    rb, rf = ratio("buzhash"), ratio("fastcdc")
    assert rb < 0.6 and rf < 0.6
    assert abs(rb - rf) < 0.12  # comparable resync quality at this config


def test_extension_import_errors_surface():
    """A broken extension module must raise its real ImportError, not be
    swallowed into 'unknown algorithm' (VERDICT r3 item #5)."""
    import pytest

    from plakar_ray import registry

    registry.EXTENSION_MODULES.append("plakar_ray._no_such_extension_module")
    try:
        with pytest.raises(ImportError):
            registry.get_algorithm("definitely-not-registered")
    finally:
        registry.EXTENSION_MODULES.remove("plakar_ray._no_such_extension_module")
    with pytest.raises(KeyError):
        registry.get_algorithm("definitely-not-registered")
