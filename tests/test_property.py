"""Hypothesis property tests: kernel-vs-oracle parity over the CONFIG
domain, not just the fixed differential profiles — fuzzes (min, normal,
max) triples and adversarial byte patterns for every registered algorithm
(including the keyed variant and the buzhash competitor), asserting
cutpoint-for-cutpoint equality plus the reference's universal invariants
(reconstruction, size bounds, short-chunk-only-last;
tests/chunkers_test.go:35-1095)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import plakar_ray.competitors  # noqa: F401  (registers buzhash)
from plakar_ray.opts import ChunkerOpts
from plakar_ray.oracle import chunk_lengths_oracle
from plakar_ray.registry import chunk_lengths, get_algorithm

ALGOS = [
    "fastcdc",
    "fastcdc-v1.0.0",
    "kfastcdc",
    "jc",
    "jc-v1.0.0",
    "jc-v1.1.0",
    "ultracdc",
    "ultracdc-v1.0.0",
    "fastcdc4stadia",
    "fixed-v1.0.0",
    "buzhash",
]

_KEY = bytes(range(32))  # fixed 32-byte key for the keyed variant


@st.composite
def valid_opts(draw, algo):
    normal = 1 << draw(st.integers(min_value=7, max_value=13))
    min_size = draw(st.sampled_from([64, 128, 256, normal // 4, normal // 2]))
    max_size = normal * draw(st.sampled_from([2, 4, 8]))
    key = _KEY if algo == "kfastcdc" else None
    o = ChunkerOpts(min_size, max_size, normal, key)
    spec = get_algorithm(algo)
    try:
        spec.validate(spec.resolve_opts(o))
    except ValueError:
        # config outside this algorithm's domain (e.g. fastcdc's
        # log2(MinSize) >= normalLevel rule) — draw again
        from hypothesis import assume

        assume(False)
    return o


@st.composite
def doc_bytes(draw):
    kind = draw(st.sampled_from(["random", "zeros", "repeat", "mixed", "raw"]))
    n = draw(st.integers(min_value=0, max_value=12_000))
    if kind == "random":
        seed = draw(st.integers(min_value=0, max_value=2**31))
        return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(n)
    if kind == "repeat":
        unit = draw(st.binary(min_size=1, max_size=16))
        return (unit * (n // len(unit) + 1))[:n]
    if kind == "mixed":
        seed = draw(st.integers(min_value=0, max_value=2**31))
        half = np.random.default_rng(seed).integers(0, 256, n // 2, dtype=np.uint8).tobytes()
        return half + bytes(n - len(half))
    return draw(st.binary(max_size=2_000))


@pytest.mark.parametrize("algo", ALGOS)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_kernel_oracle_parity_fuzzed(algo, data):
    opts = data.draw(valid_opts(algo))
    doc = data.draw(doc_bytes())
    got = chunk_lengths(algo, doc, opts).tolist()
    want = chunk_lengths_oracle(algo, doc, opts)
    assert got == want, (opts, len(doc))
    # universal invariants (resolve to effective opts for bound checks)
    spec = get_algorithm(algo)
    o = spec.resolve_opts(opts)
    assert sum(got) == len(doc)
    if got:
        assert all(o.min_size <= L <= o.max_size for L in got[:-1])
        assert got[-1] <= o.max_size
