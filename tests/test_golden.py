"""Golden fingerprint parity with the Go reference.

Reimplements the reference's golden oracle (tests/golden_test.go:52-92,
tests/harness_test.go:39-129) in full: identical algorithms, size profiles and
input shapes — including the Go-math/rand–generated random inputs, reproduced
byte-exactly by plakar_ray.goprng — compared against the *reference's own*
tests/testdata/golden.json fingerprints.

The default run covers every algorithm on the 2K-8K-64K profile plus all
cheap shapes everywhere; RUN_SLOW=1 runs all 126 cases. Keyed chunking
(kfastcdc) uses the native blake3 wheel when present, else the pure-Python
spec implementation (functions/blake3_pure.py). Fingerprint = (chunk count,
sha256 over little-endian uint64 lengths, sha256 of content).
"""

import hashlib
import json
import os

import pytest

from plakar_ray.goprng import go_rand_bytes
from plakar_ray.opts import PROFILES, ChunkerOpts
from plakar_ray.registry import chunk_lengths

GOLDEN_PATH = "/root/reference/tests/testdata/golden.json"
MAXMAX = 16 * 1024 * 1024

ALGOS = [
    "fastcdc", "fastcdc-v1.0.0", "kfastcdc",
    "jc", "jc-v1.0.0",
    "ultracdc", "fastcdc4stadia",
]
SIZES = ["2K-8K-64K", "256K-512K-1M", "1M-4M-16M"]
SHAPES = ["empty", "one-byte", "tiny-64", "random-3x-maxmax", "zeros-2x-maxmax", "repeat-2x-maxmax"]
CHEAP_SHAPES = {"empty", "one-byte", "tiny-64"}

# Fixed key k[i] = i*7+3 (tests/harness_test.go:50-56).
FIXED_KEY = bytes((i * 7 + 3) & 0xFF for i in range(32))


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("reference golden.json not available")
    return json.load(open(GOLDEN_PATH))


_shape_cache: dict[str, bytes] = {}


def shape_bytes(shape: str) -> bytes:
    if shape not in _shape_cache:
        if shape == "empty":
            _shape_cache[shape] = b""
        elif shape == "one-byte":
            _shape_cache[shape] = b"\x42"
        elif shape == "tiny-64":
            _shape_cache[shape] = go_rand_bytes(0, 64)
        elif shape == "random-3x-maxmax":
            _shape_cache[shape] = go_rand_bytes(0, 3 * MAXMAX)
        elif shape == "zeros-2x-maxmax":
            _shape_cache[shape] = bytes(2 * MAXMAX)
        elif shape == "repeat-2x-maxmax":
            _shape_cache[shape] = (b"plakar" * (2 * MAXMAX // 6 + 1))[: 2 * MAXMAX]
    return _shape_cache[shape]


def fingerprint(lengths, content: bytes):
    h = hashlib.sha256()
    for l in lengths:
        h.update(int(l).to_bytes(8, "little"))
    return len(lengths), h.hexdigest(), hashlib.sha256(content).hexdigest()


def _check(golden, algo, size, shape):
    key = f"{algo}|{size}|{shape}"
    want = golden[key]
    sp = PROFILES[size]
    opts = ChunkerOpts(sp.min, sp.max, sp.normal, FIXED_KEY if algo == "kfastcdc" else None)
    data = shape_bytes(shape)
    lengths = chunk_lengths(algo, data, opts).tolist()
    got = fingerprint(lengths, data)
    assert got == (want["chunks"], want["cuts_hash"], want["content"]), key
    # Reconstruction invariant (golden_test.go:70-72): lengths tile the input.
    assert sum(lengths) == len(data)


def _cases(full: bool):
    for algo in ALGOS:
        for size in SIZES:
            for shape in SHAPES:
                if not full and not (size == "2K-8K-64K" or shape in CHEAP_SHAPES):
                    continue
                yield algo, size, shape


@pytest.mark.parametrize("algo,size,shape", list(_cases(full=False)))
def test_golden_default(golden, algo, size, shape):
    _check(golden, algo, size, shape)


@pytest.mark.slow
@pytest.mark.parametrize("algo,size,shape", list(_cases(full=True)))
def test_golden_full(golden, algo, size, shape):
    _check(golden, algo, size, shape)


# --- repo-local goldens for variants the reference golden.json omits ------
# jc-v1.1.0 / ultracdc-v1.0.0 / fixed-v1.0.0 have no reference fingerprints
# (buffer_test.go:64-114 covers them with spot cases only). Fingerprints in
# tests/data/golden_local.json are pinned from the SCALAR ORACLE
# (plakar_ray/oracle.py) by tools/gen_local_golden.py over the same shapes.

LOCAL_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "golden_local.json")
LOCAL_ALGOS = ["jc-v1.1.0", "ultracdc-v1.0.0", "fixed-v1.0.0"]


@pytest.fixture(scope="module")
def golden_local():
    if not os.path.exists(LOCAL_GOLDEN_PATH):
        pytest.skip("tests/data/golden_local.json not generated")
    return json.load(open(LOCAL_GOLDEN_PATH))


def _local_cases(full: bool):
    for algo in LOCAL_ALGOS:
        for size in SIZES:
            for shape in SHAPES:
                if not full and not (size == "2K-8K-64K" or shape in CHEAP_SHAPES):
                    continue
                yield algo, size, shape


@pytest.mark.parametrize("algo,size,shape", list(_local_cases(full=False)))
def test_golden_local_default(golden_local, algo, size, shape):
    _check(golden_local, algo, size, shape)


@pytest.mark.slow
@pytest.mark.parametrize("algo,size,shape", list(_local_cases(full=True)))
def test_golden_local_full(golden_local, algo, size, shape):
    _check(golden_local, algo, size, shape)
