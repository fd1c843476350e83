"""Go math/rand parity (plakar_ray.goprng vs known Go outputs)."""

import hashlib

from plakar_ray.goprng import GoRand, go_rand_bytes


def test_seed1_known_int63():
    # rand.New(rand.NewSource(1)).Int63() — documented Go output.
    assert GoRand(1).int63() == 5577006791947779410


def test_tiny64_matches_reference_golden():
    # sha256 of the harness's rnd(64) (tests/harness_test.go:101-107) as
    # recorded in the reference's tests/testdata/golden.json "tiny-64" content.
    got = hashlib.sha256(go_rand_bytes(0, 64)).hexdigest()
    assert got == "565966bd0e0cedaa92f154c2d17abfa4c5f98a668cef2e20b0855558e0583db9"


def test_read_carry_across_calls():
    # Read 7 bytes per Int63 with carry: two reads == one read of the sum.
    r1 = GoRand(7)
    a = r1.read(5) + r1.read(9)
    assert a == GoRand(7).read(14)


def test_block_vectorized_equals_scalar():
    # The >=7-byte bulk path must equal the byte-at-a-time Int63 loop.
    scalar = GoRand(3)
    out = bytearray()
    while len(out) < 4000:
        if scalar._read_pos == 0:
            scalar._read_val = scalar.int63()
            scalar._read_pos = 7
        out.append(scalar._read_val & 0xFF)
        scalar._read_val >>= 8
        scalar._read_pos -= 1
    assert GoRand(3).read(4000) == bytes(out)


def test_blake3_pure_spec_vectors():
    from plakar_ray.functions.blake3_pure import blake3

    assert (
        blake3(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    # XOF prefix property + multi-block XOF length
    assert blake3(b"abc", out_len=96)[:32] == blake3(b"abc")
    assert len(blake3(b"abc", out_len=2048)) == 2048


def test_keyed_gear_table_cache():
    # geartable_cache_test.go semantics: same key -> same cached table,
    # different key -> different table, keyed != static.
    import numpy as np

    from plakar_ray.gear import GEAR, get_gear_table

    k1 = bytes(range(32))
    k2 = bytes(range(1, 33))
    t1 = get_gear_table(k1)
    t1b = get_gear_table(k1)
    assert t1 is t1b  # process-wide cache hit
    t2 = get_gear_table(k2)
    assert not np.array_equal(t1, t2)
    assert not np.array_equal(t1, GEAR)
    assert get_gear_table(None) is GEAR
