"""Option defaulting, validation and mask/jump derivation parity.

Expected constants cross-checked against the reference's own unit tests
(chunkers/fastcdc/fastcdc_test.go mask assertions, jc_test.go jump/mask
assertions) and Setup logic (fastcdc.go:167-193, jc.go:157-181).
"""

import pytest

from plakar_ray.opts import (
    ChunkerOpts,
    FASTCDC_LEGACY_MASK_L,
    FASTCDC_LEGACY_MASK_S,
    JC_LEGACY_MASK_C,
    JC_LEGACY_MASK_J,
    OptionError,
    calculate_fastcdc_masks,
    embed_mask,
    fastcdc_masks,
    generate_spaced_mask,
    jc_jump_length,
    jc_masks,
    validate_fastcdc,
    validate_fixed,
    validate_triple,
)
from plakar_ray.registry import get_algorithm


def test_spaced_mask_edges():
    assert generate_spaced_mask(0) == 0
    assert generate_spaced_mask(-3) == 0
    assert generate_spaced_mask(64) == 0xFFFFFFFFFFFFFFFF
    assert generate_spaced_mask(100) == 0xFFFFFFFFFFFFFFFF
    # one bit lands at the MSB
    assert generate_spaced_mask(1) == 1 << 63


def test_spaced_mask_bit_counts():
    for n in range(1, 64):
        assert bin(generate_spaced_mask(n)).count("1") == n


def test_fastcdc_default_triple_uses_legacy_masks():
    opts = ChunkerOpts(2048, 65536, 8192)
    assert fastcdc_masks(opts, legacy=False) == (FASTCDC_LEGACY_MASK_S, FASTCDC_LEGACY_MASK_L)
    assert fastcdc_masks(opts, legacy=True) == (FASTCDC_LEGACY_MASK_S, FASTCDC_LEGACY_MASK_L)


def test_fastcdc_spaced_masks_for_nondefault():
    opts = ChunkerOpts(1024, 32768, 4096)  # normal 4096 -> bits 12
    ms, ml = fastcdc_masks(opts, legacy=False)
    assert ms == generate_spaced_mask(14)
    assert ml == generate_spaced_mask(10)
    assert (ms, ml) == calculate_fastcdc_masks(4096, 2)


def test_legacy_always_legacy_masks():
    opts = ChunkerOpts(1024, 32768, 4096)
    assert fastcdc_masks(opts, legacy=True) == (FASTCDC_LEGACY_MASK_S, FASTCDC_LEGACY_MASK_L)


def test_jc_masks_and_jump():
    opts = ChunkerOpts(2048, 65536, 8192)
    assert jc_masks(opts, legacy=False) == (JC_LEGACY_MASK_C, JC_LEGACY_MASK_J)
    # jumpLength for normal=8192: c=12, j=11 -> 2^23/(2^12-2^11) = 4096
    assert jc_jump_length(8192) == 4096
    assert jc_jump_length(4096) == 2048
    # non-default: spaced mask with bits-1 ones; maskJ unsets the lowest 1.
    opts2 = ChunkerOpts(1024, 32768, 4096)
    mc, mj = jc_masks(opts2, legacy=False)
    assert mc == generate_spaced_mask(11)
    assert mj == embed_mask(mc)
    assert bin(mj).count("1") == bin(mc).count("1") - 1
    assert mj & mc == mj


def test_embed_mask_zero():
    assert embed_mask(0) == 0


def test_validate_triple_errors():
    with pytest.raises(OptionError):
        validate_triple(ChunkerOpts(0, 65536, 8192))
    with pytest.raises(OptionError):
        validate_triple(ChunkerOpts(8192, 65536, 8192))  # min >= normal
    with pytest.raises(OptionError):
        validate_triple(ChunkerOpts(2048, 8192, 8192))  # max <= normal
    with pytest.raises(OptionError):
        validate_triple(ChunkerOpts(2048, 65536, 0))
    validate_triple(ChunkerOpts(2048, 65536, 8192))


def test_validate_fastcdc_power_of_two():
    with pytest.raises(OptionError):
        validate_fastcdc(ChunkerOpts(2048, 65536, 8193), keyed=False)
    with pytest.raises(OptionError):
        validate_fastcdc(ChunkerOpts(2048, 65536, 8192), keyed=True)  # no key


def test_validate_fixed():
    validate_fixed(ChunkerOpts(4096, 4096, 4096))
    with pytest.raises(OptionError):
        validate_fixed(ChunkerOpts(4096, 4096, 4095))
    with pytest.raises(OptionError):
        validate_fixed(ChunkerOpts(4096, 8192, 4096))


def test_option_defaulting():
    spec = get_algorithm("fastcdc")
    o = spec.resolve_opts(None)
    assert (o.min_size, o.normal_size, o.max_size) == (2048, 8192, 65536)
    o = spec.resolve_opts(ChunkerOpts(min_size=4096))
    assert (o.min_size, o.normal_size, o.max_size) == (4096, 8192, 65536)
    u = get_algorithm("ultracdc").resolve_opts(None)
    assert u.normal_size == 10 * 1024
    f = get_algorithm("fixed-v1.0.0").resolve_opts(ChunkerOpts(normal_size=4096))
    assert (f.min_size, f.normal_size, f.max_size) == (4096, 4096, 4096)


def test_registry_duplicate_rejected():
    from plakar_ray.registry import ALGORITHMS, register_chunker

    spec = ALGORITHMS["fastcdc"]
    with pytest.raises(ValueError):
        register_chunker(spec)


def test_registry_names_verbatim():
    from plakar_ray.registry import ALGORITHMS

    assert set(ALGORITHMS) >= {
        "fastcdc", "kfastcdc", "fastcdc-v1.0.0",
        "jc", "jc-v1.0.0", "jc-v1.1.0",
        "ultracdc", "ultracdc-v1.0.0",
        "fastcdc4stadia", "fixed-v1.0.0",
    }


def test_unknown_algorithm():
    from plakar_ray.registry import get_algorithm

    with pytest.raises(KeyError):
        get_algorithm("nope-v9")


def test_chunk_lengths_accepts_bytes_and_arrays():
    import numpy as np

    from plakar_ray.registry import chunk_lengths

    data = b"x" * 5000
    a = chunk_lengths("fastcdc-v1.0.0", data, ChunkerOpts(64, 2048, 256))
    b = chunk_lengths(
        "fastcdc-v1.0.0", np.frombuffer(data, dtype=np.uint8), ChunkerOpts(64, 2048, 256)
    )
    assert a.tolist() == b.tolist()
