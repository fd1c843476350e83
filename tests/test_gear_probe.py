"""Keyed-Gear derivation probe: the table must be identical whether the
native blake3 wheel or the pure-Python fallback runs the derivation
(reference chunkers/fastcdc/fastcdc.go:43-75). This environment has no
wheel, so the wheel path is exercised with a mock that routes to the spec
implementation through the WHEEL's API surface — a future environment
flip (wheel appears, or API drifts) cannot silently change tables."""

import sys
import types

import numpy as np
import pytest


@pytest.fixture()
def clean_gear_cache():
    from plakar_ray import gear

    saved = dict(gear._keyed_cache)
    gear._keyed_cache.clear()
    yield gear
    gear._keyed_cache.clear()
    gear._keyed_cache.update(saved)


KEY = bytes(range(32))


def _derive(gear, monkeypatch, blake3_module):
    if blake3_module is None:
        # sys.modules[name] = None makes `import blake3` raise ImportError:
        # the forced pure-Python fallback, regardless of the environment
        monkeypatch.setitem(sys.modules, "blake3", None)
    else:
        monkeypatch.setitem(sys.modules, "blake3", blake3_module)
    gear._keyed_cache.clear()
    return gear.get_gear_table(KEY).copy()


def _fake_wheel():
    """A mock `blake3` wheel: the wheel's constructor/digest API, backed by
    the spec implementation."""
    from plakar_ray.functions.blake3_pure import blake3 as b3

    class blake3:  # noqa: N801 — the wheel exposes a lowercase class
        def __init__(self, data=b"", key=None):
            self._data = bytes(data)
            self._key = key

        def digest(self, length=32):
            return b3(self._data, key=self._key, out_len=length)

    mod = types.ModuleType("blake3")
    mod.blake3 = blake3
    return mod


def test_forced_fallback_derives(clean_gear_cache, monkeypatch):
    gear = clean_gear_cache
    t = _derive(gear, monkeypatch, None)
    assert t.shape == (256,) and t.dtype == np.uint64
    assert not np.array_equal(t, gear.GEAR)  # keyed table != static table
    # second call hits the process cache (same object, no re-derivation)
    again = gear.get_gear_table(KEY)
    assert again is gear._keyed_cache[next(iter(gear._keyed_cache))]


def test_wheel_and_fallback_agree(clean_gear_cache, monkeypatch):
    gear = clean_gear_cache
    via_fallback = _derive(gear, monkeypatch, None)
    via_wheel = _derive(gear, monkeypatch, _fake_wheel())
    assert np.array_equal(via_fallback, via_wheel)


def test_distinct_keys_distinct_tables(clean_gear_cache, monkeypatch):
    gear = clean_gear_cache
    monkeypatch.setitem(sys.modules, "blake3", None)
    a = gear.get_gear_table(KEY)
    b = gear.get_gear_table(bytes(32))
    assert not np.array_equal(a, b)
