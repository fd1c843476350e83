"""Gear rolling-hash tables.

The static 256-entry Gear table shared by the FastCDC and JC families
(byte-identical in the reference: chunkers/fastcdc/fastcdc_precomputed.go:4-261
== chunkers/jc/jc_precomputed.go:4-261) and the 64-bit Stadia gear table
(chunkers/fastcdc4stadia/fastcdc4stadia.go:152-238). Stored once as pure data
in data/gear_tables.json.

Keyed (per-key BLAKE3-derived) tables — reference
chunkers/fastcdc/fastcdc.go:43-75 — are feature-gated: this environment has no
blake3 module, so keyed derivation raises unless `blake3` is importable. The
process-wide cache mirrors the reference's keyedTableCache semantics.
"""

from __future__ import annotations

import json
import os

import numpy as np

_DATA = os.path.join(os.path.dirname(__file__), "data", "gear_tables.json")

with open(_DATA) as _f:
    _tables = json.load(_f)

# Static Gear table G (fastcdc + jc families), dtype uint64, read-only.
GEAR: np.ndarray = np.array(_tables["gear"], dtype=np.uint64)
GEAR.flags.writeable = False

# FastCDC4Stadia 64-bit gear table.
GEAR64_STADIA: np.ndarray = np.array(_tables["gear64_stadia"], dtype=np.uint64)
GEAR64_STADIA.flags.writeable = False

MASK64 = 0xFFFFFFFFFFFFFFFF

# Process-wide cache of key-derived tables, keyed by blake3-256(key) like the
# reference's keyedTableCache (fastcdc.go:29-37). One derivation per key per
# worker process; actors share it module-level.
_keyed_cache: dict[bytes, np.ndarray] = {}


def has_blake3() -> bool:
    """Keyed chunking is always available: the native blake3 wheel is used
    when importable, else the pure-Python spec implementation (the
    derivation runs once per key, 2 KiB of output)."""
    return True


def _blake3_digest(data: bytes, key: bytes | None, out_len: int) -> bytes:
    try:
        import blake3

        h = blake3.blake3(data, key=key) if key is not None else blake3.blake3(data)
        return h.digest(length=out_len)
    except ImportError:
        from plakar_ray.functions.blake3_pure import blake3 as b3

        return b3(data, key=key, out_len=out_len)


def get_gear_table(key: bytes | None) -> np.ndarray:
    """Return the Gear table for `key` (reference fastcdc.go:43-75).

    key=None -> the shared static table. Otherwise a BLAKE3-keyed-XOF-derived
    256xuint64 table: feed the static table entries little-endian into a keyed
    hasher, read 2048 bytes of XOF output, reinterpret little-endian uint64.
    """
    if key is None:
        return GEAR
    cache_key = _blake3_digest(key, None, 32)
    cached = _keyed_cache.get(cache_key)
    if cached is not None:
        return cached
    msg = b"".join(int(v).to_bytes(8, "little") for v in GEAR.tolist())
    raw = _blake3_digest(msg, key, 8 * 256)
    table = np.frombuffer(raw, dtype="<u8").astype(np.uint64)
    table.flags.writeable = False
    _keyed_cache[cache_key] = table
    return table
