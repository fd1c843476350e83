"""Chunking profiles: serialized (offset, length, digest) runs + strict
comparison — the analogue of the reference's CDCProfile golden oracle
(internal/testutil/testutil.go:19-111) and the cdcprofile/cdcprofilesbuild
tools (cmd/cdcprofile, cmd/cdcprofilesbuild).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import chunk_lengths

# The cdcprofilesbuild sweep grid (cmd/cdcprofilesbuild/cdcprofilesbuild.go:28-54).
PROFILE_SWEEP = [
    (2 * 1024, 8 * 1024, 32 * 1024),
    (4 * 1024, 16 * 1024, 64 * 1024),
    (8 * 1024, 32 * 1024, 128 * 1024),
    (12 * 1024, 48 * 1024, 192 * 1024),
    (16 * 1024, 64 * 1024, 256 * 1024),
]


def generate_profile(algo: str, data: bytes, opts: ChunkerOpts | None = None) -> pa.Table:
    """Full (chunk_idx, offset, length, digest) run over one byte stream,
    plus the global content digest in the table metadata."""
    from plakar_ray.stages.chunk import ChunkerStage

    lengths = chunk_lengths(algo, data, opts)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    d32 = ChunkerStage._digest_segments(
        lengths, np.frombuffer(data, dtype=np.uint8)
    )
    t = pa.table(
        {
            "chunk_idx": pa.array(np.arange(len(lengths), dtype=np.int32)),
            "offset": pa.array(starts, type=pa.int64()),
            "length": pa.array(lengths.astype(np.int32), type=pa.int32()),
            "digest": pa.Array.from_buffers(
                pa.binary(32), len(lengths), [None, pa.py_buffer(d32)]
            ),
        }
    )
    meta = {
        b"algorithm": algo.encode(),
        b"content_sha256": hashlib.sha256(data).hexdigest().encode(),
    }
    return t.replace_schema_metadata(meta)


def match_profile(profile: pa.Table, algo: str, data: bytes,
                  opts: ChunkerOpts | None = None) -> list[str]:
    """Strict positional comparison of a stored profile against a fresh run
    (testutil.MatchProfile semantics). Returns a list of mismatch
    descriptions (empty == match)."""
    fresh = generate_profile(algo, data, opts)
    errs: list[str] = []
    if profile.num_rows != fresh.num_rows:
        errs.append(f"chunk count {profile.num_rows} != {fresh.num_rows}")
    meta = profile.schema.metadata or {}
    if meta.get(b"content_sha256") != (fresh.schema.metadata or {}).get(b"content_sha256"):
        errs.append("content digest mismatch")
    n = min(profile.num_rows, fresh.num_rows)
    for col in ("offset", "length", "digest"):
        a = profile.column(col).to_pylist()[:n]
        b = fresh.column(col).to_pylist()[:n]
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                errs.append(f"chunk {i}: {col} {x!r} != {y!r}")
                break
    return errs


def build_profiles(data: bytes, algos: list[str] | None = None) -> dict[str, pa.Table]:
    """cdcprofilesbuild: sweep algorithms x PROFILE_SWEEP size triples."""
    if algos is None:
        algos = ["fastcdc", "fastcdc-v1.0.0", "jc", "jc-v1.0.0", "ultracdc", "fastcdc4stadia"]
    out = {}
    for algo in algos:
        for mn, av, mx in PROFILE_SWEEP:
            key = f"{algo}|{mn//1024}K-{av//1024}K-{mx//1024}K"
            out[key] = generate_profile(algo, data, ChunkerOpts(mn, mx, av))
    return out
