"""Generate repo-local golden fingerprints for the registry variants the
reference's tests/testdata/golden.json omits (jc-v1.1.0, ultracdc-v1.0.0,
fixed-v1.0.0 — the reference covers these only via buffer_test.go:64-114
spot cases, not golden fingerprints).

Fingerprints are produced by the SCALAR ORACLE (plakar_ray/oracle.py — the
line-by-line spec port used by the differential suite), NOT the vectorized
kernels under test, over the exact harness input shapes/profiles of
tests/test_golden.py. Output: tests/data/golden_local.json, same record
format as the reference golden.json. Run once; the file is committed.

    python tools/gen_local_golden.py
"""

import hashlib
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALGOS = ["jc-v1.1.0", "ultracdc-v1.0.0", "fixed-v1.0.0"]
SIZES = ["2K-8K-64K", "256K-512K-1M", "1M-4M-16M"]
SHAPES = [
    "empty", "one-byte", "tiny-64",
    "random-3x-maxmax", "zeros-2x-maxmax", "repeat-2x-maxmax",
]


def one_case(args):
    algo, size, shape = args
    from plakar_ray.opts import PROFILES, ChunkerOpts
    from plakar_ray.oracle import chunk_lengths_oracle

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_golden import shape_bytes

    sp = PROFILES[size]
    opts = ChunkerOpts(sp.min, sp.max, sp.normal)
    data = shape_bytes(shape)
    lengths = chunk_lengths_oracle(algo, data, opts)
    assert sum(lengths) == len(data), (algo, size, shape)
    h = hashlib.sha256()
    for l in lengths:
        h.update(int(l).to_bytes(8, "little"))
    return f"{algo}|{size}|{shape}", {
        "chunks": len(lengths),
        "cuts_hash": h.hexdigest(),
        "content": hashlib.sha256(data).hexdigest(),
    }


def main():
    cases = [(a, s, sh) for a in ALGOS for s in SIZES for sh in SHAPES]
    out = {}
    with ProcessPoolExecutor(max_workers=min(32, os.cpu_count() or 8)) as ex:
        for key, rec in ex.map(one_case, cases):
            out[key] = rec
            print(key, rec["chunks"], flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "golden_local.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path, len(out), "cases")


if __name__ == "__main__":
    main()
