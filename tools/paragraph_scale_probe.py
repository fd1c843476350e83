"""Two-level scaling probe for the paragraph-dedup family
(pipelines/paragraphs.py) — the CCNet line-dedup workload at web shape.

Corpus: N_DOCS x ~DOC_BYTES pages, each a newline-join of ~240-char
paragraphs; DUP_FRAC of the paragraphs are drawn from a shared pool of
POOL_SIZE boilerplate paragraphs (the duplication structure the clean
transform exists for: hot boilerplate keys + a long unique tail).

The probe runs `paragraph_dedup_clean(local_threshold=0)` — both packed
exchanges forced — in FRESH processes pinned with `taskset` to CPUs
0..n-1 at two levels (N and 4N, the sandbox stand-in for the north
rule's two cluster sizes), and reports throughput at both plus
efficiency = t_low / (4 * t_high). Result equality across levels is
asserted via (sum removed_paras, sum kept_bytes, XOR of md5u64 over the
per-doc cleaned-text md5s) — the same certificate family the
corpus_prep oracle checks.

Usage: python tools/paragraph_scale_probe.py [out.json]
Env: PROBE_DOCS (16384), PROBE_DOC_BYTES (65536), BENCH_SCALE_N (4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("PROBE_DOCS", "16384"))
DOC_BYTES = int(os.environ.get("PROBE_DOC_BYTES", str(64 * 1024)))
PARA_CHARS = 240
POOL_SIZE = 4096
DUP_FRAC = 0.25


def _steal_snap():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return (v[7] if len(v) > 7 else 0), sum(v)


def _pool():
    rng = np.random.default_rng(31337)
    return [
        rng.integers(32, 127, PARA_CHARS, dtype=np.uint8).tobytes().decode("ascii")
        for _ in range(POOL_SIZE)
    ]


def corpus(num_cpus: int):
    import ray.data

    paras_per_doc = max(2, DOC_BYTES // (PARA_CHARS + 1))
    pool = _pool()

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        texts = []
        for i in ids:
            rng = np.random.default_rng(5000 + i)
            parts = []
            for j in range(paras_per_doc):
                if rng.random() < DUP_FRAC:
                    parts.append(pool[int(rng.integers(0, POOL_SIZE))])
                else:
                    parts.append(
                        rng.integers(32, 127, PARA_CHARS, dtype=np.uint8)
                        .tobytes()
                        .decode("ascii")
                    )
            texts.append("\n".join(parts))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
        )

    per_block = max(1, (64 * 1024 * 1024) // DOC_BYTES)
    n_blocks = max(num_cpus, (N_DOCS + per_block - 1) // per_block)
    return (
        ray.data.range(N_DOCS, override_num_blocks=n_blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=per_block)
        .materialize()
    )


def child(num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="error",
    )
    from plakar_ray.pipelines.paragraphs import paragraph_dedup_clean
    from plakar_ray.pipelines.prep import _hex16_to_u64le

    ds = corpus(num_cpus)
    total_bytes = int(N_DOCS * (DOC_BYTES // (PARA_CHARS + 1)) * (PARA_CHARS + 1))

    s0, t0c = _steal_snap()
    t0 = time.time()
    out = paragraph_dedup_clean(ds, local_threshold=0)
    tables = [
        b for b in out.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)
    ]
    wall = time.time() - t0
    s1, t1c = _steal_snap()

    t = pa.concat_tables(tables)
    md5 = np.asarray(t.column("cleaned_md5").to_numpy(zero_copy_only=False), dtype="S32")
    xor = int(np.bitwise_xor.reduce(_hex16_to_u64le(md5))) if md5.size else 0
    r = {
        "num_cpus": num_cpus,
        "wall_s": round(wall, 3),
        "mb_per_s": round(total_bytes / wall / 1e6, 1),
        "docs": int(t.num_rows),
        "removed_paras": int(
            pa.compute.sum(t.column("removed_paras")).as_py() or 0
        ),
        "kept_bytes": int(pa.compute.sum(t.column("kept_bytes")).as_py() or 0),
        "md5_xor": f"{xor:016x}",
        "steal_pct": round(100.0 * (s1 - s0) / max(t1c - t0c, 1), 1),
    }
    ray.shutdown()
    return r


def main():
    if "--child" in sys.argv:
        n = int(sys.argv[sys.argv.index("--child") + 1])
        print("CHILD_JSON " + json.dumps(child(n)))
        return

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/paragraph_scale_r4.json"
    n_low = int(os.environ.get("BENCH_SCALE_N", "4"))
    repeats = int(os.environ.get("PROBE_REPEATS", "3"))
    levels = (n_low, 4 * n_low)
    runs: dict[int, list[dict]] = {n: [] for n in levels}
    for rep in range(repeats):
        for n in levels:
            cmd = [
                "taskset",
                "-c",
                f"0-{n - 1}",
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                str(n),
            ]
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            p = subprocess.run(cmd, capture_output=True, text=True, env=env)
            line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON ")]
            if not line:
                print(p.stdout[-2000:], p.stderr[-2000:])
                raise SystemExit(f"child at {n} cpus produced no result")
            r = json.loads(line[0][len("CHILD_JSON ") :])
            runs[n].append(r)
            print(f"rep={rep} n={n}: {r}")

    certs = {(r["md5_xor"], r["removed_paras"]) for rs in runs.values() for r in rs}
    assert len(certs) == 1, f"results differ across runs/levels: {certs}"
    results = {}
    for n in levels:
        med = sorted(runs[n], key=lambda r: r["wall_s"])[len(runs[n]) // 2]
        med = dict(med, wall_s_all_runs=[r["wall_s"] for r in runs[n]])
        results[n] = med
    lo, hi = results[levels[0]], results[levels[1]]
    summary = {
        "stage": "paragraph_dedup_clean (local_threshold=0, packed election exchange + broadcast-removals rebuild)",
        "corpus": f"{N_DOCS} x {DOC_BYTES}B docs, {DUP_FRAC:.0%} pooled boilerplate paragraphs",
        "repeats": repeats,
        "levels": {str(k): v for k, v in results.items()},
        "efficiency": round(lo["wall_s"] / (4.0 * hi["wall_s"]), 3),
        "results_equal_across_levels": True,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
