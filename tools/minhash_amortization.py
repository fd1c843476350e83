"""Decompose the flagship minhash+LSH scaling row into fixed exchange
tail + scalable compute, then measure the AMORTIZED efficiency.

The round-3 campaign measured minhash 4->16 efficiency at median 0.688 on
the 8 GiB page corpus. The Amdahl model says: if the distributed band
exchange carries a fixed per-job tail f (aggregator startup, exchange
barrier, driver count) and compute scales ~1.0, then

    eff(corpus) = (c4 + f) / (c4/4 + f) / 4 = (c4 + f) / (c4 + 4 f)

which FALLS as compute gets faster at fixed corpus size — the native
round-3 kernels made the 8 GiB run short enough that f dominates. A 100 TB
deployment stage runs for minutes per shard; f is paid once per job.

This probe measures, per CPU level, in fresh processes:
  1. the fixed tail f: bench_minhash on a 64 MiB corpus (compute ~0)
  2. the amortized row: bench_minhash on a 24 GiB corpus
and reports both efficiencies plus the Amdahl prediction for 8 GiB from
the measured (f, compute-rate) — a cross-check against the campaign's
measured 0.688.

Usage: python tools/minhash_amortization.py [big_docs]   (default 393216)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC_BYTES = 65536
TINY_DOCS = 1024  # 64 MiB: exchange tail with ~zero compute


def child(num_cpus: int, docs: int) -> None:
    os.environ["BENCH_DOCS"] = str(docs)
    os.environ["BENCH_DOC_BYTES"] = str(DOC_BYTES)
    os.environ["BENCH_DUP_FRAC"] = "0.125"
    os.environ["RAY_GRAFT_CPUS"] = str(num_cpus)
    sys.path.insert(0, REPO)
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        object_store_memory=50 * 1024**3,
        logging_level="error",
    )
    import bench

    def steal_snap():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return (v[7] if len(v) > 7 else 0), sum(v)

    corpus = bench.synthetic_corpus(num_cpus)
    s0, t0 = steal_snap()
    runs = [bench.bench_minhash(corpus, num_cpus) for _ in range(2)]
    s1, t1 = steal_snap()
    best = max(runs, key=lambda r: r["mb_per_s"])
    best["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1)
    best["walls"] = [r["wall_s"] for r in runs]
    print("CHILD_JSON " + json.dumps(best), flush=True)
    ray.shutdown()


def run_child(num_cpus: int, docs: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           str(num_cpus), str(docs)]
    if shutil.which("taskset"):
        # Pin the child (Ray inherits) to exactly num_cpus host CPUs so
        # the low level's aggregators/driver can't free-ride on idle host
        # cores — the local-mode artifact that deflates 4->16 ratios.
        cmd = ["taskset", "-c", f"0-{num_cpus - 1}"] + cmd
    p = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON ")]
    if not lines:
        raise RuntimeError(f"child {num_cpus}cpu/{docs}docs failed: {p.stderr[-2000:]}")
    return json.loads(lines[-1][len("CHILD_JSON ") :])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    big_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 393216
    tag = sys.argv[2] if len(sys.argv) > 2 else "r3"
    out: dict = {"doc_bytes": DOC_BYTES, "tiny_docs": TINY_DOCS, "big_docs": big_docs}

    def clean_child(level: int, docs: int, attempts: int = 3) -> dict:
        """Retry a leg whose window lost >10% of cycles to the hypervisor
        (measuring the neighbor, not the engine); keep the last attempt if
        none comes back clean, flagged via its recorded steal_pct."""
        r = run_child(level, docs)
        for _ in range(attempts - 1):
            if r["steal_pct"] <= 10.0:
                break
            print(f"  steal {r['steal_pct']}% > 10% at {level} cpus, retrying...",
                  flush=True)
            time.sleep(120)
            r = run_child(level, docs)
        return r

    for level in (4, 16):
        tiny = clean_child(level, TINY_DOCS)
        big = clean_child(level, big_docs)
        out[f"tail_s_{level}cpu"] = tiny["wall_s"]
        out[f"big_wall_s_{level}cpu"] = big["wall_s"]
        out[f"big_mbps_{level}cpu"] = big["mb_per_s"]
        out[f"steal_pct_{level}cpu"] = max(tiny["steal_pct"], big["steal_pct"])
        out[f"runs_{level}cpu"] = {"tiny": tiny["walls"], "big": big["walls"]}
        print(
            f"{level} cpus: tail {tiny['wall_s']:.2f} s, "
            f"{big_docs * DOC_BYTES / 1e9:.0f} GB in {big['wall_s']:.1f} s "
            f"({big['mb_per_s']:.0f} MB/s), steal {out[f'steal_pct_{level}cpu']}%",
            flush=True,
        )
    out["amortized_efficiency"] = round(
        out["big_mbps_16cpu"] / (4 * out["big_mbps_4cpu"]), 3
    )
    # Amdahl cross-check at the campaign's 8 GiB: c4 from the big run's
    # compute portion, f from the measured tails.
    gb = big_docs * DOC_BYTES / 1e9
    c4_rate = (gb * 1000) / (out["big_wall_s_4cpu"] - out["tail_s_4cpu"])  # MB/s
    c4_8g = 8.192 * 1000 / c4_rate  # seconds of 4-cpu compute on 8 GiB
    f4, f16 = out["tail_s_4cpu"], out["tail_s_16cpu"]
    pred = (c4_8g + f4) / (4 * (c4_8g / 4 + f16))
    out["amdahl_predicted_8gib_efficiency"] = round(pred, 3)
    out["campaign_measured_8gib_median"] = 0.688
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "BENCH", f"minhash_amortization_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
