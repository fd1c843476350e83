"""Run bench.py --scaling N times and write a ROBUST headline artifact.

Addresses the round-1 advice: the headline machine-readable scaling file
must be a robust statistic over recorded runs, not the best-of. Each raw
run JSON is appended to BENCH/scaling_all_runs_r{R}.jsonl; the headline
BENCH/scaling_local_r{R}.json carries the MEDIAN efficiency with
best/min/n_runs alongside, plus per-metric medians for the signatures and
minhash (distributed LSH path) rows.

    python tools/run_scaling.py [n_runs] [round]
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rnd = sys.argv[2] if len(sys.argv) > 2 else "2"  # filename tag
    raw_path = os.path.join(REPO, "BENCH", f"scaling_all_runs_r{rnd}.jsonl")
    head_path = os.path.join(REPO, "BENCH", f"scaling_local_r{rnd}.json")
    os.makedirs(os.path.dirname(raw_path), exist_ok=True)

    # Hypervisor steal gate: a run where the host stole more than
    # STEAL_GATE_PCT of cycles during either child measures the neighbor's
    # load, not this engine's scaling. Such runs stay in the raw jsonl
    # (flagged "contended") but are excluded from the median statistics and
    # retried, up to 2x the requested run count.
    steal_gate = float(os.environ.get("STEAL_GATE_PCT", "10"))

    def is_contended(r):
        # Pre-gate rows without steal instrumentation can't prove they were
        # clean — treat them as contended so the headline only carries
        # steal-verified runs.
        vals = [v for k, v in r["queries"].items() if k.startswith("steal_pct")]
        if not vals:
            return True
        return max(vals) > steal_gate

    def preflight_steal(sample_s: float = 10.0) -> float:
        """Current host steal%, sampled before burning a 15-min attempt."""
        def snap():
            with open("/proc/stat") as f:
                v = [int(x) for x in f.readline().split()[1:]]
            return (v[7] if len(v) > 7 else 0), sum(v)
        s0, t0 = snap()
        time.sleep(sample_s)
        s1, t1 = snap()
        return 100.0 * (s1 - s0) / max(t1 - t0, 1)

    runs = []
    if os.path.exists(raw_path):
        with open(raw_path) as f:
            runs = [json.loads(l) for l in f if l.strip()]
    attempts, ok_new = 0, 0
    while ok_new < n_runs and attempts < 2 * n_runs:
        # Wait for a calm host (up to 30 min per attempt) instead of
        # spending 15 min measuring the neighbor's load.
        waited = 0.0
        while waited < 1800:
            s = preflight_steal()
            if s <= steal_gate:
                break
            print(f"preflight steal {s:.1f}% > {steal_gate}%, waiting...", flush=True)
            time.sleep(110)
            waited += 120
        attempts += 1
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
            capture_output=True, text=True, timeout=7200,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print("run failed:", p.stderr[-1000:])
            continue
        r = json.loads(line[-1])
        if is_contended(r):
            r["contended"] = True
        else:
            ok_new += 1
        runs.append(r)
        with open(raw_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(f"run {ok_new}/{n_runs} (attempt {attempts}): chunking={r['value']}",
              "CONTENDED" if r.get("contended") else "",
              {k: v for k, v in r["queries"].items()
               if "efficiency" in k or "steal" in k}, flush=True)

    clean = [r for r in runs if not r.get("contended") and not is_contended(r)]
    n_contended = len(runs) - len(clean)
    if not clean:
        clean = runs  # all contended: report them rather than nothing
    runs = clean
    if not runs:
        sys.exit(1)
    vals = sorted(r["value"] for r in runs)

    def med(key):
        xs = [r["queries"][key] for r in runs if key in r["queries"]]
        return round(statistics.median(xs), 3) if xs else None

    head = {
        "metric": runs[-1]["metric"],
        "value": round(statistics.median(vals), 3),
        "stat": "median",
        "best": max(vals),
        "min": min(vals),
        "n_runs": len(runs),
        "n_contended_excluded": n_contended,
        "steal_gate_pct": steal_gate,
        "unit": "ratio",
        "sf": runs[-1]["sf"],
        "num_cpus": runs[-1]["num_cpus"],
        "queries": {
            "signatures_efficiency_median": med("signatures_efficiency"),
            "minhash_efficiency_median": med("minhash_efficiency"),
            # concurrency-vs-memory study rows (reference README.md:116-132):
            # median peak RSS per stage at both worker counts.
            **{
                f"{k}_median": med(k)
                for k in sorted(runs[-1]["queries"])
                if "rss" in k
            },
            **runs[-1]["queries"],
        },
    }
    with open(head_path, "w") as f:
        json.dump(head, f, indent=1)
    print(json.dumps(head))


if __name__ == "__main__":
    main()
