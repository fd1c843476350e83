"""Kill-and-resume demonstration of the checkpoint-resumable flagship at
corpus scale — evidence for the north rule's "resumable from checkpoint
with per-partition lineage + metrics".

1. Generates a sharded web-page-shaped corpus (printable-ASCII pages with
   cross-shard planted duplicates) under /tmp/resume_demo/shards.
2. Launches the resumable flagship (pipelines/dedup.near_dup_clusters_resumable)
   in a CHILD process and SIGKILLs it once some — not all — signature-shard
   manifests exist (a real mid-job crash, including possible in-flight
   parquet writes: the lineage layer's atomic rename must discard them).
3. Resumes in-process against the same checkpoint dir, recording how many
   shards were skipped (resumed) vs re-run.
4. Verifies the resumed cluster table EQUALS a clean one-shot
   near_dup_clusters run on the same corpus.

Artifact: BENCH/resume_demo_r{N}.json.

Usage: python tools/resume_demo.py [--shards 12] [--docs 2048] [--doc-kb 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHARD_DIR = "/tmp/resume_demo/shards"
CKPT_DIR = "/tmp/resume_demo/ckpt"

ALGO = "fastcdc"
NUM_PERM = 64
BANDS = 16


def _opts():
    from plakar_ray.opts import ChunkerOpts

    return ChunkerOpts(512, 16384, 2048)


def make_corpus(n_shards: int, docs_per_shard: int, doc_kb: int) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SHARD_DIR, exist_ok=True)
    doc_bytes = doc_kb << 10
    paths = []
    base_rng = np.random.default_rng(7)
    shard0 = base_rng.integers(32, 127, size=(docs_per_shard, doc_bytes), dtype=np.uint8)
    for k in range(n_shards):
        rng = np.random.default_rng(1000 + k)
        pages = rng.integers(32, 127, size=(docs_per_shard, doc_bytes), dtype=np.uint8)
        if k > 0:
            # ~1/8 of docs duplicate the same row of shard 0 (cross-shard
            # dups: candidate edges must survive the global band exchange)
            dup = rng.random(docs_per_shard) < 0.125
            pages[dup] = shard0[dup]
        texts = [bytes(row).decode("ascii") for row in pages]
        ids = np.arange(docs_per_shard, dtype=np.int64) + k * docs_per_shard
        path = os.path.join(SHARD_DIR, f"shard_{k:04d}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}), path
        )
        paths.append(path)
    return paths


CHILD_SNIPPET = """
import sys, glob
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False, logging_level="ERROR")
from plakar_ray.pipelines.dedup import near_dup_clusters_resumable
from tools.resume_demo import ALGO, BANDS, NUM_PERM, CKPT_DIR, SHARD_DIR, _opts
near_dup_clusters_resumable(
    sorted(glob.glob(SHARD_DIR + "/*.parquet")), CKPT_DIR,
    algo=ALGO, opts=_opts(), num_perm=NUM_PERM, bands=BANDS,
)
"""


def count_manifest_parts() -> int:
    import glob

    return len(glob.glob(os.path.join(CKPT_DIR, "signatures", "_manifest", "*.json")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=48)
    ap.add_argument("--docs", type=int, default=512)
    ap.add_argument("--doc-kb", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--out", default="BENCH/resume_demo_r2.json")
    args = ap.parse_args()

    shutil.rmtree("/tmp/resume_demo", ignore_errors=True)
    paths = make_corpus(args.shards, args.docs, args.doc_kb)
    corpus_mb = args.shards * args.docs * args.doc_kb / 1024.0
    print(f"corpus: {args.shards} shards, {corpus_mb:.0f} MB", flush=True)

    # --- crash a child mid-job once >=3 shard manifests are durable -------
    child = subprocess.Popen(
        [sys.executable, "-c", CHILD_SNIPPET.format(cpus=max(2, args.cpus // 4))],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    while time.time() - t0 < 600:
        done = count_manifest_parts()
        if done >= max(3, args.shards // 8):
            break
        if child.poll() is not None:
            break
        time.sleep(0.05)
    killed_at = count_manifest_parts()
    if child.poll() is None:
        child.send_signal(signal.SIGKILL)
        child.wait()
    print(f"child killed with {killed_at}/{args.shards} shard manifests", flush=True)

    # --- resume in-process -----------------------------------------------
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from plakar_ray.pipelines.dedup import near_dup_clusters, near_dup_clusters_resumable
    from plakar_ray.state.lineage import LineageLog

    t1 = time.time()
    resumed = near_dup_clusters_resumable(
        paths, CKPT_DIR, algo=ALGO, opts=_opts(), num_perm=NUM_PERM, bands=BANDS
    )
    resume_s = time.time() - t1
    manifest = LineageLog(CKPT_DIR, "signatures").manifest()
    skipped = killed_at  # shards durable before the kill are skipped on resume

    # --- clean one-shot reference ----------------------------------------
    import ray.data

    t2 = time.time()
    oneshot = near_dup_clusters(
        ray.data.read_parquet(paths), ALGO, _opts(), num_perm=NUM_PERM, bands=BANDS
    )
    oneshot_s = time.time() - t2

    equal = resumed.equals(oneshot)
    n_dup_docs = resumed.num_rows
    print(f"resume {resume_s:.1f}s (skipped {skipped} shards) vs one-shot "
          f"{oneshot_s:.1f}s; clusters rows={n_dup_docs} equal={equal}", flush=True)
    out = {
        "metric": "resume_equals_oneshot",
        "value": bool(equal),
        "corpus_mb": corpus_mb,
        "shards": args.shards,
        "manifests_at_kill": killed_at,
        "manifest_rows_after_resume": len(manifest),
        "resume_wall_s": round(resume_s, 1),
        "oneshot_wall_s": round(oneshot_s, 1),
        "cluster_rows": int(n_dup_docs),
        "num_cpus": args.cpus,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if not equal:
        sys.exit(1)


if __name__ == "__main__":
    main()
