"""Scale probe for the substring-dedup family (pipelines/dedup.py).

Runs `substring_dup_spans` with the winnowed scale path FORCED through the
distributed exchanges (local_threshold=0) on a web-page-shaped corpus with
planted shared spans, and records:

  - emitted gram rows vs the stride-1 count (the ~w/2-fold emission cut)
  - wall time + MB/s for the full two-exchange plan at 32 cpus
  - detection: every document carrying a planted span must be reported
    (spans are >= L + w - 1, so winnowing guarantees detection)

Usage: python tools/substring_scale_probe.py [out.json]
Corpus: N_DOCS x DOC_BYTES seeded printable pages; docs i with i % 4 in
{1, 2} embed their group's 4 KiB span at a doc-dependent offset, so every
group of 8 docs carries one cross-doc duplicated span at two unaligned
positions.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("PROBE_DOCS", "4096"))
DOC_BYTES = int(os.environ.get("PROBE_DOC_BYTES", str(64 * 1024)))
SPAN_BYTES = 4096
GRAM_LEN = 64
WINNOW_W = 32
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def corpus():
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        texts = []
        for i in ids:
            rng = np.random.default_rng(9000 + i)
            arr = rng.integers(32, 127, DOC_BYTES, dtype=np.uint8)
            if i % 4 in (1, 2):
                g = i // 8
                srng = np.random.default_rng(70000 + g)
                span = srng.integers(32, 127, SPAN_BYTES, dtype=np.uint8)
                off = int(
                    np.random.default_rng(80000 + i).integers(
                        0, DOC_BYTES - SPAN_BYTES
                    )
                )
                arr[off : off + SPAN_BYTES] = span
            texts.append(arr.tobytes().decode("ascii"))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
        )

    per_block = max(1, (64 * 1024 * 1024) // DOC_BYTES)
    n_blocks = max(NUM_CPUS, (N_DOCS + per_block - 1) // per_block)
    return (
        ray.data.range(N_DOCS, override_num_blocks=n_blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=per_block)
        .materialize()
    )


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="error",
    )
    import ray.data

    from plakar_ray.pipelines.dedup import _gram_rows_batch, substring_dup_spans

    ds = corpus()
    total_bytes = N_DOCS * DOC_BYTES

    # emission accounting on one block (deterministic, same every block)
    sample = next(iter(ds.iter_batches(batch_format="pyarrow", batch_size=256)))
    stride1 = _gram_rows_batch(sample, GRAM_LEN, "doc_id", "text", 0).num_rows
    winnowed = _gram_rows_batch(
        sample, GRAM_LEN, "doc_id", "text", WINNOW_W
    ).num_rows

    # testing.B-style (bench.py house methodology): best-of-N — this
    # shared host's run-to-run variance (hypervisor steal + first-touch
    # page-fault throughput collapses under neighbor load, the same
    # transient the scaling campaign's steal gate filters) spans 3-4x on
    # this workload, so the best run is the steady state.
    def run():
        return substring_dup_spans(
            ds,
            gram_len=GRAM_LEN,
            winnow_w=WINNOW_W,
            local_threshold=0,  # force both hash-partition exchanges
        ).to_pandas()

    walls = []
    for _ in range(3):
        t0 = time.time()
        out = run()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)

    planted = {i for i in range(N_DOCS) if i % 4 in (1, 2)}
    reported = set(out["doc_id"].astype(int))
    missed = sorted(planted - reported)
    false_docs = sorted(reported - planted)

    res = {
        "metric": "substring_dup_spans_winnowed_distributed",
        "docs": N_DOCS,
        "doc_bytes": DOC_BYTES,
        "corpus_mb": round(total_bytes / 1e6, 1),
        "gram_len": GRAM_LEN,
        "winnow_w": WINNOW_W,
        "span_bytes": SPAN_BYTES,
        "emission_stride1_rows_per_256docs": int(stride1),
        "emission_winnowed_rows_per_256docs": int(winnowed),
        "emission_cut_x": round(stride1 / max(1, winnowed), 2),
        "wall_s": round(wall, 2),
        "wall_s_all_runs": walls,
        "mbps": round(total_bytes / 1e6 / wall, 1),
        "planted_docs": len(planted),
        "reported_docs": len(reported),
        "missed_planted": len(missed),
        "false_positive_docs": len(false_docs),
        "num_cpus": NUM_CPUS,
    }
    print(json.dumps(res))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/substring_scale_r3.json"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    assert not missed, f"winnowing missed planted docs: {missed[:5]}"
    ray.shutdown()


if __name__ == "__main__":
    main()
