"""`ray job submit` entrypoint for the flagship tier-dedup pipeline —
the north rule's deployment surface: the SAME job submitted unchanged to
a fixed-size multi-node Ray cluster at N and at 4N nodes (jobs/README.md
has the exact submission commands; BENCH/scaling_* + BASELINE.md carry
this sandbox's pinned two-level emulation of that pair).

Inside a `ray job submit` driver, `ray.init(address="auto")` attaches to
the hosting cluster; standalone (this sandbox, CI) it falls back to a
private local session. The pipeline itself is pure Dataset code
(pipelines/prep.corpus_prep_tiered): cluster size changes NOTHING but
the attach address — partitioning, packed exchanges and broadcasts are
sized from ray.cluster_resources() at run time.

Prints ONE JSON metrics line (per-tier accounting, wall seconds, MB/s)
and, with --out, writes the surviving cleaned corpus as hash-sharded
parquet (one directory per shard — resumable / inspectable per shard,
never one giant file).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Standalone `python jobs/flagship_job.py` runs with jobs/ as the script
# dir; make the repo root importable (a `ray job submit --working-dir .`
# driver gets it on sys.path already).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet path/glob with (doc_id, text)")
    p.add_argument("--out", default="", help="write surviving cleaned corpus here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--quality-thresh-e6", type=int, default=550_000)
    p.add_argument("--num-perm", type=int, default=16)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument(
        "--address", default="auto",
        help='"auto" (default) attaches to the hosting cluster — the'
        ' `ray job submit` case; "local" starts a private session',
    )
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        # Workers must be able to import plakar_ray: `ray job submit
        # --working-dir .` ships and path-injects the repo itself; a
        # standalone run injects it via PYTHONPATH (workers do not
        # inherit the driver's sys.path edits).
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {"PYTHONPATH": root + os.pathsep + os.environ.get("PYTHONPATH", "")}
        try:
            ray.init(
                address=args.address,
                logging_level="error",
                runtime_env={"env_vars": env},
            )
        except ConnectionError:
            # No cluster to attach to (standalone run): private session.
            ray.init(
                address="local",
                include_dashboard=False,
                logging_level="error",
                runtime_env={"env_vars": env},
            )

    try:
        import ray.data

        from plakar_ray.pipelines.prep import corpus_prep_tiered

        ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
        t0 = time.perf_counter()
        res = corpus_prep_tiered(
            ds,
            quality_thresh_e6=args.quality_thresh_e6,
            id_col=args.id_col,
            text_col=args.text_col,
            num_perm=args.num_perm,
            bands=args.bands,
            emit_docs=bool(args.out),
        )
        if args.out:
            import numpy as np
            import pyarrow as pa

            from plakar_ray.functions.exchange import _column_u64, _mix64

            summary, survivors = res
            n_shards, id_col = int(args.shards), args.id_col

            def add_shard(batch: pa.Table) -> pa.Table:
                # _column_u64 passes integer ids through and FNV-hashes
                # string/binary ids, so a text --id-col shards cleanly
                # instead of dying in an int cast at the final write.
                col = batch.column(id_col)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                # .copy(): _mix64 mutates in place, and _column_u64 can
                # return a read-only zero-copy Arrow view (uint64 ids)
                shard = (_mix64(_column_u64(col).copy()) % np.uint64(n_shards)).astype(
                    np.int32
                )
                return batch.append_column("shard", pa.array(shard))

            survivors.map_batches(
                add_shard, batch_format="pyarrow", zero_copy_batch=True
            ).write_parquet(args.out, partition_cols=["shard"])
        else:
            summary = res
        wall = time.perf_counter() - t0

        row = {k: v[0] for k, v in summary.to_pydict().items()}
        row["wall_s"] = round(wall, 3)
        row["cluster_cpus"] = int(ray.cluster_resources().get("CPU", 0))
        row["mb_per_s"] = (
            round(row["bytes_out"] / wall / 1e6, 1) if wall > 0 else None
        )
        if args.out:
            row["out"] = args.out
        print(json.dumps(row))
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
