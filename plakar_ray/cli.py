"""CLI mirroring the reference's cmd/cdc tools (analyze / compare / resync)
plus near-dup clustering, over a parquet documents/pages table.

Usage:
    python -m plakar_ray.cli analyze  --input PATH [--algo fastcdc] [--min N --avg N --max N]
    python -m plakar_ray.cli compare  --input PATH --a fastcdc --b ultracdc [...]
    python -m plakar_ray.cli resync   --input PATH --algo fastcdc [--edits 16 --edit-size 1 --seed 1]
    python -m plakar_ray.cli cluster  --input PATH [--num-perm 192 --bands 64 --salt 0]
    python -m plakar_ray.cli plot     --input PATH [--out DIR] [--algos a,b,c]

Owns its Ray session (guarded init, shutdown at exit); the size flags follow
cmd/cdc/stats.go:42-47 defaults (2K/8K/64K). `plot` renders the cdcplot
figure set (histogram/CDF/dedup-sweep/resync) as SVGs — cmd/cdcplot/main.go
parity without a plotting library.
"""

from __future__ import annotations

import argparse
import sys

import plakar_ray.competitors  # noqa: F401  (registers 'buzhash' for --algo)
from plakar_ray.opts import ChunkerOpts


def _opts(args) -> ChunkerOpts:
    return ChunkerOpts(args.min, args.max, args.avg)


def _read(args):
    import ray.data

    cols = [args.id_col, args.text_col]
    return ray.data.read_parquet(args.input, columns=cols)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="plakar_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--input", required=True)
        sp.add_argument("--id-col", default="doc_id")
        sp.add_argument("--text-col", default="text")
        sp.add_argument("--min", type=int, default=2 * 1024)
        sp.add_argument("--avg", type=int, default=8 * 1024)
        sp.add_argument("--max", type=int, default=64 * 1024)
        sp.add_argument("--num-cpus", type=int, default=0)
        sp.add_argument(
            "--address", default="local",
            help='Ray address: "local" starts a private single-node session'
            ' (default); "auto" attaches to the running cluster — what a'
            " `ray job submit` entrypoint passes (jobs/README.md)",
        )

    sp = sub.add_parser("analyze")
    common(sp)
    sp.add_argument("--algo", default="fastcdc")
    sp = sub.add_parser("compare")
    common(sp)
    sp.add_argument("--a", default="fastcdc")
    sp.add_argument("--b", default="ultracdc")
    sp.add_argument("--tolerance", type=float, default=0.02)
    sp = sub.add_parser("resync")
    common(sp)
    sp.add_argument("--algo", default="fastcdc")
    sp.add_argument("--edits", type=int, default=16)
    sp.add_argument("--edit-size", type=int, default=1)
    sp.add_argument("--seed", type=int, default=1)
    sp = sub.add_parser("cluster")
    common(sp)
    sp.add_argument("--algo", default="fastcdc-v1.0.0")
    sp.add_argument("--num-perm", type=int, default=192)
    sp.add_argument("--bands", type=int, default=64)
    sp.add_argument("--salt", type=int, default=0)
    sp.add_argument("--out", default="")
    sp = sub.add_parser("plot")
    common(sp)
    sp.add_argument("--out", default="/tmp/plakar_plots")
    sp.add_argument("--algos", default="fastcdc,jc,ultracdc")
    sp.add_argument("--hist-algo", default="")
    sp = sub.add_parser(
        "substring",
        help="exact duplicated-substring spans (measure) or the all-but-one"
        " removal transform (clean; --out writes the cleaned corpus)",
    )
    common(sp)
    sp.add_argument("--mode", choices=["measure", "clean"], default="measure")
    sp.add_argument("--gram-len", type=int, default=32)
    sp.add_argument("--winnow", type=int, default=0,
                    help="winnowing window w (measure mode): ~w/2-fold less"
                    " emission, detects spans >= gram_len + w - 1")
    sp.add_argument("--out", default="",
                    help="clean mode: write (id, cleaned_text, accounting)"
                    " parquet here instead of printing accounting")
    sp = sub.add_parser(
        "prep",
        help="full tier-dedup stack (quality gate -> paragraph clean ->"
        " exact dedup -> MinHash/LSH near-dup election); prints the"
        " per-tier summary, --out also writes the surviving cleaned"
        " corpus as hash-sharded parquet (one dir per shard)",
    )
    common(sp)
    sp.add_argument("--quality-thresh-e6", type=int, default=550_000)
    sp.add_argument("--num-perm", type=int, default=16)
    sp.add_argument("--bands", type=int, default=4)
    sp.add_argument("--shards", type=int, default=64)
    sp.add_argument("--out", default="")

    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = dict(address=args.address, logging_level="error")
        if args.address == "local":
            kwargs["include_dashboard"] = False
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
        elif args.num_cpus:
            # Attaching to an existing cluster: its size is fixed, the
            # flag would be silently ignored — refuse instead of letting
            # `--address auto --num-cpus 8` quietly run on every core.
            p.error(
                "--num-cpus only applies to --address local; "
                "an attached cluster's size is fixed at cluster start"
            )
        ray.init(**kwargs)

    code = 0
    try:
        if args.cmd == "analyze":
            from plakar_ray.pipelines.analyze import analyze

            t = analyze(_read(args), args.algo, _opts(args),
                        id_col=args.id_col, text_col=args.text_col)
            print(t.to_pandas().to_string(index=False))
        elif args.cmd == "compare":
            from plakar_ray.pipelines.analyze import compare

            t, regression = compare(
                lambda: _read(args), args.a, args.b, _opts(args),
                tolerance=args.tolerance, id_col=args.id_col, text_col=args.text_col,
            )
            print(t.to_pandas().to_string(index=False))
            if regression:
                # CI gate semantics of cmd/cdc/compare.go:24-59.
                print(f"REGRESSION: {args.b} dedup ratio worse than {args.a} "
                      f"(tolerance {args.tolerance})", file=sys.stderr)
                code = 1
        elif args.cmd == "resync":
            from plakar_ray.pipelines.dedup import resync

            t = resync(_read(args), args.algo, _opts(args), edits=args.edits,
                       edit_size=args.edit_size, seed=args.seed,
                       id_col=args.id_col, text_col=args.text_col)
            print(t.to_pandas().to_string(index=False))
        elif args.cmd == "cluster":
            from plakar_ray.pipelines.dedup import near_dup_clusters

            t = near_dup_clusters(
                _read(args), args.algo, _opts(args), num_perm=args.num_perm,
                bands=args.bands, id_col=args.id_col, text_col=args.text_col,
                salt_buckets=args.salt or None,
            )
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(t, args.out)
                print(f"wrote {t.num_rows} rows to {args.out}")
            else:
                print(t.to_pandas().to_string(index=False))
        elif args.cmd == "substring":
            if args.mode == "measure":
                from plakar_ray.pipelines.dedup import substring_dup_spans

                t = substring_dup_spans(
                    _read(args), gram_len=args.gram_len, winnow_w=args.winnow,
                    id_col=args.id_col, text_col=args.text_col,
                ).to_pandas().sort_values(args.id_col)
                print(t.to_string(index=False))
            else:
                from plakar_ray.pipelines.dedup import substring_dedup_clean

                ds = substring_dedup_clean(
                    _read(args), gram_len=args.gram_len,
                    id_col=args.id_col, text_col=args.text_col,
                    emit_text=bool(args.out),
                )
                if args.out:
                    ds.write_parquet(args.out)
                    print(f"wrote cleaned corpus to {args.out}")
                else:
                    print(
                        ds.to_pandas().sort_values(args.id_col).to_string(index=False)
                    )
        elif args.cmd == "prep":
            from plakar_ray.pipelines.prep import corpus_prep_tiered

            res = corpus_prep_tiered(
                _read(args),
                quality_thresh_e6=args.quality_thresh_e6,
                id_col=args.id_col, text_col=args.text_col,
                num_perm=args.num_perm, bands=args.bands,
                emit_docs=bool(args.out),
            )
            if args.out:
                import numpy as np
                import pyarrow as pa

                from plakar_ray.functions.exchange import _mix64

                summary, survivors = res
                n_shards, id_col = int(args.shards), args.id_col

                def add_shard(batch: pa.Table) -> pa.Table:
                    ids = (
                        batch.column(id_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                        .view(np.uint64)
                    )
                    shard = (_mix64(ids) % np.uint64(n_shards)).astype(np.int32)
                    return batch.append_column("shard", pa.array(shard))

                # One directory per hash shard — never one giant file; a
                # partial output is inspectable per shard. (Per-partition
                # crash-resume with manifests is state/lineage.py — see
                # the store pipeline and the SIGKILL resume demo.)
                survivors.map_batches(
                    add_shard, batch_format="pyarrow", zero_copy_batch=True
                ).write_parquet(args.out, partition_cols=["shard"])
                print(summary.to_pandas().to_string(index=False))
                print(f"wrote surviving cleaned corpus to {args.out}")
            else:
                print(res.to_pandas().to_string(index=False))
        elif args.cmd == "plot":
            from plakar_ray.pipelines.plots import render_figures

            for path in render_figures(
                lambda: _read(args), args.out, args.algos.split(","),
                args.hist_algo or args.algos.split(",")[0], _opts(args),
            ):
                print("wrote", path)
    finally:
        if owns_session:
            ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
