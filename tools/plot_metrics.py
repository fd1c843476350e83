"""Render the cdcplot figure set as SVG files from the sweep pipelines.

Parity artifact for the reference's plot outputs
(/root/reference/cmd/cdcplot/main.go:53-365): chunk-length histogram, CDF,
dedup-ratio-vs-avg-size sweep, and resync-vs-edits curve — standalone SVGs
(no plotting library in this environment; see functions/svgplot.py).
Equivalent to `python -m plakar_ray.cli plot` with testdata defaults.

    python tools/plot_metrics.py [--sf DIR] [--out DIR]
        [--algos fastcdc,jc,ultracdc] [--hist-algo fastcdc-v1.0.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/plakar_plots")
    ap.add_argument("--algos", default="fastcdc,jc,ultracdc")
    ap.add_argument("--hist-algo", default="fastcdc-v1.0.0")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="error")

    from plakar_ray import entry as E
    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.pipelines.plots import render_figures

    # Small-profile opts: testdata documents average ~2-6 KB, so the CLI's
    # 2K/8K/64K default would put most docs in one chunk.
    small = ChunkerOpts(256, 8192, 1024)
    paths = render_figures(
        lambda: E._docs(args.sf, ["doc_id", "text"]),
        args.out, args.algos.split(","), args.hist_algo, small,
        sweep_avgs=[1024, 2048, 4096, 8192],
        resync_edits=[0, 1, 2, 4, 8, 16],
    )
    for p in paths:
        print("wrote", p)
    ray.shutdown()


if __name__ == "__main__":
    main()
