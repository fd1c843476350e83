"""cdcplot figure set as SVG files (reference: cmd/cdcplot/main.go:53-365).

Four figures from the sweep pipelines — chunk-length histogram, CDF,
dedup-ratio-vs-avg-size, resync-vs-edits — rendered by the pure-Python SVG
helpers in functions/svgplot.py (no plotting library in this environment).
Each sweep point is an internally-parallel Ray pipeline; figures render
from the resulting small metric tables on the driver.
"""

from __future__ import annotations

import os

from plakar_ray.opts import ChunkerOpts


def render_figures(
    docs_factory,
    out_dir: str,
    algos: list[str],
    hist_algo: str,
    opts: ChunkerOpts | None = None,
    sweep_avgs: list[int] | None = None,
    resync_edits: list[int] | None = None,
) -> list[str]:
    """Render all four figures; returns the written file paths.

    `docs_factory` is a zero-arg callable returning a fresh documents
    Dataset (sweep points each consume one)."""
    from plakar_ray.functions import svgplot
    from plakar_ray.pipelines.sweeps import (
        dedup_ratio_sweep,
        length_histogram,
        resync_sweep,
    )

    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def emit(name: str, svg: str):
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(svg)
        written.append(path)

    hist = length_histogram(docs_factory(), hist_algo, opts)
    highs = hist.column("bucket_hi").to_pylist()
    emit(
        "chunk_length_hist.svg",
        svgplot.bar_chart(
            f"Chunk-length distribution — {hist_algo}",
            "chunk length (bytes)", "chunks",
            hist.column("bucket_lo").to_pylist(), highs,
            hist.column("count").to_pylist(),
        ),
    )
    emit(
        "chunk_length_cdf.svg",
        svgplot.line_chart(
            f"Chunk-length CDF — {hist_algo}",
            "chunk length (bytes)", "fraction of chunks",
            {hist_algo: (highs, hist.column("cdf").to_pylist())},
            y_range=(0.0, 1.02),
        ),
    )

    dd = {}
    for algo in algos:
        t = dedup_ratio_sweep(docs_factory, algo, avgs=sweep_avgs)
        dd[algo] = (t.column("avg_size").to_pylist(),
                    t.column("dedup_ratio").to_pylist())
    emit(
        "dedup_ratio_sweep.svg",
        svgplot.line_chart(
            "Dedup ratio vs average chunk size",
            "average chunk size (bytes)", "dedup ratio", dd,
        ),
    )

    rs = {}
    for algo in algos:
        t = resync_sweep(docs_factory, algo, opts, edit_counts=resync_edits)
        rs[algo] = (t.column("edits").to_pylist(),
                    t.column("mean_shared_frac").to_pylist())
    emit(
        "resync_curve.svg",
        svgplot.line_chart(
            "Resynchronization after random insertions",
            "number of 1-byte insertions", "mean shared-bytes fraction", rs,
            y_range=(0.0, 1.02),
        ),
    )
    return written
