"""Parameter-sweep pipelines — the cdcplot metric grids (cmd/cdcplot/main.go)
as distributed metric tables instead of PNGs:

* dedup-ratio vs average chunk size (avg in {4,8,16,32,64}K with min=avg/4,
  max=avg*8 — cmd/cdcplot/main.go:319-323)
* resync shared%% vs number of edits (0..64 — the resync curve)
* chunk-size histogram/CDF table per algorithm

Each sweep point is an independent pipeline run over the same Dataset
factory; points run sequentially (each is internally parallel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.opts import ChunkerOpts

SWEEP_AVGS = [4 * 1024, 8 * 1024, 16 * 1024, 32 * 1024, 64 * 1024]
RESYNC_EDITS = [0, 1, 2, 4, 8, 16, 32, 64]


def sweep_opts(avg: int) -> ChunkerOpts:
    return ChunkerOpts(avg // 4, avg * 8, avg)


def dedup_ratio_sweep(ds_factory, algo: str, avgs: list[int] | None = None) -> pa.Table:
    from plakar_ray.pipelines.analyze import measure

    rows = []
    for avg in avgs or SWEEP_AVGS:
        m = measure(ds_factory(), algo, sweep_opts(avg))
        rows.append((algo, avg, m["chunks"], m["dedup_ratio"], m["len_avg"]))
    return pa.table(
        {
            "algorithm": pa.array([r[0] for r in rows]),
            "avg_size": pa.array([r[1] for r in rows], type=pa.int64()),
            "chunks": pa.array([r[2] for r in rows], type=pa.int64()),
            "dedup_ratio": pa.array([r[3] for r in rows], type=pa.float64()),
            "mean_len": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def resync_sweep(
    ds_factory, algo: str, opts: ChunkerOpts | None = None,
    edit_counts: list[int] | None = None, edit_size: int = 1, seed: int = 1,
) -> pa.Table:
    from plakar_ray.pipelines.dedup import resync

    rows = []
    for k in edit_counts or RESYNC_EDITS:
        t = resync(ds_factory(), algo, opts, edits=k, edit_size=edit_size, seed=seed)
        rows.append((algo, k, t.column("mean_shared_frac")[0].as_py()))
    return pa.table(
        {
            "algorithm": pa.array([r[0] for r in rows]),
            "edits": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_shared_frac": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


def length_histogram(ds, algo: str, opts: ChunkerOpts | None = None,
                     n_buckets: int = 64) -> pa.Table:
    """Chunk-size histogram + CDF (the cdcplot histogram/CDF graphs as a
    table): equal-width buckets over [0, MaxSize]."""
    from ray.data.aggregate import AggregateFn

    from plakar_ray.registry import get_algorithm
    from plakar_ray.stages.chunk import chunk_dataset

    o = get_algorithm(algo).resolve_opts(opts)
    width = max(1, o.max_size // n_buckets)

    chunks = chunk_dataset(ds, algo, opts, with_digest=False)

    def acc(a, block: pa.Table):
        lengths = block.column("length").to_numpy(zero_copy_only=False)
        b = np.minimum(lengths // width, n_buckets - 1)
        return a + np.bincount(b, minlength=n_buckets)

    agg = AggregateFn(
        init=lambda k: np.zeros(n_buckets, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc,
        name="hist",
    )
    hist = np.asarray(chunks.aggregate(agg)["hist"])
    total = max(int(hist.sum()), 1)
    cdf = np.cumsum(hist) / total
    return pa.table(
        {
            "bucket_lo": pa.array(np.arange(n_buckets) * width, type=pa.int64()),
            "bucket_hi": pa.array((np.arange(n_buckets) + 1) * width, type=pa.int64()),
            "count": pa.array(hist, type=pa.int64()),
            # raw float64 (consumers fixed-point with floor(cdf*1e6+0.5) for
            # engine-portable comparison)
            "cdf": pa.array(cdf, type=pa.float64()),
        }
    )
