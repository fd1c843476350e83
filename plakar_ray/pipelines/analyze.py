"""Dedup analytics pipelines: measure / analyze / compare.

Distributed re-expressions of the reference cmd tools:
* measure (cmd/cdc/stats.go:122-155): the process-global `seen` digest set
  becomes a digest-keyed groupby shuffle; totals are streaming aggregates.
* distribution (cmd/cdc/stats.go:91-116): exact percentiles via a merged
  length histogram (chunk lengths are small ints <= MaxSize), computed with a
  block-wise AggregateFn — no sort, no full materialization.
* analyze/compare (cmd/cdc/analyze.go:24-56, compare.go:24-59): one-row /
  two-row metric tables; compare keeps the CI regression-gate semantics.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pyarrow as pa

from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import get_algorithm
from plakar_ray.stages.chunk import chunk_dataset

_HIST_CAP = 1 << 22  # exact-histogram quantiles up to 4 MiB chunk sizes


def _length_stats(chunks_ds, max_size: int) -> dict[str, Any]:
    """Exact min/p50/avg/p95/max/stddev of chunk lengths via one pass:
    per-block histograms + sum/sumsq, merged driver-side (tiny arrays)."""
    from ray.data.aggregate import AggregateFn

    nbins = max_size + 1
    if nbins > _HIST_CAP:
        raise ValueError("histogram quantiles capped at 4MiB MaxSize")

    # Accumulator is a single int64 ndarray (Arrow-serializable between
    # aggregation tasks); totals and moments derive from the histogram.
    def acc_block(acc, block: pa.Table):
        lengths = block.column("length").to_numpy(zero_copy_only=False)
        return acc + np.bincount(lengths, minlength=nbins)

    agg = AggregateFn(
        init=lambda k: np.zeros(nbins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        name="length_hist",
    )
    hist = np.asarray(chunks_ds.aggregate(agg)["length_hist"])
    values = np.arange(nbins, dtype=np.float64)
    total = int((values * hist).sum())
    sumsq = float((values * values * hist).sum())
    n = int(hist.sum())
    if n == 0:
        return dict(len_min=0, len_p50=0, len_avg=0, len_p95=0, len_max=0, len_stddev=0.0,
                    chunks=0, total_bytes=0)
    nz = np.nonzero(hist)[0]
    cum = np.cumsum(hist)

    def q(frac_idx: int) -> int:
        # reference: sorted[len*P/100] (stats.go:95-100), 0-based index
        return int(np.searchsorted(cum, frac_idx + 1))

    mean = total / n
    std = math.sqrt(max(sumsq / n - mean * mean, 0.0))
    return dict(
        len_min=int(nz[0]),
        len_p50=q(n * 50 // 100),
        len_avg=int(mean),
        len_p95=q(n * 95 // 100),
        len_max=int(nz[-1]),
        len_stddev=std,
        chunks=n,
        total_bytes=total,
    )


def _unique_digest_totals(
    chunks, local_threshold: int = 1_000_000
) -> tuple[int, int]:
    """(distinct digest count, sum of one length per distinct digest) over a
    chunk Dataset carrying (digest, length) columns.

    Stage 1 dedups digests per block map-side (shuffle volume becomes
    block-distinct digests, not chunk rows). Stage 2 merges: at or under
    `local_threshold` surviving rows, one driver np.unique; above it, a
    digest-keyed HASH-PARTITION exchange where each partition reports its
    distinct count/bytes (digests are partition-disjoint by construction),
    summed by a final tiny aggregate."""
    from ray.data.aggregate import Sum

    def block_uniq(b: pa.Table) -> pa.Table:
        g = b.select(["digest", "length"]).group_by("digest").aggregate(
            [("length", "min")]
        )
        return g.rename_columns(["digest", "length"])

    parts = chunks.map_batches(
        block_uniq, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if local_threshold and parts.count() <= local_threshold:
        digs, lens = [], []
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
            if len(b):
                digs.append(np.asarray(
                    b.column("digest").to_numpy(zero_copy_only=False), dtype="S64"
                ))
                lens.append(
                    b.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
                )
        if not digs:
            return 0, 0
        dig = np.concatenate(digs)
        ln = np.concatenate(lens)
        _, first = np.unique(dig, return_index=True)
        return int(first.size), int(ln[first].sum())

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    def part_totals(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"partial_chunks": pa.array([], type=pa.int64()),
                 "partial_bytes": pa.array([], type=pa.int64())}
            )
        dig = np.asarray(
            b.column("digest").to_numpy(zero_copy_only=False), dtype="S64"
        )
        ln = b.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        _, first = np.unique(dig, return_index=True)
        return pa.table(
            {
                "partial_chunks": pa.array([first.size], type=pa.int64()),
                "partial_bytes": pa.array([int(ln[first].sum())], type=pa.int64()),
            }
        )

    # Packed exchange (functions/exchange.py): one row per chunk — blobs
    # keep the shuffled row count block-granular at any corpus size.
    from plakar_ray.functions.exchange import packed_exchange

    per = packed_exchange(
        parts, ["digest"], max(8, cpus // 4), part_totals, pa.table({})
    )
    agg = per.aggregate(Sum("partial_chunks"), Sum("partial_bytes"))
    return int(agg["sum(partial_chunks)"] or 0), int(agg["sum(partial_bytes)"] or 0)


def measure(
    ds,
    algo: str,
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = None,
) -> dict[str, Any]:
    """Full corpus measurement: totals, cross-document unique chunks by
    digest (the distributed `seen` set), and the exact length distribution."""
    spec = get_algorithm(algo)
    o = spec.resolve_opts(opts)
    chunks = chunk_dataset(
        ds, algo, opts, id_col=id_col, text_col=text_col, concurrency=concurrency
    )
    # Materialize the chunk table once: it feeds two consumers (histogram +
    # digest groupby) and is ~50 bytes/chunk — a small fraction of the input;
    # the object store spills if needed.
    chunks = chunks.materialize()
    stats = _length_stats(chunks, o.max_size)

    # Distinct digests — the distributed `seen` set. Length is
    # digest-determined (resync.go:104-107), so any representative length
    # per digest is exact. Map-side block dedup first (unique digests per
    # block), then the house exchange shape: size-gated driver merge, or a
    # digest-keyed hash-partition exchange + per-partition distinct count.
    unique_chunks, unique_bytes = _unique_digest_totals(chunks)

    total_bytes = stats["total_bytes"]
    return dict(
        algorithm=algo,
        total_bytes=total_bytes,
        chunks=stats["chunks"],
        unique_chunks=unique_chunks,
        unique_bytes=unique_bytes,
        dedup_ratio=(unique_bytes / total_bytes) if total_bytes else 0.0,
        **{k: v for k, v in stats.items() if k.startswith("len_")},
    )


def analyze(
    ds,
    algo: str,
    opts: ChunkerOpts | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | None = None,
) -> pa.Table:
    """One-row metrics table (cmd/cdc/analyze.go output, minus wall-clock)."""
    m = measure(ds, algo, opts, id_col, text_col, concurrency)
    return pa.table({k: [v] for k, v in m.items()})


def compare(
    ds_factory,
    algo_a: str,
    algo_b: str,
    opts: ChunkerOpts | None = None,
    tolerance: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
    opts_b: ChunkerOpts | None = None,
) -> tuple[pa.Table, bool]:
    """Run measure for two algorithms; regression iff
    ratio_b > ratio_a * (1 + tolerance) (cmd/cdc/compare.go:24-59).
    ds_factory() must return a fresh Dataset per run (Datasets are consumed).
    opts_b (default: opts) lets the same algorithm be compared against
    itself at different options — the SQL-oracle twin compares the fixed
    chunker at two sizes through this exact code path.
    """
    a = measure(ds_factory(), algo_a, opts, id_col, text_col)
    b = measure(ds_factory(), algo_b, opts if opts_b is None else opts_b, id_col, text_col)
    table = pa.table({k: [a[k], b[k]] for k in a})
    regression = b["dedup_ratio"] > a["dedup_ratio"] * (1 + tolerance)
    return table, regression
