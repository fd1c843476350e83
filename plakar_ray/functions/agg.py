"""Shared small-key aggregation helper.

House rule (docs/DESIGN.md): map-side combining first, so the shuffle
carries partials bounded by key cardinality x blocks — never corpus rows —
then a size-gated merge: driver-local pyarrow group_by under the gate,
Ray's distributed groupby above it. Both paths produce identical values
and Ray's `sum(col)` column naming.
"""

from __future__ import annotations

import pyarrow as pa


def gated_groupby_sum(parts, keys, sum_cols, local_threshold: int = 1_000_000):
    """Partial-count Dataset -> pandas DataFrame of per-key summed partials.

    `parts` must already be map-side combined (one row per key per block at
    most). At or under `local_threshold` rows the merge happens on the
    driver — identical results, none of the distributed groupby's fixed
    orchestration cost; larger partial tables take Ray's groupby."""
    if isinstance(keys, str):
        keys = [keys]
    parts = parts.materialize()
    if local_threshold and parts.count() <= local_threshold:
        tables = [b for b in parts.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        if tables:
            g = pa.concat_tables(tables).group_by(keys).aggregate(
                [(c, "sum") for c in sum_cols]
            )
            return g.to_pandas().rename(
                columns={f"{c}_sum": f"sum({c})" for c in sum_cols}
            )
    return parts.groupby(keys).sum(sum_cols).to_pandas()
