"""Windowed aggregates over the events stream table.

Tumbling windows are a pure key transform (truncate the timestamp), so the
"streaming" operator is a map_batches + groupby — no custom operator needed;
partials are combined per batch before the shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


from plakar_ray.functions.agg import gated_groupby_sum as _gated_groupby_sum


def tumbling_window_counts(
    ds,
    window: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> pa.Table:
    """(window_start, event_type, n_events, value_sum) per tumbling window,
    ordered by (window_start, event_type)."""

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column(ts_col), unit=window)
        t = pa.table(
            {
                "window_start": w,
                key_col: batch.column(key_col),
                value_col: batch.column(value_col),
            }
        )
        g = t.group_by(["window_start", key_col]).aggregate(
            [(value_col, "sum"), (value_col, "count")]
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                key_col: g.column(key_col),
                "n_events": g.column(f"{value_col}_count").cast(pa.int64()),
                "value_sum": g.column(f"{value_col}_sum").cast(pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = _gated_groupby_sum(
        parts, ["window_start", key_col], ["n_events", "value_sum"]
    ).sort_values(["window_start", key_col])
    return pa.table(
        {
            "window_start": pa.array(final["window_start"]),
            key_col: pa.array(final[key_col]),
            "n_events": pa.array(final["sum(n_events)"], type=pa.int64()),
            "value_sum": pa.array(final["sum(value_sum)"], type=pa.float64()),
        }
    )


def hopping_window_counts(
    ds,
    window_s: int = 3600,
    hop_s: int = 1800,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> pa.Table:
    """Hopping (sliding) windows: each event lands in window_s/hop_s
    overlapping windows, emitted via a vectorized flat-map, then the same
    partial-count groupby as tumbling windows.
    Returns (window_start, event_type, n_events) ordered."""
    import numpy as np

    assert window_s % hop_s == 0
    k = window_s // hop_s

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hop_us = hop_s * 1_000_000
        base = (ts // hop_us) * hop_us  # most recent hop boundary <= ts
        n = ts.shape[0]
        starts = base[:, None] - np.arange(k)[None, :] * hop_us  # (n, k)
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        take = pa.array(np.repeat(np.arange(n), k), type=pa.int64())
        t = pa.table(
            {
                "window_start": pa.array(starts.reshape(-1), type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                key_col: keys.take(take),
            }
        )
        g = t.group_by(["window_start", key_col]).aggregate([("window_start", "count")])
        return pa.table(
            {
                "window_start": g.column("window_start"),
                key_col: g.column(key_col),
                "partial": g.column("window_start_count").cast(pa.int64()),
            }
        )

    parts = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    final = _gated_groupby_sum(
        parts, ["window_start", key_col], ["partial"]
    ).sort_values(["window_start", key_col])
    return pa.table(
        {
            "window_start": pa.array(final["window_start"]),
            key_col: pa.array(final[key_col]),
            "n_events": pa.array(final["sum(partial)"], type=pa.int64()),
        }
    )


def asof_join(
    left_ds,
    right: pa.Table,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> "object":
    """As-of join: for every left row, the right row with the largest
    ts' <= ts for the same key (None when no prior right row exists).

    Ray Data has no join; the scale pattern here is broadcast-small-side:
    the right table is grouped into per-key sorted timestamp arrays, shipped
    once with ray.put, and each batch resolves matches with np.searchsorted.
    (A large right side would instead co-shuffle both sides with
    groupby(key).map_groups and merge per key.) Right-side ties on
    (key, ts) must be pre-aggregated by the caller."""
    import numpy as np
    import ray

    rk = right.column(key_col).to_numpy(zero_copy_only=False)
    rt = right.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((rt, rk))
    rk, rt = rk[order], rt[order]
    rvals = {c: right.column(c).to_numpy(zero_copy_only=False)[order] for c in value_cols}
    index: dict[int, tuple[np.ndarray, dict]] = {}
    start = 0
    for i in range(1, rk.shape[0] + 1):
        if i == rk.shape[0] or rk[i] != rk[start]:
            index[int(rk[start])] = (
                rt[start:i],
                {c: v[start:i] for c, v in rvals.items()},
            )
            start = i
    right_ref = ray.put(index)

    def apply(batch: pa.Table) -> pa.Table:
        # Vectorized resolve: sort the batch by (key, ts), then one
        # searchsorted + gather per distinct KEY RUN (not per row).
        idx = ray.get(right_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = keys.shape[0]
        match_ts = np.full(n, -1, dtype=np.int64)
        out_vals = {c: np.full(n, np.nan, dtype=np.float64) for c in value_cols}
        order = np.lexsort((ts, keys))
        sk = keys[order]
        runs = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1]))) if n else np.empty(0, np.int64)
        bounds = np.concatenate((runs, [n]))
        for ri in range(len(runs)):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            ent = idx.get(int(sk[s]))
            if ent is None:
                continue
            t_arr, vals = ent
            rows = order[s:e]
            j = np.searchsorted(t_arr, ts[rows], side="right") - 1
            ok = j >= 0
            rr, jj = rows[ok], j[ok]
            match_ts[rr] = t_arr[jj]
            for c in value_cols:
                out_vals[c][rr] = vals[c][jj]
        miss = match_ts < 0
        out = batch.append_column(
            prefix + "ts",
            pa.array(np.where(miss, 0, match_ts), type=pa.int64(), mask=miss).cast(
                pa.timestamp("us")
            ),
        )
        for c in value_cols:
            out = out.append_column(
                prefix + c, pa.array(out_vals[c], type=pa.float64(), mask=miss)
            )
        return out

    return left_ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(
    ds,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    local_threshold: int = 1_000_000,
) -> pa.Table:
    """Session assignment: events of one user sorted by time; a gap >
    gap_seconds starts a new session. A user-keyed HASH-PARTITION exchange
    co-locates each user's events, then ONE lexsort per partition counts
    every user's sessions (segment boundaries = user change or gap) — no
    global sort, no per-user UDF dispatch (millions of users at web scale).
    (user, ts) tables at or under `local_threshold` rows sessionize on the
    driver instead — identical results via the same vectorized function.
    Returns (user_id, n_sessions, n_events)."""
    import numpy as np
    from ray.data.context import ShuffleStrategy

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    def sessions_part(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                user_col: pa.array([], type=pa.int64()),
                "n_sessions": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column(user_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = users[1:] != users[:-1]
        # a session break is a user boundary OR an in-user gap > threshold
        brk = newu.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        ustart = np.flatnonzero(newu)
        return pa.table(
            {
                user_col: pa.array(users[ustart], type=pa.int64()),
                "n_sessions": pa.array(
                    np.add.reduceat(brk.astype(np.int64), ustart), type=pa.int64()
                ),
                "n_events": pa.array(
                    np.diff(np.append(ustart, n)), type=pa.int64()
                ),
            }
        )

    # Only (user, ts) ever moves — never the event payload columns.
    slim = ds.select_columns([user_col, ts_col]).materialize()
    if local_threshold and slim.count() <= local_threshold:
        tables = [b for b in slim.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        merged = (
            pa.concat_tables(tables)
            if tables
            else pa.table({user_col: pa.array([], type=pa.int64()),
                           ts_col: pa.array([], type=pa.int64())})
        )
        out = sessions_part(merged).to_pandas()
    else:
        slim.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        out = (
            slim.repartition(max(8, cpus // 4), keys=[user_col], sort=False)
            .map_batches(
                sessions_part,
                batch_size=None,  # batch == block == one complete hash partition
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
        )
    out = out.sort_values(user_col)
    return pa.table(
        {
            user_col: pa.array(out[user_col], type=pa.int64()),
            "n_sessions": pa.array(out["n_sessions"], type=pa.int64()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
        }
    )
