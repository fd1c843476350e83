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
    right,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    broadcast_threshold: int = 2_000_000,
) -> "object":
    """As-of join: for every left row, the right row with the largest
    ts' <= ts for the same key (None when no prior right row exists).

    Ray Data has no join; two scale shapes, gated on the right side's row
    count (the `local_threshold` pattern used repo-wide):
      * broadcast-small-side (right a pa.Table, or a Dataset at or under
        `broadcast_threshold` rows): per-key sorted timestamp arrays are
        shipped once with ray.put and each left batch resolves matches
        with np.searchsorted — the left side never shuffles;
      * co-shuffle (right a Dataset above the gate): both sides are
        tagged, unioned and hash-partitioned by key, and each partition
        resolves its keys' left rows against its (complete) right rows
        with the same per-key-run searchsorted — neither side is ever
        collected anywhere.
    Right-side ties on (key, ts) must be pre-aggregated by the caller."""
    import numpy as np
    import ray

    if not isinstance(right, pa.Table):
        # materialize before count(): the gate must not execute the right
        # side's lineage once for the count and again for consumption
        right_ds = right.materialize()
        if right_ds.count() > broadcast_threshold:
            return _asof_join_coshuffle(
                left_ds, right_ds, key_col, ts_col, value_cols, prefix
            )
        tables = [
            b
            for b in right_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        right = (
            pa.concat_tables(tables, promote_options="default")
            if tables
            else pa.table(
                {
                    key_col: pa.array([], type=pa.int64()),
                    ts_col: pa.array([], type=pa.timestamp("us")),
                    **{c: pa.array([], type=pa.float64()) for c in value_cols},
                }
            )
        )

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
        match_ts = np.zeros(n, dtype=np.int64)
        # explicit hit mask, NOT a -1 sentinel: a pre-epoch right ts is a
        # legitimate negative-microsecond match
        hit = np.zeros(n, dtype=bool)
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
            hit[rr] = True
            for c in value_cols:
                out_vals[c][rr] = vals[c][jj]
        miss = ~hit
        out = batch.append_column(
            prefix + "ts",
            pa.array(match_ts, type=pa.int64(), mask=miss).cast(pa.timestamp("us")),
        )
        for c in value_cols:
            out = out.append_column(
                prefix + c, pa.array(out_vals[c], type=pa.float64(), mask=miss)
            )
        return out

    return left_ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def _asof_join_coshuffle(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    value_cols: tuple[str, ...],
    prefix: str,
    num_partitions: int | None = None,
):
    """Large-right as-of join: tagged union of both sides, ONE hash
    exchange keyed on `key_col`, then per-partition vectorized resolve
    (each partition holds every row of its keys from BOTH sides, so the
    per-key-run searchsorted of the broadcast path runs unchanged against
    partition-local right rows). Equivalence-tested against the broadcast
    path; output column set and types are identical."""
    import numpy as np
    import ray

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(8, cpus // 4)

    left_schema = left_ds.schema().base_schema
    left_names = list(left_schema.names)
    helper_rts = "__asof_rts"
    helper_side = "__asof_side"
    helper_v = {c: f"__asof_v_{c}" for c in value_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = batch
        t = t.append_column(helper_rts, pa.nulls(n, pa.int64()))
        for c in value_cols:
            t = t.append_column(helper_v[c], pa.nulls(n, pa.float64()))
        return t.append_column(helper_side, pa.array(np.zeros(n, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for f in left_schema:
            if f.name == key_col:
                cols[f.name] = batch.column(key_col).cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        cols[helper_rts] = batch.column(ts_col).cast(pa.int64())
        for c in value_cols:
            cols[helper_v[c]] = batch.column(c).cast(pa.float64())
        cols[helper_side] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        list(left_schema)
        + [pa.field(prefix + "ts", pa.timestamp("us"))]
        + [pa.field(prefix + c, pa.float64()) for c in value_cols]
    )

    def resolve(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return out_schema.empty_table()
        side = batch.column(helper_side).to_numpy(zero_copy_only=False)
        is_left = side == 0
        left_t = batch.filter(pa.array(is_left)).select(
            left_names
        )
        right_t = batch.filter(pa.array(~is_left))
        if left_t.num_rows == 0:
            return out_schema.empty_table()
        rk = right_t.column(key_col).to_numpy(zero_copy_only=False)
        rt = right_t.column(helper_rts).to_numpy(zero_copy_only=False)
        rvals = {
            c: right_t.column(helper_v[c]).to_numpy(zero_copy_only=False)
            for c in value_cols
        }
        order = np.lexsort((rt, rk))
        rk, rt = rk[order], rt[order]
        rvals = {c: v[order] for c, v in rvals.items()}
        rstarts = (
            np.flatnonzero(np.concatenate(([True], rk[1:] != rk[:-1])))
            if rk.shape[0]
            else np.empty(0, np.int64)
        )
        rbounds = np.concatenate((rstarts, [rk.shape[0]]))
        rkey_of_run = rk[rstarts] if rk.shape[0] else rk

        keys = left_t.column(key_col).to_numpy(zero_copy_only=False)
        ts = left_t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = keys.shape[0]
        match_ts = np.zeros(n, dtype=np.int64)
        hit = np.zeros(n, dtype=bool)  # not a -1 sentinel: pre-epoch ts match
        out_vals = {c: np.full(n, np.nan, dtype=np.float64) for c in value_cols}
        lorder = np.lexsort((ts, keys))
        sk = keys[lorder]
        runs = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1])))
        bounds = np.concatenate((runs, [n]))
        for ri in range(len(runs)):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            pos = np.searchsorted(rkey_of_run, sk[s])
            if pos >= rkey_of_run.shape[0] or rkey_of_run[pos] != sk[s]:
                continue
            a, b = int(rbounds[pos]), int(rbounds[pos + 1])
            t_arr = rt[a:b]
            rows = lorder[s:e]
            j = np.searchsorted(t_arr, ts[rows], side="right") - 1
            ok = j >= 0
            rr, jj = rows[ok], j[ok]
            match_ts[rr] = t_arr[jj]
            hit[rr] = True
            for c in value_cols:
                out_vals[c][rr] = rvals[c][a:b][jj]
        miss = ~hit
        out = left_t.append_column(
            prefix + "ts",
            pa.array(match_ts, type=pa.int64(), mask=miss).cast(pa.timestamp("us")),
        )
        for c in value_cols:
            out = out.append_column(
                prefix + c, pa.array(out_vals[c], type=pa.float64(), mask=miss)
            )
        return out

    # Packed exchange (functions/exchange.py): blobs instead of row-granular
    # shuffle rows; resolve() already guards columnless/empty partitions.
    from plakar_ray.functions.exchange import packed_exchange

    return packed_exchange(tagged, [key_col], num_partitions, resolve, pa.table({}))


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
        from plakar_ray.functions.exchange import packed_exchange

        out = packed_exchange(
            slim, [user_col], max(8, cpus // 4), sessions_part, pa.table({})
        ).to_pandas()
    out = out.sort_values(user_col)
    return pa.table(
        {
            user_col: pa.array(out[user_col], type=pa.int64()),
            "n_sessions": pa.array(out["n_sessions"], type=pa.int64()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
        }
    )
