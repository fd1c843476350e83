"""Unit + integration tests for the packed keyed exchange
(plakar_ray/functions/exchange.py): block-granular blob shuffle that
replaces Ray's row-granular hash repartition on every keyed exchange in
the repo."""

import numpy as np
import pyarrow as pa
import pytest

from plakar_ray.functions.exchange import (
    PACKED_SCHEMA,
    bucket_ids,
    pack_batch,
    packed_exchange,
    unpack_batch,
)


def _table(n=10_000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 997, n), type=pa.int64()),
            "ku": pa.array(
                rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64),
                type=pa.uint64(),
            ),
            "s": pa.array(
                [f"key-{i % 131}" for i in range(n)], type=pa.string()
            ),
            "payload": pa.array(
                ["x" * int(i % 7) for i in range(n)], type=pa.large_string()
            ),
        }
    )


def _sorted_pd(t: pa.Table):
    return (
        t.to_pandas()
        .sort_values(list(t.column_names), kind="mergesort")
        .reset_index(drop=True)
    )


def test_pack_unpack_round_trip():
    t = _table()
    packed = pack_batch(t, ["ku"], 64)
    assert packed.column_names == ["bucket", "blob"]
    assert packed.num_rows <= 64
    back = unpack_batch(packed, t.schema.empty_table())
    import pandas as pd

    pd.testing.assert_frame_equal(_sorted_pd(t), _sorted_pd(back))


def test_same_key_same_bucket_int_and_string():
    t = _table()
    for cols in (["k"], ["ku"], ["s"], ["k", "s"]):
        b = bucket_ids(t, cols, 37)
        assert b.min() >= 0 and b.max() < 37
        import pandas as pd

        df = pd.DataFrame({"b": b})
        for c in cols:
            df[c] = t.column(c).to_pandas()
        # every distinct key maps to exactly one bucket
        assert (df.groupby(cols)["b"].nunique() == 1).all()


def test_empty_inputs():
    t = _table(0)
    assert pack_batch(t, ["k"], 8).num_rows == 0
    out = unpack_batch(PACKED_SCHEMA.empty_table(), t.schema.empty_table())
    assert out.num_rows == 0
    assert out.column_names == t.column_names


def test_packed_exchange_equals_row_exchange(ray_session):
    """The exchange contract: reduce_fn sees every row of each of its keys
    exactly once; the union of reduce outputs over a min-per-key reducer
    equals a driver groupby."""
    import ray.data

    t = _table(50_000, seed=11)

    def min_per_key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], type=pa.int64()),
                    "m": pa.array([], type=pa.uint64()),
                }
            )
        k = batch.column("k").to_numpy(zero_copy_only=False)
        v = batch.column("ku").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table(
            {
                "k": pa.array(k[starts], type=pa.int64()),
                "m": pa.array(v[starts], type=pa.uint64()),
            }
        )

    ds = ray.data.from_arrow(t).repartition(13)
    out = packed_exchange(
        ds, ["k"], 7, min_per_key, t.schema.empty_table()
    ).to_pandas()
    got = out.sort_values("k").reset_index(drop=True)

    exp = (
        t.to_pandas()
        .groupby("k", as_index=False)["ku"]
        .min()
        .rename(columns={"ku": "m"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["m"].to_numpy() == exp["m"].to_numpy()).all()


def test_packed_exchange_empty_dataset(ray_session):
    import ray.data

    t = _table(0)

    def ident(batch: pa.Table) -> pa.Table:
        return batch

    out = packed_exchange(
        ray.data.from_arrow(t), ["k"], 4, ident, t.schema.empty_table()
    )
    df = out.to_pandas()
    # every empty partition reduces the schema'd empty table
    assert len(df) == 0


def test_bucket_block_independent_for_variable_width_strings():
    """A key's bucket must not depend on which block it appears in: the
    numpy S-dtype fold the first version used padded keys to the BLOCK's
    max width, so 'key-1' bucketed differently next to a longer key.
    Also covers non-ASCII and binary keys."""
    from plakar_ray.functions.exchange import bucket_ids

    def bucket(keys, typ=pa.string()):
        t = pa.table({"k": pa.array(keys, type=typ)})
        return bucket_ids(t, ["k"], 64)

    a = bucket(["key-1", "key-22"])
    b = bucket(["key-1", "muchlongerkey-999"])
    assert a[0] == b[0]
    u = bucket(["héllo", "héllo", "wörld"])
    assert u[0] == u[1]
    fixed = bucket([b"\x01" * 32, b"\x01" * 32], pa.binary(32))
    assert fixed[0] == fixed[1]
    var = bucket([b"\x00ab", b"ab"], pa.large_binary())
    assert var.shape == (2,)  # distinct keys may share or differ — no crash
