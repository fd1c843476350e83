"""Driver-contract smoke + a trimmed in-pytest DuckDB oracle check at
sf0.001 (the driver runs the full comparison at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def test_contract_shape(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 12


def test_oracle_queries_inside_driver_window(ray_session):
    """The driver's CORRECTNESS artifact records only the first 50
    registered queries (docs/correctness_window.md).  Every SQL-oracle
    query must sit inside that window or it silently loses its driver
    value check."""
    import __ray_entry__ as E

    window = list(E.queries())[:50]
    outside = set(E.oracle_sql()) - set(window)
    assert not outside, f"SQL-oracle queries past the 50-entry window: {sorted(outside)}"


def test_entry_runs(ray_session):
    import __ray_entry__ as E

    res = E.entry()
    assert res.num_rows >= 0
    assert set(res.column_names) == {"doc_id", "cluster_id"}


# A fast representative subset; the full set is exercised by
# tools/check_oracle.py and the driver itself.
SUBSET = ["doc_text_stats", "lang_id", "top_tokens", "events_window",
          "exact_dup_groups", "embedding_topk", "chunk_fixed_stats",
          "doc_fingerprints_mul", "ngram_minhash_sigs", "simhash64",
          "minhash_lsh_clusters_md5", "simhash_pairs_md5",
          "pages_near_dup_clusters_md5",
          "embedding_srp_pairs_md5", "embedding_ivf_topk_det"]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as E

    res = E.queries()[name](SF)
    want = con.execute(E.oracle_sql()[name]).df()
    a, b = _canon(res.to_pandas()), _canon(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype(np.float64), bv.astype(np.float64)), c
        else:
            assert (av == bv).all(), c


def test_broadcast_join(ray_session):
    import pyarrow as pa
    import ray.data

    from plakar_ray.functions.join import broadcast_join

    big = pa.table(
        {"k": pa.array([1, 2, 3, 2, 9], type=pa.int64()), "v": pa.array([10, 20, 30, 21, 99])}
    )
    dim = pa.table({"key": pa.array([1, 2, 3], type=pa.int64()), "name": pa.array(["a", "b", "c"])})
    inner = (
        broadcast_join(ray.data.from_arrow(big), dim, on="k", small_on="key")
        .to_pandas()
        .sort_values(["k", "v"])
    )
    assert len(inner) == 4  # k=9 dropped
    assert list(inner.name) == ["a", "b", "b", "c"]
    left = broadcast_join(ray.data.from_arrow(big), dim, on="k", small_on="key", how="left").to_pandas()
    assert len(left) == 5
    assert left.loc[left.k == 9, "name"].isna().all()


def test_evidence_twin_budget(ray_session):
    """Guard the md5 evidence path's Python loop: the twin must stay cheap
    at oracle scale (sf0.001 < 2 s warm) so it can't silently dominate a
    scaled-up driver check corpus."""
    import time

    from plakar_ray import entry as E

    q = E.queries()["minhash_lsh_clusters_md5"]
    q(SF)  # warm workers/caches
    t0 = time.time()
    q(SF)
    assert time.time() - t0 < 2.0
