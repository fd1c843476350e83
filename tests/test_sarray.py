"""Suffix-array substring dedup (pipelines/sarray.py): kernel contract
vs brute force, equivalence with the gram-hash path, separator safety,
and the partition-local distributed mode."""

import numpy as np
import pyarrow as pa
import pytest

from plakar_ray.pipelines.dedup import substring_dup_spans
from plakar_ray.pipelines.sarray import (
    _sa_dup_positions,
    substring_dup_spans_sa,
    truncated_suffix_groups,
)


def brute_dup_positions(docs: list[str], L: int) -> set[tuple[int, int]]:
    from collections import defaultdict

    occ = defaultdict(set)
    for d, s in enumerate(docs):
        b = s.encode()
        for p in range(len(b) - L + 1):
            occ[b[p : p + L]].add(d)
    out = set()
    for d, s in enumerate(docs):
        b = s.encode()
        for p in range(len(b) - L + 1):
            if len(occ[b[p : p + L]]) >= 2:
                out.add((d, p))
    return out


def test_truncated_groups_match_windows():
    rng = np.random.default_rng(11)
    for _ in range(40):
        n = int(rng.integers(1, 300))
        L = int(rng.integers(1, 16))
        data = rng.integers(97, 101, n).astype(np.uint8)
        g = truncated_suffix_groups(data, L)
        wins = {}
        for i in range(n - L + 1):
            wins.setdefault(bytes(data[i : i + L]), []).append(i)
        for members in wins.values():
            ranks = {int(g[i]) for i in members}
            assert len(ranks) == 1  # equal windows -> one group
        # distinct windows -> distinct groups
        firsts = [members[0] for members in wins.values()]
        assert len({int(g[i]) for i in firsts}) == len(firsts)


def test_truncated_groups_pad_byte_small_input():
    """Regression: inputs of 0xFF (== the pad byte) shorter than the
    doubling step used to crash with a numpy broadcast error (the seed
    ranks all collide, so the loop reached step > n). Any uint8 data of
    any length must group correctly."""
    for n in (1, 2, 3, 5, 7, 9):
        for L in (8, 16, 24, 33):
            data = np.full(n, 0xFF, dtype=np.uint8)
            g = truncated_suffix_groups(data, L)
            assert g.shape == (n,)
            if n > L:
                # equal windows (all-0xFF) share one group
                assert len({int(x) for x in g[: n - L + 1]}) == 1
    # mixed content around the pad byte still groups by window equality
    data = np.array([0xFF, 0xFF, 1, 0xFF, 0xFF, 1, 0xFF], dtype=np.uint8)
    g = truncated_suffix_groups(data, 3)
    assert int(g[0]) == int(g[3])  # FF FF 01 == FF FF 01
    assert int(g[0]) != int(g[1])


def test_dup_positions_vs_brute_force():
    rng = np.random.default_rng(23)
    for _ in range(25):
        L = int(rng.integers(2, 8))
        docs = [
            "".join(rng.choice(list("abcd"), size=int(rng.integers(0, 50))))
            for _ in range(7)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()), "text": docs}
        )
        out = _sa_dup_positions(t, L, "doc_id", "text").to_pandas()
        assert set(zip(out.doc_id, out.pos)) == brute_dup_positions(docs, L)


def test_intra_doc_repeats_do_not_count():
    # same L-gram twice in ONE doc only: not a cross-doc duplicate
    docs = ["xxabcdefxxabcdef", "zzzzzzzz"]
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "text": docs})
    out = _sa_dup_positions(t, 6, "doc_id", "text")
    assert out.num_rows == 0


def test_separator_safety_at_doc_ends():
    # doc 0 ends with the bytes doc 1 begins with; no window actually
    # shared inside a single document -> nothing detected (a naive
    # unseparated concatenation would match across the boundary)
    docs = ["AAAABBBB", "BBBBAAAA", "CCCCCCCC"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": docs})
    out = _sa_dup_positions(t, 8, "doc_id", "text")
    assert out.num_rows == 0
    # while the genuinely shared 4-byte grams ARE found at L=4
    out4 = _sa_dup_positions(t, 4, "doc_id", "text").to_pandas()
    assert set(zip(out4.doc_id, out4.pos)) == brute_dup_positions(docs, 4)


def test_unicode_and_edge_docs():
    docs = ["héllo wörld née", "wörld née again", "", "ab"]
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": docs})
    out = _sa_dup_positions(t, 5, "doc_id", "text").to_pandas()
    assert set(zip(out.doc_id, out.pos)) == brute_dup_positions(docs, 5)


@pytest.mark.usefixtures("ray_session")
def test_equivalence_with_gram_path(fixture_docs):
    sa = (
        substring_dup_spans_sa(fixture_docs, gram_len=24)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    gram = (
        substring_dup_spans(fixture_docs, gram_len=24)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sa.equals(gram)


@pytest.mark.usefixtures("ray_session")
def test_partition_local_mode(fixture_docs):
    # distributed mode (threshold 0): every block runs its own SA; with
    # the fixture materialized into one block the result is still exact
    import ray.data

    rows = fixture_docs.take_all()
    one_block = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
                "text": [r["text"] for r in rows],
            }
        )
    )
    dist = (
        substring_dup_spans_sa(one_block, gram_len=24, local_threshold_bytes=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exact = (
        substring_dup_spans_sa(one_block, gram_len=24)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert dist.equals(exact)


@pytest.fixture
def fixture_docs():
    import ray.data

    rng = np.random.default_rng(5)
    shared = "".join(rng.choice(list("abcdefgh "), size=120))
    docs = []
    for d in range(40):
        body = "".join(rng.choice(list("abcdefgh "), size=int(rng.integers(30, 200))))
        if d % 3 == 0:  # plant the shared span in a third of the docs
            cut = int(rng.integers(0, len(body)))
            body = body[:cut] + shared + body[cut:]
        docs.append(body)
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()), "text": docs}
        )
    )
