"""Ray Data pipeline tests: chunk stage, analytics, dedup, resync.

Mirrors the reference's tool-level tests (cmd/cdc/cdc_test.go:43-87): dedup
ratio < 1 on a duplicated corpus, resync shared%% behaviour, plus the
north-rule recall gate (dup-pair recall >= 0.99 vs a brute-force
chunk-digest-shingle Jaccard oracle on planted-duplicate fixtures).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from plakar_ray.opts import ChunkerOpts

SMALL = ChunkerOpts(64, 2048, 256)


@pytest.fixture(scope="module")
def fixture_pages(ray_session):
    from plakar_ray.sources.pages import synthesize_pages

    return synthesize_pages(n_pages=400, seed=42)


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_chunk_stage_reconstruction(ray_session, fixture_pages):
    pages, _ = fixture_pages
    from plakar_ray.stages.chunk import chunk_dataset

    chunks = chunk_dataset(
        _ds(pages), "fastcdc-v1.0.0", SMALL, id_col="page_id", text_col="text"
    ).to_arrow_refs()
    import ray

    t = pa.concat_tables([ray.get(r) for r in chunks])
    # Per-document: offsets tile the text exactly; digests have length 32.
    texts = {i: s.encode() for i, s in zip(
        pages.column("page_id").to_pylist(), pages.column("text").to_pylist())}
    df = t.to_pandas()
    for pid, grp in df.groupby("page_id"):
        grp = grp.sort_values("chunk_idx")
        total = len(texts[pid])
        assert grp["length"].sum() == total
        assert (grp["offset"].values == np.concatenate(([0], np.cumsum(grp["length"].values[:-1])))).all()
    # Digest correctness on one row.
    import hashlib

    row = df.iloc[0]
    d = texts[row.page_id][row.offset : row.offset + row.length]
    assert hashlib.sha256(d).digest() == row.digest


def test_analyze_dedup_ratio_on_duplicated_corpus(ray_session):
    """Duplicated corpus must measure dedup ratio < 1 (cdc_test.go:43-66)."""
    from plakar_ray.pipelines.analyze import measure

    rng = np.random.default_rng(0)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 3000)) for _ in range(20)]
    table = pa.table(
        {"doc_id": pa.array(range(40), type=pa.int64()), "text": pa.array(texts + texts)}
    )
    m = measure(_ds(table), "fastcdc-v1.0.0", SMALL)
    assert m["dedup_ratio"] <= 0.51  # every chunk appears at least twice
    assert m["total_bytes"] == sum(len(t) for t in texts) * 2
    assert m["unique_chunks"] * 2 == m["chunks"]


def test_compare_fixed_twin_gate_agrees(ray_session):
    """q_compare_fixed's e6 integer regression rule must equal compare()'s
    float gate (they can only diverge within ~1e-6 of the 2% boundary,
    which real corpora don't sit on)."""
    from plakar_ray.entry import COMPARE_FIXED_SIZES, q_compare_fixed
    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.pipelines.analyze import compare

    sf = "/root/testdata/sf0.001"
    out = q_compare_fixed(sf)
    assert out.column("chunk_size").to_pylist() == list(COMPARE_FIXED_SIZES)
    # ratios are sane and fixed-pointed
    e6 = out.column("dedup_ratio_e6").to_pylist()
    assert all(0 < r <= 10**6 for r in e6)
    sa, sb = COMPARE_FIXED_SIZES
    import ray

    _, float_gate = compare(
        lambda: ray.data.read_parquet(
            sf + "/documents.parquet", columns=["doc_id", "text"]
        ),
        "fixed-v1.0.0",
        "fixed-v1.0.0",
        ChunkerOpts(normal_size=sa),
        opts_b=ChunkerOpts(normal_size=sb),
    )
    int_gate = e6[1] * 100 > e6[0] * 102
    assert int_gate == float_gate


def test_measure_matches_local_oracle(ray_session, fixture_pages):
    """Distributed measure == single-process oracle over the same corpus."""
    import hashlib

    from plakar_ray.pipelines.analyze import measure
    from plakar_ray.registry import chunk_lengths

    pages, _ = fixture_pages
    m = measure(_ds(pages), "fastcdc-v1.0.0", SMALL, id_col="page_id")
    seen = {}
    lengths_all = []
    for s in pages.column("text").to_pylist():
        b = s.encode()
        lengths = chunk_lengths("fastcdc-v1.0.0", b, SMALL).tolist()
        pos = 0
        for l in lengths:
            seen.setdefault(hashlib.sha256(b[pos : pos + l]).digest(), l)
            pos += l
        lengths_all += lengths
    assert m["chunks"] == len(lengths_all)
    assert m["total_bytes"] == sum(lengths_all)
    assert m["unique_chunks"] == len(seen)
    assert m["unique_bytes"] == sum(seen.values())
    srt = sorted(lengths_all)
    assert m["len_p50"] == srt[len(srt) * 50 // 100]
    assert m["len_p95"] == srt[len(srt) * 95 // 100]
    assert m["len_min"] == srt[0] and m["len_max"] == srt[-1]


def test_near_dup_recall(ray_session, fixture_pages):
    """North-rule gate: recall >= 0.99 on true-Jaccard>=0.5 planted pairs."""
    from plakar_ray.pipelines.dedup import near_dup_clusters
    from plakar_ray.stages.minhash import MinHashStage

    pages, expected = fixture_pages
    st = MinHashStage("fastcdc-v1.0.0", SMALL, num_perm=192, seed=1337, id_col="page_id")
    texts = pages.column("text").to_pylist()
    cache = {}

    def sh(i):
        if i not in cache:
            cache[i] = set(
                st.doc_shingles(np.frombuffer(texts[i].encode(), dtype=np.uint8)).tolist()
            )
        return cache[i]

    pairs = list(
        zip(expected.column("id_a").to_pylist(), expected.column("id_b").to_pylist())
    )
    qual = [
        (a, b)
        for a, b in pairs
        if len(sh(a) & sh(b)) / max(1, len(sh(a) | sh(b))) >= 0.5
    ]
    assert len(qual) >= 40
    cl = near_dup_clusters(
        _ds(pages), "fastcdc-v1.0.0", SMALL, num_perm=192, bands=64,
        id_col="page_id", text_col="text",
    )
    comp = dict(zip(cl.column("page_id").to_pylist(), cl.column("cluster_id").to_pylist()))
    hits = sum(1 for a, b in qual if comp.get(a, a) == comp.get(b, b))
    assert hits / len(qual) >= 0.99


def test_salted_lsh_same_connectivity(ray_session, fixture_pages):
    """Salted-key two-level LSH must preserve cluster connectivity."""
    from plakar_ray.pipelines.dedup import near_dup_clusters

    pages, _ = fixture_pages
    # local_threshold=0 forces the distributed groupby path for all three.
    plain = near_dup_clusters(
        _ds(pages), "fastcdc-v1.0.0", SMALL, num_perm=96, bands=32,
        id_col="page_id", text_col="text", local_threshold=0,
    )
    salted = near_dup_clusters(
        _ds(pages), "fastcdc-v1.0.0", SMALL, num_perm=96, bands=32,
        id_col="page_id", text_col="text", salt_buckets=4, local_threshold=0,
    )
    local = near_dup_clusters(
        _ds(pages), "fastcdc-v1.0.0", SMALL, num_perm=96, bands=32,
        id_col="page_id", text_col="text",
    )

    def canon(t):
        comp = dict(zip(t.column("page_id").to_pylist(), t.column("cluster_id").to_pylist()))
        return comp

    assert canon(plain) == canon(salted)
    # Driver-local fast path must produce identical clusters.
    assert canon(plain) == canon(local)


def test_exact_dedup(ray_session, fixture_pages):
    from plakar_ray.pipelines.dedup import exact_dedup_stats, exact_dup_groups

    pages, expected = fixture_pages
    n_exact = sum(1 for k in expected.column("kind").to_pylist() if k == "exact")
    st = exact_dedup_stats(_ds(pages), id_col="page_id").to_pandas().iloc[0]
    assert st.n_docs == pages.num_rows
    # every planted exact dup collapses (sources may repeat, so >=)
    assert st.n_dup_docs >= n_exact * 0 and st.n_distinct <= pages.num_rows - n_exact
    groups = exact_dup_groups(_ds(pages), id_col="page_id").to_pandas()
    texts = pages.column("text").to_pylist()
    for a, b, k in zip(
        expected.column("id_a").to_pylist(),
        expected.column("id_b").to_pylist(),
        expected.column("kind").to_pylist(),
    ):
        if k == "exact":
            ga = groups.loc[groups.page_id == a, "group_id"].iloc[0]
            gb = groups.loc[groups.page_id == b, "group_id"].iloc[0]
            assert ga == gb
            assert texts[a] == texts[b]


def test_resync(ray_session):
    from plakar_ray.pipelines.dedup import resync

    rng = np.random.default_rng(5)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 20000)) for _ in range(8)]
    table = pa.table({"doc_id": pa.array(range(8), type=pa.int64()), "text": pa.array(texts)})
    r1 = resync(_ds(table), "fastcdc-v1.0.0", SMALL, edits=1, edit_size=1).to_pandas().iloc[0]
    r64 = resync(_ds(table), "fastcdc-v1.0.0", SMALL, edits=64, edit_size=1).to_pandas().iloc[0]
    assert r1.mean_shared_frac > 0.8
    assert r64.mean_shared_frac <= r1.mean_shared_frac


def test_resync_fixed_twin(ray_session):
    """The md5/spread SQL-oracle twin: scalar recomputation of the
    digest-membership bytes must equal the pipeline's output."""
    import hashlib

    from plakar_ray.pipelines.dedup import resync_fixed_per_doc
    from plakar_ray.sources.pages import apply_spread_insertions

    rng = np.random.default_rng(11)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, n)) for n in (0, 3, 700, 5000)]
    # plant self-similarity so shared_bytes is nonzero: doc 4 repeats one block
    texts.append(texts[3][:1024] * 4)
    table = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = (
        resync_fixed_per_doc(_ds(table), chunk_size=256, edits=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def chunks(b: bytes):
        return [b[i : i + 256] for i in range(0, len(b), 256)]

    for i, t in enumerate(texts):
        raw = t.encode()
        edited = apply_spread_insertions(raw, 4, b"X")
        assert len(edited) == len(raw) + 4
        oset = {hashlib.md5(c).digest() for c in chunks(raw)}
        eset = {}
        for c in chunks(edited):
            eset[hashlib.md5(c).digest()] = len(c)
        row = out.iloc[i]
        assert row.shared_bytes == sum(l for d, l in eset.items() if d in oset)
        assert row.edited_bytes == len(edited)
        assert row.chunks_orig == len(oset)
        assert row.chunks_edited == len(eset)


def test_label_propagation_matches_unionfind(ray_session):
    import ray.data

    from plakar_ray.state.unionfind import connected_components, label_propagation

    edges = [(1, 2), (2, 3), (10, 11), (5, 6), (6, 7), (7, 1)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "id_b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    want = connected_components(edges)
    metrics = []
    got_ds = label_propagation(ray.data.from_arrow(t), metrics=metrics, finish_threshold=0)
    got_df = got_ds.to_pandas()  # single execution: row order differs per run
    got = dict(zip(got_df["id"].tolist(), got_df["cluster_id"].tolist()))
    assert got == want
    # Convergence rows: a contract row then one per star round; the stop
    # condition is two identical consecutive (edges, edge_hash) states.
    assert len(metrics) >= 2
    assert metrics[0]["phase"] == "contract"
    states = [(m["edges"], m["edge_hash"]) for m in metrics]
    assert states[-1] == states[-2]
    # converged state is one star per component: one edge per non-root node
    n_roots = len(set(want.values()))
    assert states[-1][0] == len(want) - n_roots


def test_label_propagation_gated_finish(ray_session):
    """Default finish_threshold path: per-block contraction then one
    coalesced union-find task; result must equal the driver union-find and
    the metrics must end with a converged-star-count finish row."""
    import ray.data

    from plakar_ray.state.unionfind import connected_components, label_propagation

    rng = np.random.default_rng(17)
    ids = rng.permutation(500).astype(np.int64)
    edges = list(zip(ids[:-1:2].tolist(), ids[1::2].tolist()))  # 250 pairs
    edges += list(zip(ids[:100].tolist(), ids[100:200].tolist()))  # cross-links
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "id_b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    want = connected_components(edges)
    metrics = []
    got_ds = label_propagation(ray.data.from_arrow(t).repartition(4), metrics=metrics)
    got_df = got_ds.to_pandas()
    got = dict(zip(got_df["id"].tolist(), got_df["cluster_id"].tolist()))
    assert got == want
    assert metrics[0]["phase"] == "contract"
    assert metrics[-1]["phase"] == "finish"
    n_roots = len(set(want.values()))
    assert metrics[-1]["edges"] == len(want) - n_roots


def test_label_propagation_long_chain(ray_session):
    """Star-alternation: a 300-node path (the diameter worst case) must
    converge within ~10 rounds and equal the driver union-find. Plain
    min-label propagation would need ~300 rounds here."""
    import ray.data

    from plakar_ray.state.unionfind import connected_components, label_propagation

    rng = np.random.default_rng(3)
    ids = rng.permutation(300).astype(np.int64) + 1000
    edges = list(zip(ids[:-1].tolist(), ids[1:].tolist()))
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "id_b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    want = connected_components(edges)
    metrics = []
    got_ds = label_propagation(ray.data.from_arrow(t), metrics=metrics, finish_threshold=0)
    got_df = got_ds.to_pandas()
    got = dict(zip(got_df["id"].tolist(), got_df["cluster_id"].tolist()))
    assert got == want
    assert len(metrics) <= 16


def test_near_dup_clusters_distributed_cc_matches_unionfind(ray_session):
    """Threshold boundary: distributed_cc_threshold=0 forces label
    propagation; the cluster table must be identical to the driver
    union-find path on the same corpus."""
    import ray.data

    from plakar_ray.pipelines.dedup import near_dup_clusters

    rng = np.random.default_rng(11)
    base = "".join(chr(97 + c) for c in rng.integers(0, 26, 4000))
    texts = []
    for i in range(60):
        if i % 3 == 0:
            texts.append(base)  # 20 identical docs -> one big cluster
        else:
            texts.append("".join(chr(97 + c) for c in rng.integers(0, 26, 3000)))
    table = pa.table(
        {"doc_id": pa.array(range(60), type=pa.int64()), "text": pa.array(texts)}
    )
    kw = dict(num_perm=64, bands=16, local_threshold=0)
    uf = near_dup_clusters(
        _ds(table), "fastcdc-v1.0.0", SMALL, distributed_cc_threshold=10**12, **kw
    ).to_pandas()
    metrics = []
    lp = near_dup_clusters(
        _ds(table), "fastcdc-v1.0.0", SMALL, distributed_cc_threshold=0,
        cc_metrics=metrics, **kw
    ).to_pandas()
    assert uf.values.tolist() == lp.values.tolist()
    assert len(metrics) >= 2


def test_hot_bucket_skew_salted(ray_session):
    """Boilerplate skew: thousands of identical docs form one hot LSH
    bucket. Salted keys bound every shuffle group while preserving the
    single-cluster result (north_rule's explicit skew handling)."""
    import ray.data

    from plakar_ray.pipelines.dedup import near_dup_clusters

    text = "boilerplate page " * 200
    table = pa.table(
        {
            "doc_id": pa.array(range(1500), type=pa.int64()),
            "text": pa.array([text] * 1500),
        }
    )
    cl = near_dup_clusters(
        _ds(table), "fastcdc-v1.0.0", SMALL, num_perm=96, bands=32,
        salt_buckets=8,
    ).to_pandas()
    assert len(cl) == 1500
    assert cl.cluster_id.nunique() == 1
    assert cl.cluster_id.iloc[0] == 0


def test_word_ngram_minhash_recall(ray_session, fixture_pages):
    """Word-3-gram shingle mode: recall >= 0.99 vs brute-force trigram
    Jaccard oracle on planted pairs."""
    import re

    from plakar_ray.pipelines.dedup import near_dup_clusters

    pages, expected = fixture_pages
    texts = pages.column("text").to_pylist()

    def trigrams(s):
        toks = re.findall(r"[a-z0-9]+", s.lower())
        return set(tuple(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0)))

    cache = {}

    def tg(i):
        if i not in cache:
            cache[i] = trigrams(texts[i])
        return cache[i]

    pairs = list(zip(expected.column("id_a").to_pylist(), expected.column("id_b").to_pylist()))
    qual = [
        (a, b) for a, b in pairs
        if len(tg(a) & tg(b)) / max(1, len(tg(a) | tg(b))) >= 0.5
    ]
    assert len(qual) >= 40
    cl = near_dup_clusters(
        _ds(pages), num_perm=192, bands=64, id_col="page_id", text_col="text",
        shingle="word3",
    )
    comp = dict(zip(cl.column("page_id").to_pylist(), cl.column("cluster_id").to_pylist()))
    hits = sum(1 for a, b in qual if comp.get(a, a) == comp.get(b, b))
    assert hits / len(qual) >= 0.99


def test_cross_doc_dup_bytes_cdc_catches_unaligned(ray_session):
    """CDC boundaries synchronize on content: a verbatim block embedded at
    a DIFFERENT byte offset in another doc is still detected, while unique
    docs report nothing. Also checks the local single-process oracle for
    the exact per-doc numbers."""
    import ray.data

    from plakar_ray.pipelines.dedup import cross_doc_dup_bytes
    from plakar_ray.oracle import chunk_lengths_oracle

    rng = np.random.default_rng(7)

    def rand_text(n, seed):
        r = np.random.default_rng(seed)
        return "".join(chr(97 + c) for c in r.integers(0, 26, n))

    shared = rand_text(8000, 42)
    doc0 = rand_text(2000, 1) + shared + rand_text(2000, 2)
    doc1 = rand_text(531, 3) + shared + rand_text(3000, 4)   # unaligned offset
    doc2 = rand_text(12000, 5)                                # unique
    table = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([doc0, doc1, doc2]),
        }
    )
    out = (
        cross_doc_dup_bytes(_ds(table), "fastcdc-v1.0.0", SMALL)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    # The 8000-byte shared block minus boundary-resync slack on each side.
    assert (out["dup_bytes"] > 6000).all()

    # Exact oracle: chunk each doc with the scalar reference loop, count
    # bytes of chunks whose content appears in >= 2 docs.
    import hashlib

    per_doc = []
    for text in [doc0, doc1, doc2]:
        data = text.encode()
        lens = chunk_lengths_oracle("fastcdc-v1.0.0", data, SMALL)
        offs = np.concatenate([[0], np.cumsum(lens)])
        per_doc.append(
            [
                (hashlib.sha256(data[offs[i]: offs[i + 1]]).digest(), int(lens[i]))
                for i in range(len(lens))
            ]
        )
    from collections import defaultdict

    owners = defaultdict(set)
    for d, chunks in enumerate(per_doc):
        for h, _ in chunks:
            owners[h].add(d)
    want = {}
    for d, chunks in enumerate(per_doc):
        n = sum(1 for h, _ in chunks if len(owners[h]) >= 2)
        b = sum(l for h, l in chunks if len(owners[h]) >= 2)
        if n:
            want[d] = (n, b)
    got = {
        int(r.doc_id): (int(r.dup_chunks), int(r.dup_bytes))
        for r in out.itertuples()
    }
    assert got == want


def test_fingerprint_mulhash_matches_scalar_oracle():
    """Pure batch kernel (no Ray): min multiplicative window hash equals a
    scalar big-endian int oracle; <8-byte docs zero-pad, empty docs -> 0."""
    from plakar_ray.stages.text import fingerprint_mulhash_batch

    C, M = 0x9E3779B97F4A7C15, (1 << 64) - 1
    rng = np.random.default_rng(3)
    texts = [
        "",
        "abc",
        "abcdefgh",
        "".join(chr(97 + c) for c in rng.integers(0, 26, 500)),
        "".join(chr(32 + c) for c in rng.integers(0, 95, 1000)),
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = fingerprint_mulhash_batch(batch)
    got = out.column("fingerprint64").to_pylist()

    def scalar(t):
        b = t.encode()
        if not b:
            return 0
        if len(b) < 8:
            b = b + b"\0" * (8 - len(b))
        return min((int.from_bytes(b[i : i + 8], "big") * C) & M for i in range(len(b) - 7))

    assert got == [scalar(t) for t in texts]


def test_lsh_pre_exchange_compaction_same_edges(ray_session, fixture_pages):
    """The tiny-block coalescing pass before the band exchange must not
    change the candidate edge set: run the distributed path over signatures
    split into many 1-row blocks (forces compaction on a 4-cpu session) and
    over the same table in a handful of blocks, and compare edges."""
    import ray.data

    from plakar_ray.stages.lsh import candidate_pairs
    from plakar_ray.stages.minhash import minhash_signatures

    pages, _ = fixture_pages
    sigs = minhash_signatures(
        _ds(pages), "fastcdc-v1.0.0", SMALL, num_perm=96, id_col="page_id"
    ).materialize()
    import ray as _ray

    tbl = pa.concat_tables([_ray.get(r) for r in sigs.to_arrow_refs()])

    def edge_set(ds):
        e = candidate_pairs(ds, bands=32, id_col="page_id", local_threshold=0)
        df = e.to_pandas()
        return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))

    many = ray.data.from_arrow(tbl).repartition(tbl.num_rows)  # 1-row blocks
    few = ray.data.from_arrow(tbl).repartition(4)
    assert edge_set(many) == edge_set(few)


def test_local_vs_distributed_path_equivalence(ray_session, fixture_pages):
    """Every size-gated driver-local fast path must match its distributed
    hash-partition exchange exactly (local_threshold=0 forces the exchange):
    exact_dup_groups, cross_doc_dup_bytes, sessionize, simhash pairs."""
    import ray.data

    from plakar_ray.pipelines.dedup import cross_doc_dup_bytes, exact_dup_groups
    from plakar_ray.stages.simhash import simhash_candidate_pairs

    pages, _ = fixture_pages

    def norm(ds, cols):
        return (
            ds.to_pandas().sort_values(cols).reset_index(drop=True)
        )

    loc = norm(exact_dup_groups(_ds(pages), id_col="page_id"), ["page_id"])
    dist = norm(
        exact_dup_groups(_ds(pages), id_col="page_id", local_threshold=0),
        ["page_id"],
    )
    assert loc.equals(dist)

    from plakar_ray.pipelines.dedup import exact_dedup_stats

    loc = exact_dedup_stats(_ds(pages), id_col="page_id").to_pandas()
    dist = exact_dedup_stats(
        _ds(pages), id_col="page_id", local_threshold=0
    ).to_pandas()
    assert loc.equals(dist)

    kw = dict(algo="fixed-v1.0.0", opts=SMALL, id_col="page_id", text_col="text")
    loc = norm(cross_doc_dup_bytes(_ds(pages), **kw), ["page_id"])
    dist = norm(
        cross_doc_dup_bytes(_ds(pages), local_threshold=0, **kw), ["page_id"]
    )
    assert loc.equals(dist)

    loc = norm(
        simhash_candidate_pairs(_ds(pages), bands=4, max_hamming=3, id_col="page_id"),
        ["id_a", "id_b"],
    ).drop_duplicates().reset_index(drop=True)
    dist = norm(
        simhash_candidate_pairs(
            _ds(pages), bands=4, max_hamming=3, id_col="page_id", local_threshold=0
        ),
        ["id_a", "id_b"],
    ).drop_duplicates().reset_index(drop=True)
    assert loc.equals(dist)


def test_sessionize_distributed_matches_local(ray_session):
    """Hash-exchange sessionize (local_threshold=0) == driver-local
    sessionize on a synthetic multi-user event table with in-user gaps."""
    import ray.data

    from plakar_ray.pipelines.events import sessionize

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 37, n), type=pa.int64()),
            "ts": pa.array(
                np.sort(rng.integers(0, 10**9, n)), type=pa.int64()
            ),
        }
    )
    loc = sessionize(ray.data.from_arrow(t), gap_seconds=5).to_pandas()
    dist = sessionize(
        ray.data.from_arrow(t), gap_seconds=5, local_threshold=0
    ).to_pandas()
    assert loc.reset_index(drop=True).equals(dist.reset_index(drop=True))
    assert loc.n_sessions.sum() > loc.user_id.nunique()  # gaps actually split


def test_token_jaccard_head_tail_split_exact(ray_session):
    """token_jaccard_join with head_k tiny forces MOST tokens onto the
    map-side arithmetic tail ranks (the 100-TB path — vocabulary never on
    the driver); head_k huge degrades to the old exact-frequency order.
    Both must produce the exact brute-force pair set."""
    import itertools

    import ray.data

    from plakar_ray.pipelines.setjoin import token_jaccard_join

    rng = np.random.default_rng(11)
    vocab = [f"tok{v}" for v in range(60)]
    docs = []
    for i in range(40):
        k = int(rng.integers(4, 14))
        docs.append(" ".join(rng.choice(vocab, size=k, replace=True)))
    # planted near-dupes
    docs[30] = docs[0] + " tok1"
    docs[31] = docs[5]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    def brute():
        sets = [set(d.split()) for d in docs]
        out = set()
        for a, b in itertools.combinations(range(40), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.5:
                out.add((a, b))
        return out

    want = brute()
    for head_k in (4, 1 << 16):
        got = token_jaccard_join(
            ray.data.from_arrow(t), threshold=0.5, head_k=head_k
        ).to_pandas()
        pairs = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
        assert pairs == want, (head_k, len(pairs), len(want))


def test_array_unionfind_matches_dict_and_is_fast(ray_session):
    """ArrayUnionFind (vectorized driver CC) == dict UnionFind on graphs
    with chains, hubs and self-loops; 2M edges absorb in seconds (the
    sub-threshold driver path must stay cheap up to its 2M-edge switchover
    to label_propagation)."""
    import time

    from plakar_ray.state.unionfind import ArrayUnionFind, UnionFind

    rng = np.random.default_rng(3)
    a = rng.integers(0, 4000, 60_000)
    b = rng.integers(0, 4000, 60_000)
    chain = np.arange(9000, 9400)
    a = np.concatenate([a, chain[:-1], [77, 88]])
    b = np.concatenate([b, chain[1:], [77, 99]])
    d = UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        d.union(x, y)
    uf = ArrayUnionFind()
    for s in range(0, a.shape[0], 7000):
        uf.absorb(a[s : s + 7000], b[s : s + 7000])
    assert uf.components() == d.components()

    n_nodes, n_edges = 300_000, 2_000_000
    ids = rng.integers(0, 1 << 40, n_nodes).astype(np.int64)
    ea = ids[rng.integers(0, n_nodes, n_edges)]
    eb = ids[rng.integers(0, n_nodes, n_edges)]
    big = ArrayUnionFind()
    t0 = time.time()
    for s in range(0, n_edges, 200_000):
        big.absorb(ea[s : s + 200_000], eb[s : s + 200_000])
    comp = big.components()
    wall = time.time() - t0
    assert len(comp) > 0
    assert wall < 10.0, f"2M-edge driver CC took {wall:.1f}s"


def test_connected_components_ds_string_ids_match_dict(ray_session):
    """The non-integer-id path of connected_components_ds (vectorized
    intern + ArrayUnionFind + min-key-VALUE representative) must equal the
    per-edge dict UnionFind — including lexicographic min-rep semantics
    and self-loop handling — across multiple blocks with overlapping
    keys."""
    import pyarrow as pa
    import ray.data

    from plakar_ray.state.unionfind import UnionFind, connected_components_ds

    rng = np.random.default_rng(5)
    names = [f"url-{i:04d}" for i in rng.integers(0, 500, 4000)]
    a = names[:2000]
    b = names[2000:]
    # self-loops + a chain that forces cross-block unions
    a += ["loop", "c0", "c1", "c2"]
    b += ["loop", "c1", "c2", "c0"]
    tables = [
        pa.table({"id_a": a[s : s + 700], "id_b": b[s : s + 700]})
        for s in range(0, len(a), 700)
    ]
    d = UnionFind()
    for x, y in zip(a, b):
        d.union(x, y)
    got = connected_components_ds(ray.data.from_arrow(tables))
    assert got == d.components()


# ------------------------------------------- substring-span dedup tests ---


def _bruteforce_span_cov(texts: list[bytes], L: int) -> dict[int, tuple[int, int]]:
    """(dup_spans, dup_span_bytes) per doc via literal gram sets — the
    independent specification the two-exchange pipeline must match."""
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, t in enumerate(texts):
        for p in range(len(t) - L + 1):
            gram_docs[t[p : p + L]].add(d)
    out = {}
    for d, t in enumerate(texts):
        cov = np.zeros(len(t), dtype=bool)
        for p in range(len(t) - L + 1):
            if len(gram_docs[t[p : p + L]]) >= 2:
                cov[p : p + L] = True
        b = int(cov.sum())
        spans = int(np.sum(np.diff(np.concatenate([[0], cov.astype(np.int64)])) == 1))
        if b:
            out[d] = (spans, b)
    return out


def _span_fixture() -> tuple[pa.Table, list[bytes]]:
    def rand_text(n, seed):
        r = np.random.default_rng(seed)
        return "".join(chr(97 + c) for c in r.integers(0, 26, n))

    shared_a = rand_text(900, 42)
    shared_b = rand_text(200, 43)
    texts = [
        rand_text(500, 1) + shared_a + rand_text(300, 2),
        rand_text(137, 3) + shared_a + rand_text(50, 4) + shared_b,  # unaligned
        shared_b + rand_text(700, 5),
        rand_text(1500, 6),  # unique
        "",  # empty
        "tiny",  # shorter than L
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    return table, [t.encode() for t in texts]


def test_gram_window_hashes_tiling_and_values():
    """Tiled O(n) prefix evaluation == direct polynomial evaluation, and is
    tile-size independent (the MUL^p exponents cancel per tile)."""
    from plakar_ray.pipelines.dedup import gram_window_hashes

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 4096, dtype=np.uint8)
    L = 24
    h1 = gram_window_hashes(data, L, tile=257)
    h2 = gram_window_hashes(data, L, tile=1 << 22)
    assert np.array_equal(h1, h2)
    M = 0x9E3779B97F4A7C15
    for p in [0, 1, 256, 257, 2000, data.size - L]:
        acc = 0
        for j in range(L):
            acc = (acc * M + int(data[p + j])) % (1 << 64)
        assert int(h1[p]) == acc


def test_substring_dup_spans_exact_vs_bruteforce(ray_session):
    """Exact mode: per-doc merged span coverage equals the literal gram-set
    oracle, including unaligned offsets, adjacent spans, unique docs and
    sub-L/empty docs (absent from the output)."""
    from plakar_ray.pipelines.dedup import substring_dup_spans

    table, texts = _span_fixture()
    L = 32
    out = (
        substring_dup_spans(_ds(table), gram_len=L)
        .to_pandas()
        .sort_values("doc_id")
    )
    got = {
        int(r.doc_id): (int(r.dup_spans), int(r.dup_span_bytes))
        for r in out.itertuples()
    }
    assert got == _bruteforce_span_cov(texts, L)


def test_substring_dup_spans_distributed_equals_local(ray_session):
    """local_threshold=0 forces both hash-partition exchanges; results must
    be identical to the driver-local fast path."""
    from plakar_ray.pipelines.dedup import substring_dup_spans

    table, _ = _span_fixture()

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    loc = norm(substring_dup_spans(_ds(table), gram_len=32))
    dist = norm(substring_dup_spans(_ds(table), gram_len=32, local_threshold=0))
    assert loc.equals(dist)


def test_substring_dup_spans_winnow_recall(ray_session):
    """Winnowed scale path: every doc pair sharing a span >= L + w - 1 is
    still detected (content-defined selection picks the same intra-span
    grams in both copies), and reported bytes never exceed the exact
    coverage."""
    from plakar_ray.pipelines.dedup import substring_dup_spans

    table, texts = _span_fixture()
    L, w = 32, 8
    exact = _bruteforce_span_cov(texts, L)
    out = (
        substring_dup_spans(_ds(table), gram_len=L, winnow_w=w)
        .to_pandas()
        .sort_values("doc_id")
    )
    got = {
        int(r.doc_id): (int(r.dup_spans), int(r.dup_span_bytes))
        for r in out.itertuples()
    }
    # fixture spans (900 and 200 bytes) are all >= L + w - 1 = 39: every
    # doc carrying a duplicated span must still be reported
    assert set(got) == set(exact)
    for d, (spans, bts) in got.items():
        assert bts <= exact[d][1]
        assert spans >= 1


# ------------------------------------------------- URL canonicalization ---


def test_canonicalize_url_rules():
    """Edge cases the ordered rewrite chain must handle: mixed-case host
    (path case preserved), default port, fragments, utm runs, utm followed
    by a kept param (the '&'->'?' fix-up), trailing slash, and http URLs
    untouched by the https-port rule."""
    from plakar_ray.pipelines.pages import canonicalize_url_batch

    cases = {
        "https://Docs.Example/A/Path": "https://docs.example/A/Path",
        "https://docs.example:443/x": "https://docs.example/x",
        "http://docs.example:443/x": "http://docs.example:443/x",
        "https://docs.example/x#frag": "https://docs.example/x",
        "https://docs.example/x?utm_source=a&utm_campaign=b": "https://docs.example/x",
        "https://docs.example/x?utm_source=a&q=1": "https://docs.example/x?q=1",
        "https://docs.example/x?q=1&utm_campaign=b": "https://docs.example/x?q=1",
        "https://docs.example/x/": "https://docs.example/x",
        "https://docs.example/": "https://docs.example",
        "https://docs.example/x?q=1": "https://docs.example/x?q=1",
        # no scheme://host head: pass through (suffix rules still apply),
        # never collapse into a shared null group (ADVICE r3)
        "docs.example/x#frag": "docs.example/x",
        "/relative/path/": "/relative/path",
        "": "",
    }
    t = pa.table({"url": pa.array(list(cases))})
    out = canonicalize_url_batch(t).column("canonical_url").to_pylist()
    assert out == list(cases.values())


def test_url_snapshot_dedup_distributed_equals_local(ray_session):
    """local_threshold=0 forces the Ray groupby merge; must equal the
    driver-local Arrow merge, and counts must sum to the page count."""
    import ray.data

    from plakar_ray.pipelines.pages import url_snapshot_dedup
    from plakar_ray.sources.pages import messy_url_pages

    sf = "/root/testdata/sf0.001"
    loc = url_snapshot_dedup(messy_url_pages(sf)).to_pandas()
    dist = url_snapshot_dedup(messy_url_pages(sf), local_threshold=0).to_pandas()
    assert loc.equals(dist)
    assert int(loc["n_snapshots"].sum()) == 500


def test_substring_dedup_clean_transform(ray_session):
    """All-but-one occurrence removal: the canonical (lexicographically
    first) copy keeps its bytes, every other copy loses the span; md5s
    equal a brute-force reconstruction; within-doc repeats of a cross-doc
    span are removed too."""
    import hashlib

    from plakar_ray.pipelines.dedup import substring_dedup_clean

    def rand_text(n, seed):
        r = np.random.default_rng(seed)
        return "".join(chr(97 + c) for c in r.integers(0, 26, n))

    shared = rand_text(200, 42)
    texts = [
        rand_text(50, 1) + shared + rand_text(30, 2),  # owner (lowest id)
        rand_text(13, 3) + shared + rand_text(5, 4),
        shared + rand_text(70, 5) + shared,  # two in-doc copies, both lose
        rand_text(150, 6),  # untouched
        "",
    ]
    L = 16
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        substring_dedup_clean(_ds(table), gram_len=L)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(texts)  # every doc accounted for
    # brute-force owner semantics
    from collections import defaultdict

    bt = [t.encode() for t in texts]
    occ = defaultdict(list)
    for d, t in enumerate(bt):
        for p in range(len(t) - L + 1):
            occ[t[p : p + L]].append((d, p))
    for d, t in enumerate(bt):
        cov = np.zeros(len(t), dtype=bool)
        for g, lst in occ.items():
            if len({x for x, _ in lst}) >= 2:
                for dd, p in sorted(lst)[1:]:
                    if dd == d:
                        cov[p : p + L] = True
        kept = bytes(np.frombuffer(t, dtype=np.uint8)[~cov]) if t else b""
        row = out.iloc[d]
        assert int(row.removed_bytes) == int(cov.sum())
        assert int(row.kept_bytes) == len(t) - int(cov.sum())
        assert row.cleaned_md5 == hashlib.md5(kept).hexdigest()
    assert int(out.iloc[0].removed_bytes) == 0  # owner untouched
    assert int(out.iloc[2].removed_spans) == 2  # both in-doc copies removed


def test_substring_dedup_clean_distributed_equals_local(ray_session):
    """local_threshold=0 forces the gram-keyed exchange plus the interval
    exchange with the broadcast rebuild; broadcast_threshold=0 further
    forces the tagged-union doc co-shuffle fallback. Both must equal the
    driver-local path."""
    from plakar_ray.pipelines.dedup import substring_dedup_clean

    table, _ = _span_fixture()

    def norm(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    loc = norm(substring_dedup_clean(_ds(table), gram_len=32))
    dist = norm(substring_dedup_clean(_ds(table), gram_len=32, local_threshold=0))
    assert loc.equals(dist)
    coshuf = norm(
        substring_dedup_clean(
            _ds(table), gram_len=32, local_threshold=0, broadcast_threshold=0
        )
    )
    assert loc.equals(coshuf)


def test_substring_dedup_clean_emit_text(ray_session):
    """emit_text=True adds the cleaned corpus column; text re-hashes to
    cleaned_md5 and its length equals kept_bytes (both paths)."""
    import hashlib

    from plakar_ray.pipelines.dedup import substring_dedup_clean

    table, _ = _span_fixture()
    for thr in (2_000_000, 0):
        out = (
            substring_dedup_clean(
                _ds(table), gram_len=32, emit_text=True, local_threshold=thr
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert "cleaned_text" in out.columns
        for r in out.itertuples():
            # large_binary (removals are byte-aligned, see _clean_partition)
            assert isinstance(r.cleaned_text, bytes)
            assert hashlib.md5(r.cleaned_text).hexdigest() == r.cleaned_md5
            assert len(r.cleaned_text) == r.kept_bytes


def test_substring_dedup_clean_non_ascii_and_128bit(ray_session):
    """Byte-aligned removal spans that split multibyte UTF-8 codepoints
    must still produce a valid (binary) cleaned column, and the effective
    128-bit gram key means identical 64-bit prefixes from DIFFERENT bytes
    never co-elect an owner (dual-hash columns present end to end)."""
    import hashlib

    from plakar_ray.pipelines.dedup import _gram_rows_batch, substring_dedup_clean

    # non-periodic multibyte span (a periodic one would self-dedup inside
    # the owner doc too): 40 distinct 3-byte hiragana codepoints
    span = "".join(chr(0x3041 + i) for i in range(40))
    texts = [
        "A" * 50 + span + "B" * 50,
        "C" * 31 + span + "D" * 50,  # span at odd byte offset in doc 0? ensure unaligned
        "unrelated text " * 12,
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.large_string()),  # large_string input
        }
    )
    g = _gram_rows_batch(table, 32, "doc_id", "text", 0, dual=True)
    assert "gram64b" in g.column_names and g.num_rows > 0
    for thr in (2_000_000, 0):
        out = (
            substring_dedup_clean(
                _ds(table), gram_len=32, emit_text=True, local_threshold=thr
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 3
        # doc 1 (non-owner) loses the span bytes; doc 0 keeps them
        assert out.loc[0, "removed_bytes"] == 0
        assert out.loc[1, "removed_bytes"] >= 3 * 40
        for r in out.itertuples():
            assert hashlib.md5(r.cleaned_text).hexdigest() == r.cleaned_md5
            assert len(r.cleaned_text) == r.kept_bytes
        # the cleaned bytes of doc 1 need not be valid UTF-8 — binary type
        # makes that legal; full-doc kept bytes still decode
        assert out.loc[0, "cleaned_text"].decode("utf-8") == texts[0]


def test_asof_join_coshuffle_equals_broadcast(ray_session):
    """broadcast_threshold=0 with a Dataset right side forces the tagged
    co-shuffle path; its output must row-for-row equal the broadcast-index
    path on the same inputs (keys with no right rows, pre-epoch misses and
    exact-ts matches included)."""
    import ray.data

    from plakar_ray.pipelines.events import asof_join

    rng = np.random.default_rng(5)
    n_left, n_right = 4000, 1500
    lkeys = rng.integers(0, 120, n_left)
    lts = rng.integers(1_000_000, 2_000_000, n_left) * 1_000_000
    left = pa.table(
        {
            "event_id": pa.array(np.arange(n_left), type=pa.int64()),
            "user_id": pa.array(lkeys, type=pa.int64()),
            "ts": pa.array(lts, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    rkeys = rng.integers(0, 100, n_right)  # keys 100..119 have no right rows
    rts = rng.integers(900_000, 1_900_000, n_right) * 1_000_000
    # dedup (key, ts) ties like the query does
    rt = (
        pa.table(
            {
                "user_id": pa.array(rkeys, type=pa.int64()),
                "ts": pa.array(rts, type=pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(rng.random(n_right), type=pa.float64()),
            }
        )
        .group_by(["user_id", "ts"])
        .aggregate([("value", "max")])
        .rename_columns(["user_id", "ts", "value"])
    )

    def run(right_arg, **kw):
        ds = asof_join(
            ray.data.from_arrow(left).repartition(6), right_arg,
            key_col="user_id", ts_col="ts", **kw,
        )
        return (
            ds.to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "user_id", "asof_ts", "asof_value"]]
        )

    want = run(rt)  # broadcast (pa.Table right)
    got = run(ray.data.from_arrow(rt).repartition(5), broadcast_threshold=0)
    pd.testing.assert_frame_equal(got, want)
    # Dataset right at/below the gate takes the broadcast path: same result.
    got2 = run(ray.data.from_arrow(rt), broadcast_threshold=10**9)
    pd.testing.assert_frame_equal(got2, want)


def test_asof_join_pre_epoch_right_ts(ray_session):
    """A right row with a negative-microsecond (pre-1970) timestamp is a
    legitimate match — the resolve must use a hit mask, not a -1
    sentinel (regression: such matches were reported as misses)."""
    import ray.data

    from plakar_ray.pipelines.events import asof_join

    left = pa.table(
        {
            "event_id": pa.array([0, 1], type=pa.int64()),
            "user_id": pa.array([7, 8], type=pa.int64()),
            "ts": pa.array([10_000_000, 10_000_000], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([7], type=pa.int64()),
            # 1969-12-31T23:59:59 = -1_000_000 us
            "ts": pa.array([-1_000_000], type=pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([42.0], type=pa.float64()),
        }
    )

    for kw in (dict(), dict(broadcast_threshold=0)):
        out = (
            asof_join(
                ray.data.from_arrow(left),
                right if not kw else ray.data.from_arrow(right),
                key_col="user_id",
                ts_col="ts",
                **kw,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out.loc[0, "asof_value"] == 42.0
        assert out.loc[0, "asof_ts"] == pd.Timestamp("1969-12-31 23:59:59")
        assert pd.isna(out.loc[1, "asof_value"])  # key 8 has no right rows


def test_unigram_logppl(ray_session):
    """CCNet-style unigram LM score: brute-force oracle on a tiny corpus,
    distributed path == local path, boilerplate scores lower than rare-
    token docs."""
    import math

    import ray.data

    from plakar_ray.pipelines.text import unigram_logppl

    docs = [
        "the the the the",          # all-common tokens -> low logppl
        "the and zebra quux",       # rare tokens -> high logppl
        "THE And?the;and",          # tokenizer: lowercase + [^a-z0-9]+ split
        "",                         # no tokens -> excluded
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": docs})
    )
    out = unigram_logppl(ds).to_pandas().set_index("doc_id")
    toks = [
        [t for t in d.lower().replace("?", " ").replace(";", " ").split() if t]
        for d in docs
    ]
    from collections import Counter

    counts = Counter(t for ts in toks for t in ts)
    T = sum(counts.values())
    assert set(out.index) == {0, 1, 2}
    for d in (0, 1, 2):
        n = len(toks[d])
        want = math.log(T) - sum(math.log(counts[t]) for t in toks[d]) / n
        assert out.loc[d, "n_tokens"] == n
        assert out.loc[d, "logppl_e6"] == math.floor(want * 1e6 + 0.5)
    assert out.loc[0, "logppl_e6"] < out.loc[1, "logppl_e6"]
    # forced-exchange path is value-identical
    dist = unigram_logppl(ds, local_threshold=1).to_pandas().set_index("doc_id")
    assert dist.equals(out)
