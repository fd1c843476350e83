"""Unit gates for the md5 evidence twins (stages/evidence.py) beyond the
DuckDB oracle parity checked in test_entry.py."""

import numpy as np
import pyarrow as pa

from plakar_ray.stages import evidence as ev


def _batch(texts, ids=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(ids or list(range(n)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )


def test_wide_and_long_signatures_agree():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",  # < 3 tokens: absent from long, n_shingles 0 in wide
        "",
        "alpha beta gamma alpha beta gamma delta",
    ]
    long = ev.ngram_minhash_sig_batch(_batch(texts), num_perm=8)
    wide = ev.ngram_minhash_sig_wide_batch(_batch(texts), num_perm=8)
    # counts are DISTINCT shingles: doc 3 has 5 trigrams, one repeated
    assert wide.column("n_shingles").to_pylist() == [7, 0, 0, 4]
    sigs = np.array(wide.column("sig").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )).reshape(4, 8)
    by_doc = {}
    for did, pid, mh in zip(
        long.column("doc_id").to_pylist(),
        long.column("perm_id").to_pylist(),
        long.column("minhash64").to_pylist(),
    ):
        by_doc.setdefault(did, [0] * 8)[pid] = mh
    assert set(by_doc) == {0, 3}
    assert by_doc[0] == [int(x) for x in sigs[0]]
    assert by_doc[3] == [int(x) for x in sigs[3]]
    # shingle-less docs carry the sentinel signature (filtered by BandStage)
    assert (sigs[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_simhash_md5_token_cache_consistency():
    texts = ["red green blue", "blue green red red"]  # distinct-token equal
    cold = ev.simhash_md5_batch(_batch(texts))
    ev._TOK_CACHE.clear()
    warm_miss = ev.simhash_md5_batch(_batch(texts))
    assert cold.equals(warm_miss)
    # distinct-token semantics: same token set => same sketch
    sh = cold.column("simhash64").to_pylist()
    assert sh[0] == sh[1]


def test_srp_sketch_scale_invariant():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((32, 64)).astype(np.float32)
    def tbl(m):
        flat = pa.array(m.reshape(-1).astype(np.float32), type=pa.float32())
        return pa.table(
            {
                "vec_id": pa.array(range(m.shape[0]), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, 64),
            }
        )
    a = ev.srp_sketch_batch(tbl(emb))
    b = ev.srp_sketch_batch(tbl(emb * 4.0))  # power-of-two: exact scaling
    assert a.column("simhash").equals(b.column("simhash"))
    # 16-bit sketches only
    assert max(a.column("simhash").to_pylist()) < (1 << 16)


def test_md5_clusters_distributed_path_identical(ray_session):
    """clusters_from_signatures over the md5 evidence signatures: the
    size-gated driver-local path (what the driver's DuckDB oracle
    value-checks) and the distributed hash-partition exchange +
    label-propagation path produce identical cluster tables — extending the
    oracle's guarantee to the distributed tail."""
    import ray.data

    import pyarrow.parquet as pq
    from plakar_ray.pipelines.dedup import clusters_from_signatures

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = ev.ngram_minhash_signatures_wide(ray.data.from_arrow(t), num_perm=16)
    local = clusters_from_signatures(sigs.materialize(), bands=4)
    sigs2 = ev.ngram_minhash_signatures_wide(ray.data.from_arrow(t), num_perm=16)
    dist = clusters_from_signatures(
        sigs2.materialize(), bands=4, local_threshold=0, distributed_cc_threshold=0
    )
    assert local.num_rows > 0
    assert local.equals(dist)


def test_md5_clusters_salted_path_identical(ray_session):
    """Salted hot-bucket machinery (sub-bucket split + 2-level hub
    reconnect) must not change cluster assignments: the salted distributed
    exchange equals the unsalted driver-local path on the md5 evidence
    signatures — the invariant that lets minhash_lsh_clusters_salted_md5
    share minhash_lsh_clusters_md5's SQL oracle verbatim."""
    import ray.data

    import pyarrow.parquet as pq
    from plakar_ray.pipelines.dedup import clusters_from_signatures

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = ev.ngram_minhash_signatures_wide(ray.data.from_arrow(t), num_perm=16)
    plain = clusters_from_signatures(sigs.materialize(), bands=4)
    sigs2 = ev.ngram_minhash_signatures_wide(ray.data.from_arrow(t), num_perm=16)
    salted = clusters_from_signatures(
        sigs2.materialize(), bands=4, salt_buckets=4, local_threshold=0
    )
    assert plain.num_rows > 0
    assert plain.equals(salted)


def test_md5_gram_winnow_batch_matches_bruteforce():
    """_md5_gram_winnow_batch: md5u64 window hashes (native kernel or
    hashlib) + production winnow selection == brute-force per-window
    leftmost argmin over hashlib md5 values."""
    import hashlib

    L, w = 8, 4
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "aaaaaaaaaaaaaaaaaaaaaa",  # constant: tie-breaking exercised
        "short",  # < L: no grams
        "exactlyLen",  # v < w: whole-sequence argmin
    ]
    out = ev._md5_gram_winnow_batch(_batch(texts), L, w, "doc_id", "text")
    got = {
        (i, p): g
        for g, i, p in zip(
            out.column("gram64").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("pos").to_pylist(),
        )
    }
    want = {}
    for d, t in enumerate(texts):
        b = t.encode()
        v = len(b) - L + 1
        if v <= 0:
            continue
        hs = [
            int.from_bytes(hashlib.md5(b[i : i + L]).digest()[:8], "little")
            for i in range(v)
        ]
        if v <= w:
            sel = {min(range(v), key=lambda i: (hs[i], i))}
        else:
            sel = {
                min(range(k, k + w), key=lambda i: (hs[i], i))
                for k in range(v - w + 1)
            }
        for p in sel:
            want[(d, p)] = hs[p]
    assert got == want


def test_winnow_spans_md5_distributed_path_identical(ray_session):
    """substring_winnow_spans_md5: the size-gated driver-local tail (what
    the DuckDB oracle value-checks) and the forced packed-exchange tail
    produce identical span tables."""
    import ray.data

    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def run(threshold):
        out = (
            ev.substring_winnow_spans_md5(
                ray.data.from_arrow(t), gram_len=24, winnow_w=8,
                local_threshold=threshold,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return out

    local = run(2_000_000)
    dist = run(0)
    assert len(local) > 0
    assert local.equals(dist)
