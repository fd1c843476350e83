"""Content-addressed dedup store: unique-chunk sink + byte-exact restore."""

import numpy as np
import pyarrow as pa


def test_store_roundtrip(ray_session, tmp_path):
    import ray.data

    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.pipelines.store import restore_document, write_unique_chunks

    rng = np.random.default_rng(21)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 9000)) for _ in range(12)]
    texts = texts + texts[:6]  # planted exact dups
    table = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = str(tmp_path / "store")
    summary = write_unique_chunks(
        ray.data.from_arrow(table), out, "fastcdc-v1.0.0", ChunkerOpts(256, 4096, 1024)
    )
    assert summary["unique_chunks"] > 0

    # Byte-exact restore (the Copy invariant) incl. a duplicated doc.
    for doc_id in (0, 5, 12, 17):
        assert restore_document(out, doc_id) == texts[doc_id].encode()

    # Dedup effectiveness: duplicated docs add no unique chunks.
    import glob

    import pyarrow.parquet as pq

    stored = sum(
        pq.read_metadata(p).num_rows for p in glob.glob(f"{out}/store/bucket=*/*.parquet")
    )
    recipes = sum(pq.read_metadata(p).num_rows for p in glob.glob(f"{out}/recipes/*.parquet"))
    assert stored == summary["unique_chunks"]
    assert stored < recipes  # dups collapsed


def test_resumable_flagship(ray_session, tmp_path):
    """near_dup_clusters_resumable: shard-partitioned signatures with
    manifest resume; clusters identical to the non-resumable pipeline."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.pipelines.dedup import near_dup_clusters, near_dup_clusters_resumable
    from plakar_ray.sources.pages import synthesize_pages
    from plakar_ray.state.lineage import LineageLog

    pages, _ = synthesize_pages(n_pages=200, seed=31)
    pages = pages.rename_columns(
        ["doc_id" if c == "page_id" else c for c in pages.column_names]
    )
    shards = []
    for i in range(4):
        p = str(tmp_path / f"shard{i}.parquet")
        pq.write_table(pages.slice(i * 50, 50), p)
        shards.append(p)

    opts = ChunkerOpts(64, 2048, 256)
    ckpt = str(tmp_path / "ckpt")
    cl1 = near_dup_clusters_resumable(shards, ckpt, "fastcdc-v1.0.0", opts,
                                      num_perm=96, bands=32)
    # Baseline: in-memory pipeline over the same rows.
    base = near_dup_clusters(ray.data.from_arrow(pages), "fastcdc-v1.0.0", opts,
                             num_perm=96, bands=32)
    as_map = lambda t: dict(zip(t.column("doc_id").to_pylist(),
                                t.column("cluster_id").to_pylist()))
    assert as_map(cl1) == as_map(base)

    # Drop one manifest -> only that shard recomputes; clusters unchanged.
    log = LineageLog(ckpt, "signatures")
    os.remove(log._mpath("shard0002"))
    cl2 = near_dup_clusters_resumable(shards, ckpt, "fastcdc-v1.0.0", opts,
                                      num_perm=96, bands=32)
    assert as_map(cl2) == as_map(base)
    assert len(log.manifest()) == 4


def test_restore_prunes_to_needed_buckets(ray_session, tmp_path):
    """restore_document must open only the digest-prefix buckets its recipe
    needs (the point of the bucket partitioning), and the pruned path list
    must still restore byte-exactly."""
    import glob

    import ray.data

    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.pipelines.store import (
        restore_document,
        store_paths_for_digests,
        write_unique_chunks,
    )

    rng = np.random.default_rng(5)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 30000)) for _ in range(8)]
    table = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    out = str(tmp_path / "store")
    write_unique_chunks(
        ray.data.from_arrow(table), out, "fastcdc-v1.0.0", ChunkerOpts(256, 4096, 1024)
    )

    import pyarrow.dataset as pads

    recipes = pads.dataset(glob.glob(f"{out}/recipes/*.parquet"))
    rec = recipes.to_table(filter=pads.field("doc_id") == 3)
    digests = rec.column("digest").to_pylist()
    paths = store_paths_for_digests(out, digests)
    all_paths = glob.glob(f"{out}/store/bucket=*/*.parquet")
    need_buckets = {d[0] >> 4 for d in digests}
    got_buckets = {int(p.split("bucket=")[1].split("/")[0]) for p in paths}
    assert got_buckets == {
        b for b in need_buckets
        if glob.glob(f"{out}/store/bucket={b}/*.parquet")
    }
    # pruning is real: one doc's chunks cannot need every bucket file here
    assert len(paths) <= len(all_paths)
    # a digest confined to one bucket prunes to exactly that bucket
    one = store_paths_for_digests(out, digests[:1])
    assert {int(p.split("bucket=")[1].split("/")[0]) for p in one} == {digests[0][0] >> 4}
    assert restore_document(out, 3) == texts[3].encode()


def test_ingest_delta_cdc_and_restore(ray_session, tmp_path):
    """Incremental ingest (pipelines/store.py:ingest_delta): CDC-chunked
    snapshot B deduped against snapshot A's store — accounting matches a
    brute-force digest comparison, both snapshots restore byte-exactly
    after the append, and re-ingesting B is a no-op (idempotent delta)."""
    import hashlib

    import ray.data

    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.oracle import chunk_lengths_oracle
    from plakar_ray.pipelines.store import (
        ingest_delta,
        restore_document,
        write_unique_chunks,
    )

    rng = np.random.default_rng(97)
    base = ["".join(chr(97 + c) for c in rng.integers(0, 26, 6000)) for _ in range(8)]
    # snapshot B: two docs unchanged from A, two edited mid-doc (shared
    # prefix/suffix chunks resync), two brand new
    edited = [t[:2000] + "EDITMARKER" + t[2000:] for t in base[2:4]]
    fresh = ["".join(chr(97 + c) for c in rng.integers(0, 26, 6000)) for _ in range(2)]
    a_texts, b_texts = base, base[:2] + edited + fresh
    opts = ChunkerOpts(128, 2048, 512)

    def table(texts, id0):
        return pa.table(
            {
                "doc_id": pa.array(range(id0, id0 + len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )

    out = str(tmp_path / "delta_store")
    write_unique_chunks(
        ray.data.from_arrow(table(a_texts, 0)), out, "fastcdc-v1.0.0", opts
    )
    s = ingest_delta(
        ray.data.from_arrow(table(b_texts, 100)), out, "fastcdc-v1.0.0", opts
    )

    # Brute-force oracle over exact per-doc chunk digests.
    def digests(texts):
        out_d = []
        for t in texts:
            data = t.encode()
            off = 0
            for ln in chunk_lengths_oracle("fastcdc-v1.0.0", data, opts):
                out_d.append(hashlib.sha256(data[off : off + ln]).digest())
                off += ln
        return out_d

    da, db = digests(a_texts), digests(b_texts)
    a_set = set(da)
    dup = sum(1 for d in db if d in a_set)
    new_unique = len({d for d in db if d not in a_set})
    assert s["ingested_chunks"] == len(db)
    assert s["dup_vs_store_chunks"] == dup
    assert s["new_unique_chunks"] == new_unique
    assert s["dup_vs_store_chunks"] > 0  # shared + resynced chunks found
    assert s["new_unique_chunks"] > 0

    # Byte-exact restore across BOTH snapshots after the append.
    assert restore_document(out, 1) == a_texts[1].encode()
    assert restore_document(out, 100) == b_texts[0].encode()
    assert restore_document(out, 102) == b_texts[2].encode()
    assert restore_document(out, 105) == b_texts[5].encode()

    # Idempotent: a second ingest of the same snapshot adds nothing.
    s2 = ingest_delta(
        ray.data.from_arrow(table(b_texts, 200)), out, "fastcdc-v1.0.0", opts
    )
    assert s2["new_unique_chunks"] == 0
    assert s2["dup_vs_store_chunks"] == s2["ingested_chunks"]
