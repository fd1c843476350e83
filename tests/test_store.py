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
        pq.read_metadata(p).num_rows for p in glob.glob(f"{out}/store/bucket=*/data.parquet")
    )
    recipes = sum(pq.read_metadata(p).num_rows for p in glob.glob(f"{out}/recipes/*.parquet"))
    assert stored == summary["unique_chunks"]
    assert stored < recipes  # dups collapsed
