"""Pages-table pipeline: the web-page front end of the dedup engine.

Input schema (BASELINE.json input_hint):
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

`extract_text` is defined as the IDENTITY on the `text` column (the
reference has no HTML extraction; the per-row invariant demanded by the
driver is *byte-identical extracted text per url* — frozen by a golden
test). The html column is opaque and dropped at the read via column
projection; lang filtering happens before any chunking.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.opts import ChunkerOpts


def read_pages(path: str, with_html: bool = False):
    """Column-pruned read: only url/text/lang leave storage unless the
    caller explicitly wants html."""
    import ray.data

    cols = ["url", "warc_ts", "text", "lang"] + (["html"] if with_html else [])
    return ray.data.read_parquet(path, columns=cols)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html->text extraction point. Identity on `text` by definition (see
    module docstring); keeps url + lang, drops everything else."""
    return pa.table(
        {
            "url": batch.column("url"),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
        }
    )


def text_digests(ds) -> pa.Table:
    """(url, text_sha256) — the per-url byte-identity invariant surface."""

    def digest(batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column("text"))
        out = []
        mv = memoryview(data)
        for i in range(len(batch)):
            out.append(hashlib.sha256(mv[offsets[i] : offsets[i + 1]]).hexdigest())
        return pa.table({"url": batch.column("url"), "text_sha256": pa.array(out)})

    parts = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
    out = parts.to_pandas().sort_values("url")
    return pa.table(
        {"url": pa.array(out["url"]), "text_sha256": pa.array(out["text_sha256"])}
    )


def page_near_dup_clusters(
    ds,
    algo: str = "fastcdc-v1.0.0",
    opts: ChunkerOpts | None = None,
    langs: list[str] | None = None,
    num_perm: int = 192,
    bands: int = 64,
    salt_buckets: int | None = None,
):
    """Full pages flagship: filter langs + non-empty text -> extract ->
    MinHash/LSH -> clusters keyed by url (urls are hashed to int64 ids for
    the shuffle; the url mapping joins back via broadcast)."""
    import pyarrow.compute as pc
    import ray

    from plakar_ray.pipelines.dedup import near_dup_clusters

    def prep(batch: pa.Table) -> pa.Table:
        t = extract_text_batch(batch)
        keep = pc.greater(pc.utf8_length(t.column("text")), 0)
        if langs is not None:
            keep = pc.and_(keep, pc.is_in(t.column("lang"), value_set=pa.array(langs)))
        t = t.filter(keep)
        ids = np.array(
            [int.from_bytes(hashlib.sha256(u.encode()).digest()[:8], "little") >> 1
             for u in t.column("url").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": t.column("url"),
                "text": t.column("text"),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    url_map = {}
    for b in prepped.iter_batches(batch_format="pyarrow", batch_size=None):
        url_map.update(zip(b.column("doc_id").to_pylist(), b.column("url").to_pylist()))
    clusters = near_dup_clusters(
        prepped, algo, opts, num_perm=num_perm, bands=bands,
        salt_buckets=salt_buckets,
    )
    urls = [url_map.get(i, "") for i in clusters.column("doc_id").to_pylist()]
    cluster_urls = [url_map.get(c, "") for c in clusters.column("cluster_id").to_pylist()]
    return pa.table(
        {
            "url": pa.array(urls),
            "cluster_url": pa.array(cluster_urls),
        }
    ).sort_by("url")
