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
    """(url, text_sha256) — the per-url byte-identity invariant surface.

    Rows tile the text column's data buffer contiguously, so the whole
    batch goes through the batched segment-sha256 kernel (native OpenSSL
    via stages.chunk.ChunkerStage._digest_segments, hashlib fallback inside) in one
    call; hex encoding is functions.strhash.hex_string_array (one shared
    vectorized nibble-lookup encoder, no per-row Python)."""

    def digest(batch: pa.Table) -> pa.Table:
        from plakar_ray.functions.strhash import hex_string_array
        from plakar_ray.stages.chunk import ChunkerStage

        data, offsets = byte_views(batch.column("text"))
        n = len(batch)
        stream = data[offsets[0] : offsets[-1]] if n else data[:0]
        lengths = np.diff(offsets)
        d32 = ChunkerStage._digest_segments(lengths, stream)
        return pa.table(
            {"url": batch.column("url"), "text_sha256": hex_string_array(d32)}
        )

    parts = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
    out = parts.to_pandas().sort_values("url")
    return pa.table(
        {"url": pa.array(out["url"]), "text_sha256": pa.array(out["text_sha256"])}
    )


def _pages_prep_fn(langs: list[str] | None):
    """Shared flagship prep: filter langs + non-empty text -> extract ->
    sha256-derived int64 doc ids (batched native segment kernel; urls are
    hashed so every downstream exchange shuffles fixed-width ints, never
    variable-length urls)."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        t = extract_text_batch(batch)
        keep = pc.greater(pc.utf8_length(t.column("text")), 0)
        if langs is not None:
            keep = pc.and_(keep, pc.is_in(t.column("lang"), value_set=pa.array(langs)))
        t = t.filter(keep)
        udata, uoffs = byte_views(t.column("url"))
        ustream = udata[uoffs[0] : uoffs[-1]] if len(t) else udata[:0]
        from plakar_ray.stages.chunk import ChunkerStage

        d32 = ChunkerStage._digest_segments(np.diff(uoffs), ustream)
        ids = (
            np.ascontiguousarray(d32[:, :8]).view(np.uint64).ravel() >> np.uint64(1)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": t.column("url"),
                "text": t.column("text"),
            }
        )

    return prep


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
    the shuffle; the url mapping joins back via broadcast). cluster_url is
    the lexicographic-min url of the cluster (canonical representative)."""
    from plakar_ray.pipelines.dedup import near_dup_clusters

    prepped = ds.map_batches(
        _pages_prep_fn(langs), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    clusters = near_dup_clusters(
        prepped, algo, opts, num_perm=num_perm, bands=bands,
        salt_buckets=salt_buckets,
    )
    return _attach_cluster_urls(prepped, clusters)


def page_near_dup_clusters_md5(ds, langs: list[str] | None = None,
                               num_perm: int = 16, bands: int = 4):
    """The pages flagship with the md5 EVIDENCE signature family
    (stages/evidence.py) in place of CDC MinHash: same prep (extract +
    batched sha256 url ids), same LSH banding + star edges + connected
    components (pipelines/dedup.clusters_from_signatures — the exact
    exchange the CDC flagship runs), same distributed url join-back.
    DuckDB reproduces the signatures value-exactly, so the driver's oracle
    checks the END-TO-END pages pipeline: pages derivation, text-extract
    identity, cluster membership, and canonical-url election."""
    from plakar_ray.pipelines.dedup import clusters_from_signatures
    from plakar_ray.stages.evidence import ngram_minhash_signatures_wide

    prepped = ds.map_batches(
        _pages_prep_fn(langs), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sigs = ngram_minhash_signatures_wide(prepped, num_perm=num_perm)
    clusters = clusters_from_signatures(sigs, bands=bands)
    return _attach_cluster_urls(prepped, clusters)


def _attach_cluster_urls(prepped, clusters: pa.Table) -> pa.Table:
    """(url, cluster_url) from (doc_id, cluster_id) labels.

    Join urls back DISTRIBUTIVELY: the cluster table is bounded by the
    duplicate-doc count, so it broadcasts once (ray.put) and one
    vectorized searchsorted pass over the prepped Dataset attaches
    labels — the url column is never collected corpus-wide (the old
    driver-side url_map dict held every url). Only the edge-touched
    rows (∝ dup docs, same bound as `clusters`) return to the driver,
    where the canonical representative (min url per cluster) is elected
    over that bounded table."""
    import ray

    cl_ids = clusters.column("doc_id").to_numpy(zero_copy_only=False)
    cl_lab = clusters.column("cluster_id").to_numpy(zero_copy_only=False)
    order = np.argsort(cl_ids, kind="stable")
    ref = ray.put((cl_ids[order], cl_lab[order]))

    def attach(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "url": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ci, clab = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if ci.shape[0] == 0:
            return empty
        pos = np.minimum(np.searchsorted(ci, ids), ci.shape[0] - 1)
        hit = ci[pos] == ids
        t = batch.filter(pa.array(hit))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "url": t.column("url").cast(pa.string()),
                "label": pa.array(clab[pos[hit]], type=pa.int64()),
            }
        )

    rows = [
        b
        for b in prepped.map_batches(attach, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if len(b)
    ]
    t = (
        pa.concat_tables(rows)
        if rows
        else pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "url": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.int64()),
            }
        )
    )
    # Canonical representative: lexicographic-min url per cluster, elected
    # over the bounded edge-touched table (vectorized groupby-min).
    lab = t.column("label").to_numpy(zero_copy_only=False)
    urls = np.asarray(t.column("url").to_pylist(), dtype=object)
    order = np.lexsort((urls, lab))
    lab_s, url_s = lab[order], urls[order]
    first = np.ones(lab_s.shape[0], dtype=bool)
    first[1:] = lab_s[1:] != lab_s[:-1]
    group = np.cumsum(first) - 1
    rep_per_group = url_s[first]
    cluster_urls = rep_per_group[group[np.argsort(order, kind="stable")]]
    return pa.table(
        {
            "url": t.column("url"),
            "cluster_url": pa.array(cluster_urls.tolist(), type=pa.string()),
        }
    ).sort_by("url")


# ------------------------------------------------- URL canonicalization ---

# Ordered RE2 rewrite rules shared by the vectorized Arrow kernel below and
# (verbatim, via DuckDB regexp_replace which is also RE2) the SQL oracle.
# Order matters: fragments go before param stripping, the '&'->'?' fix-up
# runs after tracking params are removed, trailing slash last.
URL_CANON_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),  # drop fragment
    (r"^(https://[^/?#:]*):443([/?#].*)?$", r"\1\2"),  # default https port
    (r"[?&]utm_[a-z]+=[^&#]*", ""),  # tracking params (any position)
    (r"^([^?&]*)&", r"\1?"),  # kept param left leading with '&'
    (r"([^/])/$", r"\1"),  # trailing slash
]

_URL_HEAD_RE = r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append `canonical_url`: scheme+host lowercased, default https port /
    fragment / utm_* tracking params / trailing slash stripped. Entirely
    pyarrow.compute RE2 kernels — no per-row Python."""
    import pyarrow.compute as pc

    u = batch.column(url_col)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    ex = pc.extract_regex(u, _URL_HEAD_RE)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(ex, "head")), pc.struct_field(ex, "rest"), ""
    )
    # Schemeless / relative / malformed URLs don't match the head regex
    # (extract_regex yields null): pass the original through unchanged
    # instead of collapsing every such URL into one null group. The SQL
    # oracle applies the same CASE fallback.
    u = pc.if_else(pc.is_valid(lowered), lowered, u)
    for pat, rep in URL_CANON_RULES:
        u = pc.replace_substring_regex(u, pat, rep)
    return batch.append_column("canonical_url", u)


def url_snapshot_dedup(
    ds,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    local_threshold: int = 1_000_000,
) -> pa.Table:
    """Crawl snapshot dedup: canonicalize URLs, then per canonical URL keep
    the snapshot count and the newest `warc_ts` ("latest capture wins" — the
    standard crawl-consolidation pass before content dedup). Map-side
    partials (one row per canonical URL per block: count + max ts) make the
    final merge a tiny key-space aggregate — count and max are associative,
    so the exchange moves O(distinct urls), never O(pages)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "canonical_url": pa.array([], type=pa.string()),
                    "n_snapshots": pa.array([], type=pa.int64()),
                    "ts_us": pa.array([], type=pa.int64()),
                }
            )
        c = canonicalize_url_batch(batch, url_col)
        t = pa.table(
            {
                "canonical_url": c.column("canonical_url"),
                "ts_us": c.column(ts_col).cast(pa.int64()),
            }
        )
        g = t.group_by("canonical_url").aggregate(
            [("ts_us", "count"), ("ts_us", "max")]
        )
        return pa.table(
            {
                "canonical_url": g.column("canonical_url"),
                "n_snapshots": g.column("ts_us_count").cast(pa.int64()),
                "ts_us": g.column("ts_us_max"),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if local_threshold and parts.count() <= local_threshold:
        tables = [
            b
            for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = pa.concat_tables(tables) if tables else partial(pa.table({}))
        g = merged.group_by("canonical_url").aggregate(
            [("n_snapshots", "sum"), ("ts_us", "max")]
        )
        out = pa.table(
            {
                "canonical_url": g.column("canonical_url"),
                "n_snapshots": g.column("n_snapshots_sum"),
                "latest_ts": g.column("ts_us_max").cast(pa.timestamp("us")),
            }
        )
    else:
        from ray.data.aggregate import Max, Sum

        df = (
            parts.groupby("canonical_url")
            .aggregate(Sum("n_snapshots"), Max("ts_us"))
            .to_pandas()
        )
        out = pa.table(
            {
                "canonical_url": pa.array(df["canonical_url"]),
                "n_snapshots": pa.array(df["sum(n_snapshots)"], type=pa.int64()),
                "latest_ts": pa.array(df["max(ts_us)"], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )
    return out.sort_by("canonical_url")
