"""Sources: the pages/documents tables.

The engine's primary input is a Parquet table of Common-Crawl-style web pages
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).
Two deterministic providers:

* `read_documents(sf_dir)` — the driver's documents table, read with column
  pruning (only what the pipeline needs leaves storage).
* `pages_from_documents(sf_dir)` — derives the full pages schema from the
  documents table (deterministic: url/warc_ts from doc_id, html wraps text),
  so SQL oracles can reproduce every derived column.
* `synthesize_pages(...)` — fixture builder with planted exact/near
  duplicates (FIXTURES.md F1/F5), used by tests and the recall oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.goprng import GoRand

EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (us)


def read_documents(sf_dir: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _pages_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = batch.column("text")
    import pyarrow.compute as pc

    url = pa.array([f"https://docs.example/{i:08d}" for i in doc_id.tolist()])
    warc_ts = pa.array(
        (EPOCH_US + doc_id * 1_000_000).astype("int64"), type=pa.int64()
    ).cast(pa.timestamp("us"))
    html = pc.binary_join_element_wise(
        pa.scalar(b"<html><body>", type=pa.binary()),
        text.cast(pa.binary()),
        pa.scalar(b"</body></html>", type=pa.binary()),
        pa.scalar(b"", type=pa.binary()),
    )
    return pa.table(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": batch.column("lang"),
        }
    )


def pages_from_documents(sf_dir: str):
    """documents -> pages schema (BASELINE.json input_hint), deterministic."""
    return read_documents(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        _pages_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _messy_urls_batch(batch: pa.Table) -> pa.Table:
    """Deterministic crawl-shaped URL mess over documents: groups of up to 7
    doc_ids share a path (re-crawl snapshots of one resource), and each URL
    carries one of five surface variations a canonicalizer must normalize —
    mixed-case host, explicit default port, tracking params (alone or mixed
    with a kept param), fragments, trailing slash. Pure integer-CASE
    construction so a DuckDB oracle rebuilds the identical raw URLs."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = np.array(["Docs.Example", "docs.example:443", "docs.example"])
    suffixes = np.array(["?utm_source=feed", "#section-2", "/", "?q=1&utm_campaign=x", ""])
    url = pa.array(
        [
            f"https://{hosts[i % 3]}/{i // 7:08d}{suffixes[i % 5]}"
            for i in doc_id.tolist()
        ]
    )
    warc_ts = pa.array(
        (EPOCH_US + doc_id * 1_000_000).astype("int64"), type=pa.int64()
    ).cast(pa.timestamp("us"))
    return pa.table({"url": url, "warc_ts": warc_ts})


def messy_url_pages(sf_dir: str):
    """(url, warc_ts) crawl-log slice with deterministic URL mess — the
    input for URL canonicalization / snapshot dedup."""
    return read_documents(sf_dir, columns=["doc_id"]).map_batches(
        _messy_urls_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------- fixtures ---

_WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an had they you were their one all we can "
    "her has there been if more when will would who so no out up into them "
    "do time very my made over did down only way find use may water long"
).split()


def apply_insertions(data: bytes, n: int, edit_size: int, seed: int) -> bytes:
    """Seeded random insertions, byte-compatible with the reference's
    applyInsertions (cmd/cdc/resync.go:134-147): positions via Intn, inserted
    bytes via Read, same single PRNG stream."""
    r = GoRand(seed)
    out = bytearray(data)
    for _ in range(n):
        pos = r.intn(len(out)) if len(out) > 0 else 0
        ins = r.read(edit_size)
        out[pos:pos] = ins
    return bytes(out)


def apply_spread_insertions(data: bytes, n: int, marker: bytes = b"X") -> bytes:
    """Deterministic edit model for SQL-oracle twins: insert `marker` at the
    n evenly-spread positions p_j = (len*j)//(n+1), j=1..n, all expressed in
    ORIGINAL-string coordinates (so DuckDB can rebuild the edited copy with
    static substr/concat — no PRNG required). Semantics mirror the reference's
    applyInsertions (cmd/cdc/resync.go:134-147) with positions made
    closed-form instead of drawn from the seeded Go PRNG."""
    size = len(data)
    parts: list[bytes] = []
    prev = 0
    for j in range(1, n + 1):
        pos = (size * j) // (n + 1)
        parts.append(data[prev:pos])
        parts.append(marker)
        prev = pos
    parts.append(data[prev:])
    return b"".join(parts)


def apply_insertions_ascii(data: bytes, n: int, edit_size: int, seed: int) -> bytes:
    """Like apply_insertions but inserted bytes are mapped to [a-z] so the
    result round-trips str<->utf-8 byte-identically (fixture texts live in
    Arrow string columns, which are UTF-8)."""
    r = GoRand(seed)
    out = bytearray(data)
    for _ in range(n):
        pos = r.intn(len(out)) if len(out) > 0 else 0
        ins = bytes(0x61 + (b % 26) for b in r.read(edit_size))
        out[pos:pos] = ins
    return bytes(out)


def synthesize_pages(
    n_pages: int = 500,
    seed: int = 42,
    dup_fraction: float = 0.1,
    near_dup_fraction: float = 0.1,
    avg_words: int = 800,
) -> tuple[pa.Table, pa.Table]:
    """Deterministic pages fixture with planted duplicates.

    Returns (pages, expected_pairs):
      pages: url, warc_ts, html, text, lang
      expected_pairs: url_a, url_b, kind ("exact" | "near(k,m)")
    Base pages are word soup; an exact dup copies a base page verbatim; a
    near dup applies k seeded insertions of m bytes (resync.go semantics).
    """
    rng = np.random.default_rng(seed)
    n_exact = int(n_pages * dup_fraction)
    n_near = int(n_pages * near_dup_fraction)
    n_base = n_pages - n_exact - n_near

    texts: list[str] = []
    for _ in range(n_base):
        n_words = max(16, int(rng.normal(avg_words, avg_words // 4)))
        words = rng.choice(_WORDS, size=n_words)
        texts.append(" ".join(words.tolist()))

    urls = [f"https://site{i % 97:04d}.example/p/{i:06d}" for i in range(n_pages)]
    pairs_a: list[int] = []
    pairs_b: list[int] = []
    kinds: list[str] = []

    k_choices = [1, 2, 4, 8, 16, 32, 64]
    m_choices = [1, 16]
    for j in range(n_exact):
        src = int(rng.integers(0, n_base))
        texts.append(texts[src])
        pairs_a.append(src)
        pairs_b.append(n_base + j)
        kinds.append("exact")
    for j in range(n_near):
        src = int(rng.integers(0, n_base))
        k = int(rng.choice(k_choices))
        m = int(rng.choice(m_choices))
        edited = apply_insertions_ascii(
            texts[src].encode(), k, m, seed=int(seed + 1000 + j)
        )
        texts.append(edited.decode())
        pairs_a.append(src)
        pairs_b.append(n_base + n_exact + j)
        kinds.append(f"near({k},{m})")

    langs = [["en", "de", "fr", "xx"][i % 4] for i in range(n_pages)]
    pages = pa.table(
        {
            "page_id": pa.array(np.arange(n_pages, dtype=np.int64)),
            "url": pa.array(urls),
            "warc_ts": pa.array(
                np.arange(n_pages, dtype="int64") * 1_000_000 + EPOCH_US,
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            "html": pa.array(
                [f"<html><body>{t}</body></html>".encode() for t in texts],
                type=pa.binary(),
            ),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    expected = pa.table(
        {
            "id_a": pa.array(pairs_a, type=pa.int64()),
            "id_b": pa.array(pairs_b, type=pa.int64()),
            "url_a": pa.array([urls[a] for a in pairs_a]),
            "url_b": pa.array([urls[b] for b in pairs_b]),
            "kind": pa.array(kinds),
        }
    )
    return pages, expected


def synthesize_media_jpeg(sf_dir: str, cap: int = 256):
    """Deterministic multimodal fixture keyed to the documents table: one
    baseline-JPEG payload per document row (up to `cap`), pixels seeded by
    media_id and encoded by the pure-numpy encoder (functions/jpeg.py) —
    no image library anywhere, so the bytes are identical on every host.
    Schema matches the opaque-binary media-column convention:
    (media_id:int64, kind:string, payload:binary)."""
    import numpy as np
    import pyarrow.parquet as pq

    from plakar_ray.functions.jpeg import encode_jpeg

    n = min(int(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows), cap)
    payloads = []
    for i in range(n):
        rng = np.random.default_rng(123000 + i)
        h = 24 + (i % 4) * 8
        w = 32 + (i % 3) * 16
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payloads.append(
            encode_jpeg(px, quality=85, subsampling="420" if i % 2 else "444")
        )
    import pyarrow as pa

    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
