"""Truncated-suffix-array substring dedup — the literal suffix-array
realization of the north rule's "suffix-array substring" dedup (Lee et
al. 2021, "Deduplicating Training Data Makes Language Models Better",
whose ExactSubstr deduplicator builds a suffix array per corpus shard on
one box; reference parity target: the same cross-document duplicated-
substring semantics as pipelines/dedup.substring_dup_spans, which the
driver's raw-substring DuckDB oracle certifies).

Relationship to the gram-hash family (pipelines/dedup.py):

- `substring_dup_spans` (stride-1 rolling grams) and the winnowed scale
  path are the 100-TB deployment shapes: they ship hash rows through the
  packed gram exchange, so duplication is detected GLOBALLY but gram
  identity is a 64-bit hash (collision risk bounded, documented).
- THIS module sorts the actual suffixes (prefix-doubling / Manber-Myers,
  truncated at L bytes), so gram grouping is byte-exact and collision-
  FREE with no hash at all — and it needs NO exchange: each task
  detects every duplicated position among the documents it holds.

Scale shape: the SA detector is partition-local by construction (the
Lee et al. deployment is exactly this — one suffix array per shard).
Run it exchange-free over shard-locality partitions (same-domain /
same-crawl docs land together, where near-total duplication lives), and
compose with the winnowed gram exchange when cross-partition coverage
is required; under `local_threshold_bytes` the whole corpus fits one
SA and the result is globally exact (the driver-checked query shape).
Working set is ~5 int64 arrays over the padded corpus per doubling
round (~40 B/byte), so size SA partitions to ~256 MB of text per task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.pipelines.dedup import (
    _cross_doc_positions,
    _merge_span_batch,
)

# One 0xFF byte never occurs in valid UTF-8 (max legal byte is 0xF4); a
# run of L of them between documents guarantees no L-byte window that
# starts inside one document can byte-match a window crossing another
# document's end (the first L bytes of any candidate window are content
# bytes, and content never contains 0xFF).
_SEP_BYTE = 0xFF


def truncated_suffix_groups(data: np.ndarray, L: int) -> np.ndarray:
    """Group id per suffix of `data` (uint8), grouping suffixes by their
    first min(L, remaining) bytes — the rank array of an L-truncated
    suffix array built by Manber-Myers prefix doubling (ceil(log2 L)
    lexsort rounds; the final round pairs span-s ranks at offset L-s so
    the grouping is by EXACTLY L bytes, not the next power of two).

    Two full-window positions i, j (i + L <= n) satisfy
    group[i] == group[j]  <=>  data[i:i+L] == data[j:j+L], byte-exact.
    Suffixes shorter than L rank their missing tail as -1 (< any byte),
    so they never collide with a full window. Early-exits when every
    suffix is already in its own group (no duplicate possible).
    """
    n = int(data.size)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    L = max(1, int(L))
    rank = data.astype(np.int64)  # span-1 ranks: the bytes themselves
    span = 1
    key2 = np.empty(n, dtype=np.int64)
    while span < L:
        step = min(span, L - span)  # new span = span + step, capped at L
        key2[: n - step] = rank[step:]
        key2[n - step :] = -1
        order = np.lexsort((key2, rank))
        r_s, k_s = rank[order], key2[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])
        n_groups = int(new.sum())
        nxt = np.empty(n, dtype=np.int64)
        nxt[order] = np.cumsum(new) - 1
        rank = nxt
        if n_groups == n:  # all suffixes distinct: refinement is a no-op
            break
        span += step
    return rank


def _sa_dup_positions(
    batch: pa.Table, gram_len: int, id_col: str, text_col: str
) -> pa.Table:
    """(id, text) rows -> (doc_id, pos) of every position whose L-byte
    window occurs in >= 2 DISTINCT documents of this batch (the exact
    cross-doc rule of dedup._cross_doc_positions, keyed on the byte-exact
    suffix group instead of a gram hash)."""
    L = int(gram_len)
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    data, offsets = byte_views(batch.column(text_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    counts = np.maximum(lens - L + 1, 0)  # candidate windows per doc
    total = int(counts.sum())
    if total == 0:
        return empty

    # Padded concatenation: doc bytes + L separator bytes per doc, built
    # with one vectorized scatter (no per-doc Python loop).
    starts = np.concatenate(([0], np.cumsum(lens + L)))[:-1]
    buf = np.full(int(lens.sum() + L * len(lens)), _SEP_BYTE, dtype=np.uint8)
    nbytes = int(lens.sum())
    if nbytes:
        base = int(offsets[0])  # sliced arrays: offsets need not start at 0
        src = np.arange(nbytes, dtype=np.int64)
        shift = np.repeat(starts - (offsets[:-1].astype(np.int64) - base), lens)
        buf[src + shift] = data[base : base + nbytes]

    group = truncated_suffix_groups(buf, L)

    # Candidate positions: stride-1 window starts fully inside a doc.
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    cand = np.repeat(starts, counts) + within
    return _cross_doc_positions(
        pa.table(
            {
                "gram64": pa.array(group[cand].astype(np.uint64), type=pa.uint64()),
                id_col: pa.array(np.repeat(ids, counts), type=pa.int64()),
                "pos": pa.array(within, type=pa.int64()),
            }
        ),
        id_col,
    )


def substring_dup_spans_sa(
    ds,
    gram_len: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold_bytes: int = 256 << 20,
):
    """Suffix-array variant of dedup.substring_dup_spans: byte-exact
    (collision-free, hash-free) duplicated-substring spans >= L across
    documents, as (id, dup_spans, dup_span_bytes).

    Under `local_threshold_bytes` of total text the whole corpus is one
    suffix array and the result is GLOBALLY exact — identical to
    substring_dup_spans (equivalence-tested; the driver's raw-substring
    SQL oracle is shared verbatim). Above it, each block runs its own SA
    and the operator is the partition-local detector described in the
    module docstring: exact within every partition, zero exchanges, one
    streaming pass (compose with the winnowed gram exchange for global
    coverage)."""
    import ray
    import ray.data

    L = int(gram_len)

    def block_spans(batch: pa.Table) -> pa.Table:
        return _merge_span_batch(
            _sa_dup_positions(batch, L, id_col, text_col), L, L, id_col
        )

    ds = ds.materialize()
    if local_threshold_bytes:
        total = sum(
            int(b.nbytes)
            for b in ds.select_columns([text_col]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        if total <= local_threshold_bytes:
            tables = [
                b
                for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
                if len(b)
            ]
            merged = (
                pa.concat_tables(tables, promote_options="default")
                if tables
                else pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        text_col: pa.array([], type=pa.string()),
                    }
                )
            )
            return ray.data.from_arrow(block_spans(merged))

    return ds.map_batches(
        block_spans, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
