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

Measured cost (BENCH/sarray_scale_r4.json): ~2 MB/s/core at L=24 —
sort-bound, 3 u64 argsorts per partition (the same order as published
ExactSubstr suffix-array builds); the gram/winnow exchange path runs
~100x faster per core. Use the SA where byte-exactness is the point
(certification, within-shard final pass, oracle twin), the winnowed
gram exchange where throughput is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.pipelines.dedup import _merge_span_batch

# One 0xFF byte never occurs in valid UTF-8 (max legal byte is 0xF4); a
# run of L of them between documents guarantees no L-byte window that
# starts inside one document can byte-match a window crossing another
# document's end (the first L bytes of any candidate window are content
# bytes, and content never contains 0xFF).
_SEP_BYTE = 0xFF


def truncated_suffix_groups(data: np.ndarray, L: int) -> np.ndarray:
    """Group id per suffix of `data` (uint8), grouping suffixes by their
    first L bytes — the rank array of an L-truncated suffix array built
    by Manber-Myers prefix doubling, with two speedups that keep it
    byte-exact:

    - the seed round ranks by the first min(L, 8) bytes at once (one
      big-endian u64 word per position, one argsort) instead of starting
      at span 1, so L=24 needs 3 sorts total (8 -> 16 -> 24);
    - each doubling round packs (rank, shifted rank) into ONE uint64
      sort key (both halves < 2^32 — per-task partitions are far below
      4 GiB) so every round is a single-key argsort, not a 2-key
      lexsort. The final round pairs span-s ranks at offset L-s, so the
      grouping is by EXACTLY L bytes.

    Contract (what _sa_dup_positions relies on): for any two FULL-window
    positions i, j (i + L <= n and j + L <= n),
    group[i] == group[j]  <=>  data[i:i+L] == data[j:j+L], byte-exact —
    every compared byte of a full window is a real byte at every round.
    Positions within L-1 of the end pad their word reads with 0xFF;
    their group ids are only meaningful relative to each other (callers
    never use them — window starts past n-L are not candidates).
    Early-exits when every position is already in its own group.
    """
    return _groups_and_order(data, L)[0]


def _groups_and_order(data: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """(rank, order): rank is truncated_suffix_groups' contract; order is
    the L-truncated suffix array itself — positions sorted so that
    rank[order] is non-decreasing (the final round's sort, free to
    reuse: _sa_dup_positions groups candidates along it with no extra
    sort)."""
    n = int(data.size)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    if n >= 1 << 32:
        raise ValueError("suffix-array partition exceeds 2^32 bytes; shard it")
    L = max(1, int(L))

    # Seed: rank by the first min(L, 8) bytes via one u64-word argsort.
    s0 = min(L, 8)
    word = np.zeros(n, dtype=np.uint64)
    for j in range(min(s0, n)):
        b = np.full(n, _SEP_BYTE, dtype=np.uint8)
        b[: n - j] = data[j:]
        word |= b.astype(np.uint64) << np.uint64(8 * (s0 - 1 - j))
    if s0 > n:  # the missing low bytes are all-pad, a shared constant
        pad = sum(_SEP_BYTE << (8 * (s0 - 1 - j)) for j in range(n, s0))
        word |= np.uint64(pad)
    order = np.argsort(word)  # grouping needs no stability: quicksort
    w_s = word[order]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = w_s[1:] != w_s[:-1]
    rank = np.empty(n, dtype=np.uint64)
    rank[order] = np.cumsum(new) - 1
    n_groups = int(new.sum())
    span = s0

    combined = word  # reuse the u64 scratch
    while span < L and n_groups < n:
        step = min(span, L - span)  # new span = span + step, capped at L
        # combined = rank * 2^32 + (rank[i+step] + 1), 0 past the end
        np.left_shift(rank, np.uint64(32), out=combined)
        if step < n:  # step >= n: every second component is past-the-end
            combined[: n - step] |= rank[step:] + np.uint64(1)
        order = np.argsort(combined)
        c_s = combined[order]
        new[0] = True
        new[1:] = c_s[1:] != c_s[:-1]
        rank[order] = np.cumsum(new) - 1
        n_groups = int(new.sum())
        span += step
    return rank.astype(np.int64), order


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

    rank, sa_order = _groups_and_order(buf, L)

    # Candidate positions: stride-1 window starts fully inside a doc.
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    cand = np.repeat(starts, counts) + within
    is_cand = np.zeros(buf.size, dtype=bool)
    is_cand[cand] = True
    # The SA order IS a group-sorted walk: filtering it to candidates
    # keeps them grouped with NO extra sort (sort cost is the whole
    # kernel, see the bench note in substring_dup_spans_sa).
    sel_sorted = sa_order[is_cand[sa_order]]
    m = sel_sorted.size
    if m == 0:
        return empty
    g_s = rank[sel_sorted]
    newg = np.empty(m, dtype=bool)
    newg[0] = True
    newg[1:] = g_s[1:] != g_s[:-1]
    gstart = np.flatnonzero(newg)
    # Cross-doc rule, cheap form: suffix groups are byte-exact, so a
    # window is duplicated across documents iff its group's doc ids are
    # not all equal — min(id) != max(id) per group (>= 2 distinct needs
    # only min != max, no per-group distinct count).
    doc_of = np.repeat(
        np.arange(len(lens), dtype=np.int32), lens + L
    )  # buffer position -> doc row (one cheap repeat, no binary search)
    doc_idx = doc_of[sel_sorted]
    id_s = ids[doc_idx]
    keep_group = np.minimum.reduceat(id_s, gstart) != np.maximum.reduceat(
        id_s, gstart
    )
    if not keep_group.any():
        return empty
    gsize = np.diff(np.append(gstart, m))
    keep = np.repeat(keep_group, gsize)
    return pa.table(
        {
            id_col: pa.array(id_s[keep], type=pa.int64()),
            "pos": pa.array(
                sel_sorted[keep] - starts[doc_idx[keep]], type=pa.int64()
            ),
        }
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
        if total == 0:
            return ray.data.from_arrow(
                block_spans(
                    pa.table(
                        {
                            id_col: pa.array([], type=pa.int64()),
                            text_col: pa.array([], type=pa.string()),
                        }
                    )
                )
            )
        if total <= local_threshold_bytes:
            # Single global SA, but in a WORKER task, not the driver: the
            # SA working set is ~40 B per corpus byte, so a corpus just
            # under the threshold needs ~10 GB — repartition(1) hands the
            # whole corpus to one map task and keeps the driver thin.
            return ds.repartition(1).map_batches(
                block_spans,
                batch_size=None,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

    return ds.map_batches(
        block_spans, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
