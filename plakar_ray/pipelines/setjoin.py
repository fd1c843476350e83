"""Exact set-similarity self-join (token Jaccard >= t) via prefix filtering.

The scalable EXACT algorithm (Bayardo et al. WWW'07 / Vernica et al.
SIGMOD'10 "MapReduce set-similarity join"), Ray-Data-native:

1. Tokenize + per-document distinct token hashes (vectorized FNV over Arrow
   token buffers).
2. Token order: rare tokens first. Any CONSISTENT total order is correct
   (the theorem below never uses frequencies); rarity order is what makes
   prefixes rare and posting lists short. Only a bounded top-K frequent
   HEAD is ranked exactly (per-block top-K over the combined counts, two
   tiny reduction stages, one small ray.put); every tail token's rank is a
   deterministic function of its hash, computed map-side. Head ranks are
   odd integers above 2^62, tail ranks even integers below it, so two
   distinct tokens can only tie if their 64-bit hashes share bits 2..63 —
   the same negligible-collision class as token identity itself. Ties
   between distinct tokens would break the prefix theorem (each document
   could order a tie differently), which is why the parity split exists.
3. Prefix filter: a document with k tokens emits its first
   p = k - ceil(t*k) + 1 tokens (in global order). THEOREM: if
   J(x, y) >= t, the smallest common token (in global order) lies within
   BOTH prefixes — at most kx - |x∩y| non-common tokens precede it in x,
   and |x∩y| >= ceil(t*kx) implies that position <= px. So grouping prefix
   rows by token finds every qualifying pair: exact, not probabilistic.
4. Candidate pairs per posting list (dedup by pair), then exact
   verification: two hash joins pull both documents' rank arrays and a
   vectorized sorted-merge computes |x∩y|.

Scale notes (100 TB): every wide step is a hash exchange (frequency count is
map-side combined; candidate grouping and the verify joins are keyed hash
shuffles). The GLOBAL vocabulary never exists in one place: only the
HEAD_K most frequent tokens travel to the driver (bounded by K, not by
vocabulary size), and tail tokens — the billions of distinct rare tokens
web text produces — are ranked arithmetically inside each map task. A
tail token's posting list is short by construction (its global frequency
is below the head cutoff), so candidate generation stays bounded even
though tail ranks ignore exact frequencies. Token identity is a 64-bit
splitmix(FNV) hash; two distinct tokens colliding (p ~ V^2 / 2^65) would
merge their postings — negligible and documented rather than silently
assumed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64


def _doc_token_hashes(batch: pa.Table, id_col: str, text_col: str):
    """Per-document DISTINCT token hashes: (ids, per-doc hash arrays as a
    flattened (values, offsets) pair)."""
    import pyarrow.compute as pc

    from plakar_ray.functions.strhash import (
        arrow_token_lists,
        fnv1a64_slices,
        splitmix64,
    )

    lower = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
    starts, ends, data, doc_off = arrow_token_lists(lists)
    n = doc_off.shape[0] - 1
    hs = splitmix64(fnv1a64_slices(starts, ends, data))
    keep = ends > starts
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(doc_off))[keep]
    hs = hs[keep]
    # per-doc distinct: sort by (doc, hash), drop adjacent equals
    order = np.lexsort((hs, doc_idx))
    d, h = doc_idx[order], hs[order]
    if d.shape[0]:
        first = np.empty(d.shape[0], dtype=bool)
        first[0] = True
        first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        d, h = d[first], h[first]
    counts = np.bincount(d, minlength=n)
    return d, h, counts


class TokenCountStage:
    """Map-side combined token counts: batch -> (thash, partial) rows."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, h, _ = _doc_token_hashes(batch, batch.column_names[0], self.text_col)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                # int64 BIT VIEW of the uint64 hash: Ray's hash-shuffle
                # reduce materializes group keys as Python ints, and values
                # >= 2^63 overflow Arrow int64 inference, silently degrading
                # the whole column to pickled-object blocks. Same bits, no
                # overflow, identical grouping.
                "thash": pa.array(uniq.view(np.int64), type=pa.int64()),
                "partial": pa.array(cnt, type=pa.int64()),
            }
        )


_HEAD_BASE = np.int64(1) << np.int64(62)


def _tail_ranks(h: np.ndarray) -> np.ndarray:
    """Map-side rank of a non-head token: bits 2..63 of its hash, low bit
    cleared. Even, < 2^62, identical in every task — a consistent total
    order with no global state."""
    return ((h >> _U64(2)) & ~_U64(1)).astype(np.int64)


class RankedSetStage:
    """batch -> (doc_id, k, ranks list<int64> ascending). Head tokens get
    their broadcast exact rarity rank (odd, >= 2^62); tail tokens get the
    arithmetic hash rank (even, < 2^62) computed locally."""

    def __init__(self, vocab_ref, id_col: str, text_col: str):
        import ray

        self.head_hashes, self.head_ranks = ray.get(vocab_ref)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, h, counts = _doc_token_hashes(batch, self.id_col, self.text_col)
        ranks = _tail_ranks(h)
        if self.head_hashes.shape[0] and h.shape[0]:
            pos = np.searchsorted(self.head_hashes, h)
            pos = np.minimum(pos, self.head_hashes.shape[0] - 1)
            is_head = self.head_hashes[pos] == h
            ranks[is_head] = self.head_ranks[pos[is_head]]
        # sort each doc's ranks ascending (d is already grouped ascending)
        order = np.lexsort((ranks, d))
        ranks = ranks[order]
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # ranks packed as little-endian int64 binary: Ray's hash join does
        # not support list-typed payload columns, binary payloads it does.
        bin_arr = pa.BinaryArray.from_buffers(
            pa.binary(),
            len(counts),
            [
                None,
                pa.py_buffer((offsets * 8).astype(np.int32).tobytes()),
                pa.py_buffer(ranks.astype("<i8").tobytes()),
            ],
        )
        return pa.table(
            {
                self.id_col: ids,
                "k": pa.array(counts.astype(np.int64), type=pa.int64()),
                "ranks": bin_arr,
            }
        )


def _unpack_ranks(col) -> tuple[np.ndarray, np.ndarray]:
    """Binary-packed int64 rank blobs -> (values, element offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.binary()) if col.type != pa.binary() else col
    bufs = arr.buffers()
    byte_off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.int64) if bufs[2] is not None else np.empty(0, dtype=np.int64)
    base = byte_off[0]
    offs = (byte_off - base) // 8
    vals = data[base // 8 : byte_off[-1] // 8]
    return vals, offs


def _prefix_rows(batch: pa.Table, id_col: str, threshold: float) -> pa.Table:
    """(doc_id, k, ranks) -> one row per prefix token (rank, doc_id, k);
    prefix length p = k - ceil(t*k) + 1 over the ascending rank order."""
    vals, offs = _unpack_ranks(batch.column("ranks"))
    k = batch.column("k").to_numpy(zero_copy_only=False)
    p = np.maximum(k - np.ceil(threshold * k).astype(np.int64) + 1, 0)
    p = np.minimum(p, k)
    n = k.shape[0]
    doc_idx = np.repeat(np.arange(n), p)
    within = np.arange(p.sum()) - np.repeat(np.cumsum(p) - p, p)
    flat_idx = offs[:-1][doc_idx] + within
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "rank": pa.array(vals[flat_idx], type=pa.int64()),
            id_col: pa.array(ids[doc_idx], type=pa.int64()),
            "k": pa.array(k[doc_idx], type=pa.int64()),
        }
    )


def _posting_pairs(batch: pa.Table, id_col: str) -> pa.Table:
    """Per hash partition: group prefix rows by rank, emit all (a < b) pairs
    within each posting list."""
    rank = batch.column("rank").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, rank))
    r, i = rank[order], ids[order]
    n = r.shape[0]
    out_a, out_b = [], []
    if n:
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = r[1:] != r[:-1]
        gstart = np.nonzero(newg)[0]
        gend = np.append(gstart[1:], n)
        for s, e in zip(gstart.tolist(), gend.tolist()):
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(i[s:e][ia])
            out_b.append(i[s:e][ib])
    if out_a:
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        t = pa.table(
            {
                "id_a": pa.array(lo[keep], type=pa.int64()),
                "id_b": pa.array(hi[keep], type=pa.int64()),
            }
        )
    else:
        t = pa.table(
            {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
        )
    return t


def _dedup_pairs_block(batch: pa.Table) -> pa.Table:
    a = batch.column("id_a").to_numpy(zero_copy_only=False)
    b = batch.column("id_b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if a.shape[0]:
        first = np.empty(a.shape[0], dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[first], b[first]
    return pa.table(
        {"id_a": pa.array(a, type=pa.int64()), "id_b": pa.array(b, type=pa.int64())}
    )


def _verify_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Candidates with both rank lists attached -> exact Jaccard filter.
    Intersection of two sorted int64 arrays per row via np.intersect1d
    (assume_unique: both are distinct-rank sets)."""
    va, oa = _unpack_ranks(batch.column("ranks_a"))
    vb, ob = _unpack_ranks(batch.column("ranks_b"))
    n = len(batch)
    ka = oa[1:] - oa[:-1]
    kb = ob[1:] - ob[:-1]
    # |x∩y| for every candidate row at once: each side's (row, rank) keys are
    # unique, so a key occurring twice in the concatenation is one common
    # token — one lexsort over all candidate tokens, no per-row Python call.
    rows = np.concatenate([np.repeat(np.arange(n), ka), np.repeat(np.arange(n), kb)])
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, rows))
    rows, vals = rows[order], vals[order]
    if rows.shape[0] > 1:
        dup = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])
        inter = np.bincount(rows[1:][dup], minlength=n)
    else:
        inter = np.zeros(n, dtype=np.int64)
    union = ka + kb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = (union > 0) & (jac >= threshold)
    return pa.table(
        {
            "id_a": batch.column("id_a").filter(pa.array(keep)),
            "id_b": batch.column("id_b").filter(pa.array(keep)),
            "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
        }
    )


def _topk_block(batch: pa.Table, k: int) -> pa.Table:
    """Keep a block's k most frequent (thash, sum(partial)) rows. The global
    top-k is a subset of the union of per-block top-ks (counts are already
    global after the combining groupby), so two passes — block-local, then
    single-partition — yield the exact head."""
    if len(batch) <= k:
        return batch
    cnt = batch.column("sum(partial)").to_numpy(zero_copy_only=False)
    idx = np.argpartition(-cnt, k - 1)[:k]
    return batch.take(pa.array(np.sort(idx)))


def token_jaccard_join(
    ds,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_k: int = 1 << 16,
):
    """documents Dataset -> exact (id_a < id_b, jaccard) pairs with
    distinct-token Jaccard >= threshold. See module docstring."""
    import ray
    import ray.data

    from plakar_ray.stages.chunk import default_pool_size

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_part = max(8, cpus // 4)

    ds = ds.materialize()  # consumed by two passes (freq + sets)

    # 1. head vocabulary: top-HEAD_K most frequent tokens, exactly ranked.
    # Combined global counts stay a Dataset; two per-block top-K reductions
    # (block-local, then single-partition) bound what reaches the driver by
    # K — the vocabulary itself is never collected or broadcast.
    freq_ds = (
        ds.map_batches(
            TokenCountStage(text_col=text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("thash")
        .sum("partial")
    )
    topk = lambda b: _topk_block(b, head_k)  # noqa: E731
    head_rows = (
        freq_ds.map_batches(topk, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    head_hashes = np.array([r["thash"] for r in head_rows], dtype=np.int64).view(np.uint64)
    head_cnt = np.array([r["sum(partial)"] for r in head_rows], dtype=np.int64)
    # ascending frequency, hash tie-break — rare head tokens get the
    # smallest head ranks; all head ranks are odd and >= 2^62, above every
    # tail rank, so prefix order degrades gracefully to the old exact
    # frequency order whenever the vocabulary fits in the head.
    order = np.lexsort((head_hashes, head_cnt))
    head_ranks = np.empty(order.shape[0], dtype=np.int64)
    head_ranks[order] = _HEAD_BASE + 2 * np.arange(order.shape[0], dtype=np.int64) + 1
    hash_order = np.argsort(head_hashes)
    vocab_ref = ray.put((head_hashes[hash_order], head_ranks[hash_order]))

    # 2. ranked per-doc sets
    sets_ds = ds.map_batches(
        RankedSetStage,
        fn_constructor_kwargs=dict(vocab_ref=vocab_ref, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool_size(),
    ).materialize()

    # 3. prefix rows -> hash exchange on token rank -> posting-list pairs
    prefix = sets_ds.map_batches(
        lambda b: _prefix_rows(b, id_col, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Packed exchanges (functions/exchange.py): prefix rows are several
    # rows per doc — blobs keep the shuffled row count block-granular.
    from plakar_ray.functions.exchange import packed_exchange

    prefix_empty = pa.table(
        {
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "k": pa.array([], type=pa.int64()),
        }
    )
    pair_empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    cand = packed_exchange(
        packed_exchange(
            prefix, ["rank"], n_part,
            lambda b: _posting_pairs(b, id_col), prefix_empty,
        ),
        ["id_a", "id_b"], n_part, _dedup_pairs_block, pair_empty,
    )

    # 4. verify: two hash joins attach both rank arrays, vectorized merge
    sets_a = sets_ds.select_columns([id_col, "ranks"]).rename_columns(
        {id_col: "id_a", "ranks": "ranks_a"}
    )
    sets_b = sets_ds.select_columns([id_col, "ranks"]).rename_columns(
        {id_col: "id_b", "ranks": "ranks_b"}
    )
    joined = cand.join(sets_a, "inner", n_part, on=("id_a",)).join(
        sets_b, "inner", n_part, on=("id_b",)
    )
    return joined.map_batches(
        lambda b: _verify_batch(b, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
