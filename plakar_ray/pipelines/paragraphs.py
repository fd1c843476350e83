"""Paragraph-level dedup (CCNet / RefinedWeb-style line dedup).

The reference dedups at chunk granularity through a process-global digest
set (cmd/cdc/stats.go:122-155); web-scale training-data pipelines apply
the same idea at NATURAL text boundaries: split every document on
newlines, hash each paragraph, and either measure (how much of each doc
is corpus-duplicated boilerplate) or transform (keep only the globally
first occurrence of every duplicated paragraph — the CCNet dedup step).
This sits between the repo's document-granularity exact dedup
(pipelines/dedup.py:exact_dup_groups) and its byte-granularity substring
dedup (pipelines/dedup.py:substring_dedup_clean).

Semantics (shared verbatim with the DuckDB oracles in entry.py):

- a paragraph is one element of text.split("\n"); empty paragraphs
  (blank lines, empty docs) are NEVER dedup candidates — they carry the
  document's structure and are always kept;
- stats: an occurrence is "duplicated" when its paragraph content occurs
  >= 2 times corpus-wide (all occurrences counted, including both copies);
- clean: for each distinct non-empty paragraph, the occurrence with the
  smallest (doc_id, paragraph index) is kept; every other occurrence is
  removed, and the document is rebuilt as "\n".join(kept paragraphs)
  (removing a paragraph removes exactly one adjacent separator, which is
  what the join semantics encode).

Identity is md5-128 of the paragraph bytes — the same standard the
document-level exact dedup uses (collision probability ~2^-64 at 10^12
paragraphs; unlike a 64-bit rolling hash this cannot plausibly delete
non-duplicate text, per the round-3 advice on substring_dedup_clean).

Scale shape: one packed keyed exchange on the paragraph digest (all
occurrences of one paragraph land in one reduce partition — a hot
boilerplate paragraph is one group in one partition, never a driver
set), then a partial-sum merge per doc (stats), or — for clean — the
removal set (doc_id, para_idx pairs, typically a small fraction of
corpus bytes: ~16 B per removed occurrence vs the paragraph's hundreds
of bytes of text) is BROADCAST once via ray.put and every document is
rebuilt in place by one map over the original dataset; the corpus text
never crosses an exchange. When the removal set exceeds
`broadcast_threshold` rows (adversarially duplicated corpora), the
transform falls back to a tagged-union doc co-shuffle (removal rows
para_idx >= 0 unioned with doc rows para_idx == -1 carrying text) —
the same shape substring_dedup_clean uses.

Occurrence identity rides two uint64 columns (md5 halves), not a hex
string: halves the exchange bytes per occurrence and makes every group
sort a u64 lexsort instead of an S32 byte sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.functions.exchange import packed_exchange


def _split_col(batch: pa.Table, text_col: str):
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sp = pc.split_pattern(col, "\n")
    values = sp.flatten()
    offsets = np.asarray(sp.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]  # flatten() trims values to this range
    return values, offsets


def _para_md5_u64(values: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(md5_lo, md5_hi uint64 halves, byte length) per paragraph;
    paragraphs are contiguous in the split's values buffer, so one
    batched segment-md5 pass covers the whole batch."""
    from plakar_ray.functions.strhash import md5_segments

    data, voff = byte_views(values)
    lens = (voff[1:] - voff[:-1]).astype(np.int64)
    stream = data[voff[0] : voff[-1]] if len(values) else data[:0]
    dig = md5_segments(lens, stream)  # (n, 16) uint8
    u = dig.view(np.uint64).reshape(-1, 2)
    return u[:, 0].copy(), u[:, 1].copy(), lens


def _occurrence_batch(
    batch: pa.Table,
    id_col: str,
    text_col: str,
    with_nbytes: bool = True,
    with_idx: bool = True,
) -> pa.Table:
    """Explode one block of documents into non-empty-paragraph occurrence
    rows (id[, para_idx], md5_lo, md5_hi[, nbytes]). Each consumer drops
    the column it never reads before the exchange: the clean transform's
    election needs para_idx but not nbytes; the stats reduce needs
    nbytes but not para_idx."""
    values, offsets = _split_col(batch, text_col)
    counts = offsets[1:] - offsets[:-1]
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64), counts
    )
    md5_lo, md5_hi, lens = _para_md5_u64(values)
    keep = lens > 0
    cols = {id_col: pa.array(ids[keep], type=pa.int64())}
    if with_idx:
        idx = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        cols["para_idx"] = pa.array(idx[keep], type=pa.int64())
    cols["md5_lo"] = pa.array(md5_lo[keep], type=pa.uint64())
    cols["md5_hi"] = pa.array(md5_hi[keep], type=pa.uint64())
    if with_nbytes:
        cols["nbytes"] = pa.array(lens[keep], type=pa.int64())
    return pa.table(cols)


def _occ_empty(
    id_col: str, with_nbytes: bool = True, with_idx: bool = True
) -> pa.Table:
    cols = {id_col: pa.array([], type=pa.int64())}
    if with_idx:
        cols["para_idx"] = pa.array([], type=pa.int64())
    cols["md5_lo"] = pa.array([], type=pa.uint64())
    cols["md5_hi"] = pa.array([], type=pa.uint64())
    if with_nbytes:
        cols["nbytes"] = pa.array([], type=pa.int64())
    return pa.table(cols)


_PARTIAL_COLS = ("n_paras", "dup_paras", "dup_bytes")


def _base_partial_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Per-doc paragraph count (no split needed: separators + 1)."""
    col = batch.column(text_col)
    n_paras = pc.add(pc.count_substring(col, "\n"), 1).cast(pa.int64())
    zeros = pa.array(np.zeros(batch.num_rows, dtype=np.int64), type=pa.int64())
    return pa.table(
        {
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_paras": n_paras,
            "dup_paras": zeros,
            "dup_bytes": zeros,
        }
    )


def _dup_partials(batch: pa.Table, id_col: str) -> pa.Table:
    """Keyed-exchange reduce: occurrences in md5 groups of size >= 2 are
    duplicated; aggregate their count/bytes per doc (map-side partial)."""
    zero = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "n_paras": pa.array([], type=pa.int64()),
            "dup_paras": pa.array([], type=pa.int64()),
            "dup_bytes": pa.array([], type=pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return zero
    lo = batch.column("md5_lo").to_numpy(zero_copy_only=False)
    hi = batch.column("md5_hi").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    nb = batch.column("nbytes").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hi, lo))
    slo, shi = lo[order], hi[order]
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])
    gid = np.cumsum(newg) - 1
    gsize = np.bincount(gid)
    dup_sorted = gsize[gid] >= 2
    dup = np.empty(n, dtype=bool)
    dup[order] = dup_sorted
    if not dup.any():
        return zero
    d_ids, d_nb = ids[dup], nb[dup]
    o2 = np.argsort(d_ids, kind="stable")
    d_ids, d_nb = d_ids[o2], d_nb[o2]
    starts = np.flatnonzero(
        np.concatenate(([True], d_ids[1:] != d_ids[:-1]))
    )
    cnt = np.diff(np.append(starts, d_ids.size))
    bsum = np.add.reduceat(d_nb, starts)
    return pa.table(
        {
            id_col: pa.array(d_ids[starts], type=pa.int64()),
            "n_paras": pa.array(np.zeros(starts.size, dtype=np.int64)),
            "dup_paras": pa.array(cnt.astype(np.int64)),
            "dup_bytes": pa.array(bsum.astype(np.int64)),
        }
    )


def paragraph_dedup_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 1_000_000,
) -> "pa.Table":
    """Per-document paragraph-duplication profile:
    (id, n_paras, dup_paras, dup_bytes).

    Plan: occurrence explode -> packed exchange keyed on para_md5 (every
    paragraph's occurrences in one partition) -> per-doc dup partials,
    unioned with map-side per-doc paragraph counts -> one gated
    partial-sum merge on the doc key (functions/agg.py house rule)."""
    import ray

    from plakar_ray.functions.agg import gated_groupby_sum

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    ds = ds.materialize()  # consumed twice: occurrences + base counts
    occ = ds.map_batches(
        lambda b: _occurrence_batch(b, id_col, text_col, with_idx=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = ds.map_batches(
        lambda b: _base_partial_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    occ_empty = _occ_empty(id_col, with_idx=False)
    if local_threshold:
        occ = occ.materialize()
    if local_threshold and occ.count() <= local_threshold:
        tables = [
            b
            for b in occ.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = pa.concat_tables(tables) if tables else occ_empty
        import ray.data

        partials = base.union(ray.data.from_arrow(_dup_partials(merged, id_col)))
    else:
        dup = packed_exchange(
            occ,
            ["md5_lo", "md5_hi"],
            max(8, cpus // 2),
            lambda b: _dup_partials(b, id_col),
            occ_empty,
        )
        partials = base.union(dup)

    out = gated_groupby_sum(
        partials, id_col, list(_PARTIAL_COLS), local_threshold=local_threshold
    )
    out = out.rename(columns={f"sum({c})": c for c in _PARTIAL_COLS})
    out = out.sort_values(id_col).reset_index(drop=True)
    return pa.table(
        {
            id_col: pa.array(out[id_col].to_numpy(), type=pa.int64()),
            "n_paras": pa.array(out["n_paras"].to_numpy(), type=pa.int64()),
            "dup_paras": pa.array(out["dup_paras"].to_numpy(), type=pa.int64()),
            "dup_bytes": pa.array(out["dup_bytes"].to_numpy(), type=pa.int64()),
        }
    )


# ------------------------------------------------------------------ clean ---


def _elect_removals(batch: pa.Table, id_col: str) -> pa.Table:
    """Keyed-exchange reduce: within each md5 group keep the smallest
    (id, para_idx) occurrence; every other occurrence becomes a removal
    row (id, para_idx), tagged for the doc co-shuffle."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "para_idx": pa.array([], type=pa.int64()),
            }
        )
    lo = batch.column("md5_lo").to_numpy(zero_copy_only=False)
    hi = batch.column("md5_hi").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = batch.column("para_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((idx, ids, hi, lo))
    slo, shi = lo[order], hi[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])
    rm = order[~first]
    return pa.table(
        {
            id_col: pa.array(ids[rm], type=pa.int64()),
            "para_idx": pa.array(idx[rm], type=pa.int64()),
        }
    )


def _rebuild_partition(
    batch: pa.Table, id_col: str, text_col: str, emit_text: bool
) -> pa.Table:
    """Doc co-shuffle reduce: batch is a tagged union of document rows
    (para_idx == -1, carrying text) and removal rows (para_idx >= 0).
    Rebuild each doc as "\\n".join(kept paragraphs) — one Arrow split,
    one boolean filter, one binary_join; no per-paragraph Python."""
    idx = batch.column("para_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    is_doc = idx == -1
    docs = batch.filter(pa.array(is_doc))
    rem = batch.filter(pa.array(~is_doc))
    # order docs by id so removal ids can be positioned via searchsorted
    d_ids = docs.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d_order = np.argsort(d_ids, kind="stable")
    docs = docs.take(pa.array(d_order))
    d_ids = d_ids[d_order]
    r_ids = rem.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    r_idx = rem.column("para_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    return _rebuild_docs(docs, d_ids, r_ids, r_idx, id_col, text_col, emit_text)


def _rebuild_docs(
    docs: pa.Table,
    d_ids: np.ndarray,
    r_ids: np.ndarray,
    r_idx: np.ndarray,
    id_col: str,
    text_col: str,
    emit_text: bool,
) -> pa.Table:
    """Shared rebuild core: `docs` sorted by (unique) id; (r_ids, r_idx)
    are this doc set's removal occurrences."""
    from plakar_ray.functions.strhash import hex_string_array, md5_segments

    values, offsets = _split_col(docs, text_col)
    counts = offsets[1:] - offsets[:-1]
    total = int(offsets[-1]) if offsets.size else 0

    pos = np.searchsorted(d_ids, r_ids)
    flat = offsets[pos] + r_idx

    kept = np.ones(total, dtype=bool)
    kept[flat] = False
    removed_per_doc = np.bincount(pos, minlength=d_ids.size).astype(np.int64)
    kept_counts = counts - removed_per_doc

    new_values = values.filter(pa.array(kept))
    new_off = np.concatenate(([0], np.cumsum(kept_counts)))
    if pa.types.is_large_string(new_values.type):
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()), new_values
        )
        sep = pa.scalar("\n", type=pa.large_string())
    else:
        lst = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), type=pa.int32()), new_values
        )
        sep = pa.scalar("\n", type=pa.string())
    cleaned = pc.binary_join(lst, sep)

    c_data, c_off = byte_views(cleaned)
    kept_bytes = (c_off[1:] - c_off[:-1]).astype(np.int64)
    stream = c_data[c_off[0] : c_off[-1]] if len(cleaned) else c_data[:0]
    md5_hex = hex_string_array(md5_segments(kept_bytes, stream))

    t_data, t_off = byte_views(docs.column(text_col))
    orig_bytes = (t_off[1:] - t_off[:-1]).astype(np.int64)

    cols = {
        id_col: pa.array(d_ids, type=pa.int64()),
        "kept_paras": pa.array(kept_counts, type=pa.int64()),
        "removed_paras": pa.array(removed_per_doc, type=pa.int64()),
        "kept_bytes": pa.array(kept_bytes, type=pa.int64()),
        "removed_bytes": pa.array(orig_bytes - kept_bytes, type=pa.int64()),
        "cleaned_md5": md5_hex,
    }
    if emit_text:
        cols["cleaned_text"] = cleaned.cast(pa.large_string())
    return pa.table(cols)


def paragraph_dedup_clean(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 1_000_000,
    emit_text: bool = False,
    broadcast_threshold: int = 16_000_000,
):
    """The paragraph-dedup TRANSFORM (CCNet line dedup): keep only the
    globally first (smallest (id, para_idx)) occurrence of every
    duplicated non-empty paragraph; rebuild each document as
    "\\n".join(kept paragraphs). Returns per-document accounting plus the
    md5 of the cleaned text (byte-exact evidence of the cleaned corpus;
    `emit_text=True` adds the cleaned column for a write_parquet sink).

    Plan: occurrence explode -> packed exchange on the md5 halves
    (keep-first election, removals out — typically a small fraction of
    occurrences, and only 16 B/row vs the paragraph's hundreds of bytes
    of text). The removal set is then BROADCAST (ray.put of two sorted
    int64 arrays, read zero-copy by every task) and the docs are rebuilt
    by one map over the original dataset — the corpus text never crosses
    an exchange, so the transform's data movement is O(removals), not
    O(corpus). Above `broadcast_threshold` removal rows (~16 B each;
    the default bounds the broadcast at ~256 MB) it falls back to the
    tagged-union doc co-shuffle (removal rows para_idx >= 0 unioned with
    doc rows para_idx == -1 carrying text), the substring_dedup_clean
    shape, which moves the text but holds only one partition per task."""
    import ray
    import ray.data

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_part = max(8, cpus)

    ds = ds.materialize()  # consumed twice: occurrences + doc rebuild

    occ = ds.map_batches(
        lambda b: _occurrence_batch(b, id_col, text_col, with_nbytes=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "para_idx": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64), type=pa.int64()
                ),
                text_col: batch.column(text_col).cast(pa.large_string()),
            }
        )

    def _tag_removals(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "para_idx": batch.column("para_idx"),
                text_col: pa.array([""] * batch.num_rows, type=pa.large_string()),
            }
        )

    occ_empty = _occ_empty(id_col, with_nbytes=False)
    if local_threshold:
        occ = occ.materialize()
    if local_threshold and occ.count() <= local_threshold:
        tables = [
            b
            for b in occ.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = pa.concat_tables(tables) if tables else occ_empty
        removals = _tag_removals(_elect_removals(merged, id_col))
        docs_tagged = ds.map_batches(
            _tag_docs, batch_format="pyarrow", zero_copy_batch=True
        )
        dtables = [
            b
            for b in docs_tagged.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        both = pa.concat_tables([removals] + dtables, promote_options="default")
        return ray.data.from_arrow(
            _rebuild_partition(both, id_col, text_col, emit_text)
        )

    removals = packed_exchange(
        occ,
        ["md5_lo", "md5_hi"],
        n_part,
        lambda b: _elect_removals(b, id_col),
        occ_empty,
    ).materialize()

    if removals.count() <= broadcast_threshold:
        # Small-side broadcast: sorted (id, idx) arrays in the object
        # store once; every rebuild task reads them zero-copy and slices
        # its own docs' removals via searchsorted.
        from plakar_ray.functions.npu import batch_rows_for_keys, put_sorted_by_key

        ref = put_sorted_by_key(removals, id_col, ["para_idx"])

        def _rebuild_broadcast(batch: pa.Table) -> pa.Table:
            ids_np = (
                batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            d_order = np.argsort(ids_np, kind="stable")
            docs = pa.table(
                {
                    id_col: batch.column(id_col).cast(pa.int64()),
                    text_col: batch.column(text_col).cast(pa.large_string()),
                }
            ).take(pa.array(d_order))
            d_ids = ids_np[d_order]
            rs, ri = batch_rows_for_keys(ref, d_ids)
            return _rebuild_docs(docs, d_ids, rs, ri, id_col, text_col, emit_text)

        return ds.map_batches(
            _rebuild_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    both = removals.map_batches(
        _tag_removals, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ds.map_batches(_tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    )
    tagged_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "para_idx": pa.array([], type=pa.int64()),
            text_col: pa.array([], type=pa.large_string()),
        }
    )
    return packed_exchange(
        both,
        [id_col],
        n_part,
        lambda b: _rebuild_partition(b, id_col, text_col, emit_text),
        tagged_empty,
    )
