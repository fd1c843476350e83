"""End-to-end training-data prep: the composed cleaning pipeline a
100 TB web corpus actually runs, as ONE driver-checkable operator.

    documents
      -> quality gate        (C4/Gopher-style score, fixed-point e6 rule)
      -> paragraph dedup     (CCNet keep-first clean, pipelines/paragraphs.py)
      -> drop emptied docs   (everything was corpus-duplicated boilerplate)
      -> exact dedup         (keep min doc_id per distinct cleaned text)
      -> one summary row     (per-stage accounting + content certificate)

Each stage reuses its already-oracle-verified building block; the
composition itself is value-checked end-to-end by a chained-CTE DuckDB
oracle (entry.py `corpus_prep`), including `corpus_md5_xor` — the XOR of
md5u64(cleaned text) over the surviving representative documents, an
order-independent content certificate that any divergence in ANY stage
(filter set, cleaned bytes, representative election) flips.

Scale shape: the quality gate and empty-drop are map-only; paragraph
clean contributes its two packed exchanges; the exact-dedup election is
ONE more packed exchange on the cleaned-text md5 whose reduce emits one
partial row per partition (reps, bytes, xor) — the driver folds
n_part partials, never rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.functions.exchange import packed_exchange

QUALITY_THRESH_E6 = 550_000


def _hex16_to_u64le(md5_hex: np.ndarray) -> np.ndarray:
    """First 16 hex chars (= first 8 md5 bytes) -> u64 little-endian,
    DuckDB's md5_number_upper. Vectorized nibble decode."""
    if md5_hex.size == 0:
        return np.empty(0, dtype=np.uint64)
    c = md5_hex.view(np.uint8).reshape(md5_hex.size, md5_hex.dtype.itemsize)[:, :16]
    nib = np.where(c >= ord("a"), c - (ord("a") - 10), c - ord("0")).astype(np.uint8)
    by = (nib[:, 0::2] << 4) | nib[:, 1::2]  # 8 bytes, md5 byte order
    return np.ascontiguousarray(by).view("<u8").reshape(-1)


def corpus_prep(
    ds,
    quality_thresh_e6: int = QUALITY_THRESH_E6,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 1_000_000,
) -> pa.Table:
    """Run the composed prep pipeline; returns the one-row summary table
    (docs_in, quality_dropped, paras_removed, clean_bytes_removed,
    empty_dropped, exact_dup_dropped, docs_out, bytes_out,
    corpus_md5_xor)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from plakar_ray.pipelines.paragraphs import paragraph_dedup_clean
    from plakar_ray.stages.text import quality_batch

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    ds = ds.materialize()
    docs_in = ds.count()

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, id_col, text_col)
        qf = q.column("quality").to_numpy(zero_copy_only=False)
        q6 = np.floor(qf * 1e6 + 0.5).astype(np.int64)  # shared e6 rule
        return batch.filter(pa.array(q6 >= int(quality_thresh_e6)))

    survivors = ds.map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_surv = survivors.count()

    cleaned = paragraph_dedup_clean(
        survivors,
        id_col=id_col,
        text_col=text_col,
        local_threshold=local_threshold,
    ).materialize()
    acc = cleaned.aggregate(Count(), Sum("removed_paras"), Sum("removed_bytes"))
    paras_removed = int(acc["sum(removed_paras)"] or 0)
    clean_bytes_removed = int(acc["sum(removed_bytes)"] or 0)

    def drop_empty(batch: pa.Table) -> pa.Table:
        kb = batch.column("kept_bytes").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(kb > 0))

    nonempty = cleaned.map_batches(
        drop_empty, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_nonempty = nonempty.count()

    partial_schema = pa.schema(
        [("reps", pa.int64()), ("rep_bytes", pa.int64()), ("xor_md5", pa.uint64())]
    )

    def rep_partial(batch: pa.Table) -> pa.Table:
        """Representative election per distinct cleaned text: count + byte
        sum + md5u64 XOR, one partial row per reduce partition."""
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        md5 = np.asarray(
            batch.column("cleaned_md5").to_numpy(zero_copy_only=False), dtype="S32"
        )
        kb = batch.column("kept_bytes").to_numpy(zero_copy_only=False).astype(np.int64)
        _, first = np.unique(md5, return_index=True)
        u64 = _hex16_to_u64le(md5[first])
        x = np.bitwise_xor.reduce(u64) if u64.size else np.uint64(0)
        return pa.table(
            {
                "reps": pa.array([int(first.size)], type=pa.int64()),
                "rep_bytes": pa.array([int(kb[first].sum())], type=pa.int64()),
                "xor_md5": pa.array([int(x)], type=pa.uint64()),
            }
        )

    sel = nonempty.select_columns([id_col, "cleaned_md5", "kept_bytes"])
    sel_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "cleaned_md5": pa.array([], type=pa.string()),
            "kept_bytes": pa.array([], type=pa.int64()),
        }
    )
    if local_threshold and n_nonempty <= local_threshold:
        tables = [
            b
            for b in sel.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        partials = rep_partial(pa.concat_tables(tables) if tables else sel_empty)
        rows = partials.to_pylist()
    else:
        partials = packed_exchange(
            sel, ["cleaned_md5"], max(8, cpus // 4), rep_partial, sel_empty
        )
        rows = partials.to_pandas().to_dict("records")

    docs_out = int(sum(r["reps"] for r in rows))
    bytes_out = int(sum(r["rep_bytes"] for r in rows))
    xor_val = 0
    for r in rows:
        xor_val ^= int(r["xor_md5"])

    return pa.table(
        {
            "docs_in": pa.array([docs_in], type=pa.int64()),
            "quality_dropped": pa.array([docs_in - n_surv], type=pa.int64()),
            "paras_removed": pa.array([paras_removed], type=pa.int64()),
            "clean_bytes_removed": pa.array([clean_bytes_removed], type=pa.int64()),
            "empty_dropped": pa.array([n_surv - n_nonempty], type=pa.int64()),
            "exact_dup_dropped": pa.array([n_nonempty - docs_out], type=pa.int64()),
            "docs_out": pa.array([docs_out], type=pa.int64()),
            "bytes_out": pa.array([bytes_out], type=pa.int64()),
            "corpus_md5_xor": pa.array([f"{xor_val:016x}"], type=pa.string()),
        }
    )


def corpus_prep_tiered(
    ds,
    quality_thresh_e6: int = QUALITY_THRESH_E6,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    local_threshold: int = 1_000_000,
    emit_docs: bool = False,
):
    """The FULL tier-dedup stack as one driver-checkable operator — the
    composition the north rule's 100 TB web corpus runs end to end:

        documents
          -> tier 0: quality gate     (fixed-point e6 rule, map-only)
          -> tier 1: paragraph dedup  (CCNet keep-first clean transform)
          -> drop emptied docs
          -> tier 2: exact dedup      (min doc_id per distinct cleaned text)
          -> tier 3: near-dup dedup   (word-3-gram MinHash -> LSH bands ->
                                       connected components -> keep the
                                       min-doc_id member of every cluster)
          -> one summary row with per-tier accounting + content certificate

    Tier 3 runs the PRODUCTION signature->cluster tail (stages/lsh.py via
    pipelines/dedup.clusters_from_signatures — banding, star edges, salted
    hot buckets, CC) over the md5-evidence signature family
    (stages/evidence.ngram_minhash_signatures_wide), so the whole stack is
    value-checked by ONE chained-CTE DuckDB oracle (entry.py
    `corpus_prep_tiered`): quality CTE -> paragraph-clean CTE -> rep
    election -> shingle/sig/band CTEs -> recursive-CTE connected
    components -> final XOR-md5 content certificate over the survivors.

    Scale shape: tiers 0/1/2 are corpus_prep's (map-only gates, two packed
    exchanges for the clean, one md5-keyed packed exchange for the
    election, text kept this time). Tier 3 adds the flagship's band
    exchange; cluster rows are O(near-dup docs) and the non-representative
    id set is broadcast back (same O(removals) pattern as paragraph
    clean's rebuild), so corpus text never crosses tier 3's exchange.

    `emit_docs=True` additionally returns the surviving cleaned corpus as
    a lazy Dataset of (id, cleaned_md5, cleaned_text, kept_bytes) —
    `(summary, survivors)` — for a `write_parquet` sink (cli.py
    `prep --out`)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from plakar_ray.pipelines.dedup import clusters_from_signatures
    from plakar_ray.pipelines.paragraphs import paragraph_dedup_clean
    from plakar_ray.stages.evidence import ngram_minhash_signatures_wide
    from plakar_ray.stages.text import quality_batch

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8

    ds = ds.materialize()
    docs_in = ds.count()

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, id_col, text_col)
        qf = q.column("quality").to_numpy(zero_copy_only=False)
        q6 = np.floor(qf * 1e6 + 0.5).astype(np.int64)  # shared e6 rule
        return batch.filter(pa.array(q6 >= int(quality_thresh_e6)))

    survivors = ds.map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_surv = survivors.count()

    cleaned = paragraph_dedup_clean(
        survivors,
        id_col=id_col,
        text_col=text_col,
        local_threshold=local_threshold,
        emit_text=True,
    ).materialize()
    acc = cleaned.aggregate(Count(), Sum("removed_paras"), Sum("removed_bytes"))
    paras_removed = int(acc["sum(removed_paras)"] or 0)
    clean_bytes_removed = int(acc["sum(removed_bytes)"] or 0)

    def drop_empty(batch: pa.Table) -> pa.Table:
        kb = batch.column("kept_bytes").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(kb > 0))

    nonempty = cleaned.map_batches(
        drop_empty, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_nonempty = nonempty.count()

    # Tier 2 election ships ONLY (doc_id, cleaned_md5) — 40 B/row — and
    # emits the LOSER ids (every id but the min of its md5 group); the
    # corpus text never crosses the exchange. Losers are O(exact-dup
    # docs) and are broadcast back (ray.put), the same O(removals)
    # pattern as paragraph clean's rebuild.
    sel = nonempty.select_columns([id_col, "cleaned_md5"])
    sel_empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "cleaned_md5": pa.array([], type=pa.string()),
        }
    )

    def elect_losers(batch: pa.Table) -> pa.Table:
        """Emit every id that is NOT the min of its cleaned_md5 group (the
        md5-128 identity is value-certified by the oracle's GROUP BY
        cleaned)."""
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        md5 = np.asarray(
            batch.column("cleaned_md5").to_numpy(zero_copy_only=False), dtype="S32"
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, md5))
        md5s = md5[order]
        first = np.ones(md5s.size, dtype=bool)
        first[1:] = md5s[1:] != md5s[:-1]
        return pa.table({id_col: pa.array(ids[order[~first]], type=pa.int64())})

    if local_threshold and n_nonempty <= local_threshold:
        tables = [
            b
            for b in sel.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        losers_t = elect_losers(pa.concat_tables(tables) if tables else sel_empty)
    else:
        refs = (
            packed_exchange(
                sel, ["cleaned_md5"], max(8, cpus // 4), elect_losers, sel_empty
            )
            .materialize()
            .to_arrow_refs()
        )
        # Empty exchange partitions surface as zero-column blocks.
        parts = [t for t in (ray.get(r) for r in refs) if t.num_rows]
        losers_t = (
            pa.concat_tables(parts)
            if parts
            else pa.table({id_col: pa.array([], type=pa.int64())})
        )
    exact_losers = np.sort(
        losers_t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_reps = n_nonempty - int(exact_losers.size)
    losers_ref = ray.put(exact_losers)

    def reps_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, ray.get(losers_ref))))

    # reps stays a LAZY filter over the materialized nonempty corpus —
    # the text is read in place for signatures, never reshuffled.
    reps = nonempty.map_batches(
        reps_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    sigs = ngram_minhash_signatures_wide(
        reps, id_col=id_col, text_col="cleaned_text", num_perm=num_perm
    )
    clusters = clusters_from_signatures(
        sigs, bands=bands, id_col=id_col, local_threshold=local_threshold
    )
    cid = clusters.column("cluster_id").to_numpy(zero_copy_only=False)
    did = clusters.column(id_col).to_numpy(zero_copy_only=False)
    dropped = np.sort(did[did != cid].astype(np.int64))  # O(near-dup docs)
    dropped_ref = ray.put(dropped)

    partial_schema = pa.schema(
        [("reps", pa.int64()), ("rep_bytes", pa.int64()), ("xor_md5", pa.uint64())]
    )

    def cert_partial(batch: pa.Table) -> pa.Table:
        """Final-survivor certificate partial: count + byte sum + md5u64
        XOR over reps not judged near-duplicates, one row per block."""
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(ids, ray.get(dropped_ref))
        md5 = np.asarray(
            batch.column("cleaned_md5").to_numpy(zero_copy_only=False), dtype="S32"
        )[keep]
        kb = (
            batch.column("kept_bytes")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        u64 = _hex16_to_u64le(md5)
        x = np.bitwise_xor.reduce(u64) if u64.size else np.uint64(0)
        return pa.table(
            {
                "reps": pa.array([int(keep.sum())], type=pa.int64()),
                "rep_bytes": pa.array([int(kb.sum())], type=pa.int64()),
                "xor_md5": pa.array([int(x)], type=pa.uint64()),
            }
        )

    rows = (
        reps.map_batches(cert_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .to_dict("records")
    )
    docs_out = int(sum(r["reps"] for r in rows))
    bytes_out = int(sum(r["rep_bytes"] for r in rows))
    xor_val = 0
    for r in rows:
        xor_val ^= int(r["xor_md5"])

    summary = pa.table(
        {
            "docs_in": pa.array([docs_in], type=pa.int64()),
            "quality_dropped": pa.array([docs_in - n_surv], type=pa.int64()),
            "paras_removed": pa.array([paras_removed], type=pa.int64()),
            "clean_bytes_removed": pa.array([clean_bytes_removed], type=pa.int64()),
            "empty_dropped": pa.array([n_surv - n_nonempty], type=pa.int64()),
            "exact_dup_dropped": pa.array([n_nonempty - n_reps], type=pa.int64()),
            "neardup_dropped": pa.array([int(dropped.size)], type=pa.int64()),
            "docs_out": pa.array([docs_out], type=pa.int64()),
            "bytes_out": pa.array([bytes_out], type=pa.int64()),
            "corpus_md5_xor": pa.array([f"{xor_val:016x}"], type=pa.string()),
        }
    )
    if not emit_docs:
        return summary

    def survivors_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, ray.get(dropped_ref))))

    survivors = reps.map_batches(
        survivors_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return summary, survivors
