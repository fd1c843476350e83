"""Text-analysis pipelines over the documents table."""

from __future__ import annotations

import pyarrow as pa

from plakar_ray.stages.text import (
    FingerprintStage,
    fingerprint_mulhash_batch,
    lang_id_batch,
    quality_batch,
    text_stats_batch,
    token_explode_batch,
)


def doc_quality(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, n_tokens, quality) — SQL-mirrorable."""
    return ds.map_batches(
        lambda b: quality_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def doc_fingerprints_mulhash(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, fingerprint64) — min multiplicative window hash, the
    SQL-checkable twin of doc_fingerprints' gear variant."""
    return ds.map_batches(
        lambda b: fingerprint_mulhash_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def doc_text_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda b: text_stats_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def doc_lang_id(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda b: lang_id_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def doc_fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    from plakar_ray.stages.chunk import default_pool_size

    return ds.map_batches(
        FingerprintStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool_size(),
    )


def token_stats_by_lang(ds, lang_col: str = "lang", text_col: str = "text") -> pa.Table:
    """(lang, docs, tokens_sum, chars_sum) ordered by lang — corpus token
    accounting, pre-aggregated per batch before the (tiny) lang groupby."""
    def partial(batch: pa.Table) -> pa.Table:
        st = text_stats_batch(batch, lang_col, text_col)  # id_col=lang passthrough
        t = pa.table(
            {
                "lang": st.column(lang_col),
                "n_tokens": st.column("n_tokens"),
                "n_chars": st.column("n_chars"),
            }
        )
        g = t.group_by("lang").aggregate(
            [("n_tokens", "sum"), ("n_chars", "sum"), ("lang", "count")]
        )
        return pa.table(
            {
                "lang": g.column("lang"),
                "docs": g.column("lang_count").cast(pa.int64()),
                "tokens_sum": g.column("n_tokens_sum").cast(pa.int64()),
                "chars_sum": g.column("n_chars_sum").cast(pa.int64()),
            }
        )

    from plakar_ray.functions.agg import gated_groupby_sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = gated_groupby_sum(
        parts, "lang", ["docs", "tokens_sum", "chars_sum"]
    ).sort_values("lang")
    return pa.table(
        {
            "lang": pa.array(final["lang"]),
            "docs": pa.array(final["sum(docs)"], type=pa.int64()),
            "tokens_sum": pa.array(final["sum(tokens_sum)"], type=pa.int64()),
            "chars_sum": pa.array(final["sum(chars_sum)"], type=pa.int64()),
        }
    )


def top_tokens(
    ds, k: int = 20, text_col: str = "text", local_threshold: int = 100_000
) -> pa.Table:
    """Top-k most frequent lowercased tokens. Map-side combining (per-batch
    partial counts) keeps the shuffle proportional to vocabulary, not corpus.
    Deterministic order: count desc, token asc.

    Partial-count tables at or under `local_threshold` rows (vocab x blocks,
    tiny after combining) are summed on the driver — same size-gated fast
    path as stages/lsh.py / stages/simhash.py, identical results; a
    web-scale vocabulary takes the distributed token groupby where each
    block contributes only its per-block top-k to the driver."""
    import pyarrow.compute as pc

    parts = ds.map_batches(
        lambda b: token_explode_batch(b, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if local_threshold and parts.count() <= local_threshold:
        tables = [b for b in parts.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        merged = (
            pa.concat_tables(tables)
            if tables
            else pa.table({"token": pa.array([], type=pa.string()),
                           "partial": pa.array([], type=pa.int64())})
        )
        totals = (
            merged.group_by("token").aggregate([("partial", "sum")]).to_pandas()
        )
        totals = totals.rename(columns={"partial_sum": "count"})
        totals = totals.sort_values(
            ["count", "token"], ascending=[False, True]
        ).head(k)
        return pa.table(
            {
                "token": pa.array(totals["token"].tolist()),
                "count": pa.array(totals["count"].tolist(), type=pa.int64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        # After the token groupby each token lives in exactly one block, so
        # the global top-k is a subset of the union of per-block top-ks —
        # only k rows per block ever reach the driver, never the vocabulary.
        order = pc.sort_indices(
            t,
            sort_keys=[("sum(partial)", "descending"), ("token", "ascending")],
        )
        return t.take(order[:k])

    totals = (
        parts.groupby("token")
        .sum("partial")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    totals = totals.rename(columns={"sum(partial)": "count"})
    totals = totals.sort_values(["count", "token"], ascending=[False, True]).head(k)
    return pa.table(
        {
            "token": pa.array(totals["token"].tolist()),
            "count": pa.array(totals["count"].tolist(), type=pa.int64()),
        }
    )


def unigram_logppl(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 1_000_000,
):
    """CCNet-style unigram language-model quality score (Wenzek et al.
    2020 filter their Common-Crawl corpus on LM perplexity; the unigram
    form is the SQL-checkable realization): per document,

        logppl = ln(T) - (1/n) * sum_{occurrences} ln(count(token))

    where count() is the CORPUS-wide token count and T the corpus token
    total — the mean negative log-likelihood under the corpus's own
    unigram distribution (low = boilerplate-ish/common tokens, high =
    rare-token noise). Returns (doc_id, n_tokens, logppl_e6) for every
    doc with >= 1 token, e6 fixed-point (the repo's float-hash rule).

    Scale shape — exact at ANY vocabulary size, nothing broadcast and no
    driver-side vocabulary (the same discipline as the token-Jaccard
    join): map-side (token, doc, cnt) partials, ONE token-keyed packed
    exchange where each partition owns its tokens globally (global
    counts by construction, then per-doc partial scores inside the
    partition), ONE doc-keyed packed exchange summing per-doc partials.
    T = sum of per-doc n (every occurrence lands in exactly one doc
    partial), so no extra global pass. Result rows are O(docs)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from plakar_ray.functions.exchange import packed_exchange

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_part = max(8, cpus // 2)

    def doc_token_partials(batch: pa.Table) -> pa.Table:
        """(token, doc_id, cnt) per distinct (doc, token) of this batch —
        the map-side combiner (shuffles counts, not occurrences)."""
        lower = pc.utf8_lower(batch.column(text_col))
        lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
        flat = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        toks = flat.flatten()
        parent = pc.list_parent_indices(flat)
        t = pa.table(
            {
                "token": toks,
                id_col: batch.column(id_col).take(parent),
            }
        ).filter(pc.not_equal(toks, ""))
        g = t.group_by(["token", id_col]).aggregate([([], "count_all")])
        return pa.table(
            {
                "token": g.column("token"),
                id_col: g.column(id_col),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    partial_schema = pa.schema(
        [(id_col, pa.int64()), ("n", pa.int64()), ("s", pa.float64())]
    )

    def token_score_partials(part: pa.Table) -> pa.Table:
        """One partition owns every row of its tokens: global per-token
        counts, then per-doc partial (n, sum cnt*ln(gcount))."""
        if part.num_rows == 0:
            return partial_schema.empty_table()
        gcnt = part.group_by("token").aggregate([("cnt", "sum")])
        joined = part.join(gcnt, keys="token")
        ids = joined.column(id_col).to_numpy(zero_copy_only=False)
        cnt = joined.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        g = joined.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.float64)
        contrib = cnt * np.log(g)
        order = np.argsort(ids, kind="stable")
        ids_s, cnt_s, con_s = ids[order], cnt[order], contrib[order]
        new = np.empty(ids_s.size, dtype=bool)
        new[0] = True
        new[1:] = ids_s[1:] != ids_s[:-1]
        dstart = np.flatnonzero(new)
        return pa.table(
            {
                id_col: pa.array(ids_s[dstart], type=pa.int64()),
                "n": pa.array(
                    np.add.reduceat(cnt_s, dstart).astype(np.int64), type=pa.int64()
                ),
                "s": pa.array(np.add.reduceat(con_s, dstart), type=pa.float64()),
            }
        )

    def merge_doc_partials(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return partial_schema.empty_table()
        g = part.group_by(id_col).aggregate([("n", "sum"), ("s", "sum")])
        return pa.table(
            {
                id_col: g.column(id_col),
                "n": g.column("n_sum"),
                "s": g.column("s_sum"),
            }
        )

    rows = ds.map_batches(
        doc_token_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    token_empty = pa.table(
        {
            "token": pa.array([], type=pa.string()),
            id_col: pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    # Materialize (a pipeline barrier) only when the local-threshold gate
    # is active and needs a row count; local_threshold=0 explicitly
    # requests the streaming exchange path, so keep it barrier-free.
    if local_threshold:
        rows = rows.materialize()
    if local_threshold and rows.count() <= local_threshold:
        tables = [
            b
            for b in rows.iter_batches(batch_format="pyarrow", batch_size=None)
            if len(b)
        ]
        merged = pa.concat_tables(tables) if tables else token_empty
        per_doc = merge_doc_partials(token_score_partials(merged))
    else:
        scored = packed_exchange(
            rows, ["token"], n_part, token_score_partials, token_empty
        )
        # Second exchange: doc-keyed merge of the O(docs x n_part) partials
        # — one final row per doc; only the result table reaches the driver.
        merged = packed_exchange(
            scored,
            [id_col],
            max(4, n_part // 2),
            merge_doc_partials,
            partial_schema.empty_table(),
        )
        parts = [
            t
            for t in (ray.get(r) for r in merged.materialize().to_arrow_refs())
            if t.num_rows
        ]
        per_doc = (
            pa.concat_tables(parts) if parts else partial_schema.empty_table()
        )

    ids = per_doc.column(id_col).to_numpy(zero_copy_only=False)
    n = per_doc.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    s = per_doc.column("s").to_numpy(zero_copy_only=False)
    T = float(n.sum())
    keep = n > 0
    ids, n, s = ids[keep], n[keep], s[keep]
    logppl = np.log(T) - s / n
    order = np.argsort(ids, kind="stable")
    return pa.table(
        {
            id_col: pa.array(ids[order], type=pa.int64()),
            "n_tokens": pa.array(n[order].astype(np.int64), type=pa.int64()),
            "logppl_e6": pa.array(
                np.floor(logppl[order] * 1e6 + 0.5).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )
