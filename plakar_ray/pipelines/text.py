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
