"""Paragraph-level dedup (pipelines/paragraphs.py): DuckDB value parity on
an edge-case corpus (unicode, blank lines, empty docs, all-dup docs,
trailing newlines), plus forced-distributed == gated-local equivalence.

The DuckDB oracles here are the SAME SQL entry.py registers for the
driver gate — identity is checked against the raw paragraph STRING, so
the Ray side's md5-128 grouping is value-certified."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from plakar_ray.pipelines.paragraphs import (
    paragraph_dedup_clean,
    paragraph_dedup_stats,
)

DOCS = [
    (0, "hello world\ncommon para\nunique zero"),
    (1, "common para\n\nhello world\nunique one"),
    (2, "héllo wörld ünïcode\ncommon para\nhéllo wörld ünïcode"),
    (3, ""),  # empty doc -> one empty paragraph, always kept
    (4, "common para"),  # doc that is entirely one duplicated paragraph
    (5, "\n\n"),  # only blank lines -> nothing is a candidate
    (6, "unique six\ncommon para\n"),  # trailing newline -> trailing empty para
    (7, "a\na\na"),  # intra-document duplication only
]

STATS_SQL = """
WITH paras AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS para FROM documents
), counted AS (
  SELECT doc_id, para, strlen(para)::BIGINT AS nb,
         count(*) OVER (PARTITION BY para) AS cnt
  FROM paras
)
SELECT doc_id, count(*)::BIGINT AS n_paras,
       (count(*) FILTER (WHERE nb > 0 AND cnt >= 2))::BIGINT AS dup_paras,
       coalesce(sum(nb) FILTER (WHERE nb > 0 AND cnt >= 2), 0)::BIGINT AS dup_bytes
FROM counted GROUP BY doc_id ORDER BY doc_id
"""

CLEAN_SQL = """
WITH paras AS (
  SELECT doc_id, text,
         unnest(string_split(text, chr(10))) AS para,
         generate_subscripts(string_split(text, chr(10)), 1) AS idx
  FROM documents
), flagged AS (
  SELECT doc_id, text, idx, para,
         (strlen(para) = 0
          OR row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1) AS keep
  FROM paras
), rebuilt AS (
  SELECT doc_id, any_value(text) AS text,
         coalesce(string_agg(para, chr(10) ORDER BY idx) FILTER (WHERE keep), '') AS cleaned,
         (count(*) FILTER (WHERE keep))::BIGINT AS kept_paras,
         (count(*) FILTER (WHERE NOT keep))::BIGINT AS removed_paras
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, kept_paras, removed_paras,
       strlen(cleaned)::BIGINT AS kept_bytes,
       (strlen(text) - strlen(cleaned))::BIGINT AS removed_bytes,
       md5(cleaned) AS cleaned_md5, cleaned
FROM rebuilt ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def corpus():
    return pa.table(
        {
            "doc_id": pa.array([d[0] for d in DOCS], type=pa.int64()),
            "text": pa.array([d[1] for d in DOCS], type=pa.large_string()),
        }
    )


@pytest.fixture(scope="module")
def oracle(corpus):
    con = duckdb.connect()
    con.register("documents", corpus)
    stats = con.execute(STATS_SQL).df()
    clean = con.execute(CLEAN_SQL).df()
    con.close()
    return stats, clean


@pytest.mark.parametrize("local_threshold", [1_000_000, 0])
def test_stats_matches_duckdb(ray_session, corpus, oracle, local_threshold):
    import ray.data

    ds = ray.data.from_arrow(corpus)
    got = (
        paragraph_dedup_stats(ds, local_threshold=local_threshold)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, oracle[0], check_dtype=False)


# (local_threshold, broadcast_threshold): gated-local, distributed with
# broadcast rebuild, distributed with the tagged-union co-shuffle fallback
@pytest.mark.parametrize(
    "local_threshold,broadcast_threshold",
    [(1_000_000, 16_000_000), (0, 16_000_000), (0, 0)],
)
def test_clean_matches_duckdb(
    ray_session, corpus, oracle, local_threshold, broadcast_threshold
):
    import ray.data

    ds = ray.data.from_arrow(corpus)
    got = (
        paragraph_dedup_clean(
            ds,
            local_threshold=local_threshold,
            emit_text=True,
            broadcast_threshold=broadcast_threshold,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = oracle[1].rename(columns={"cleaned": "cleaned_text"})
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )


def test_clean_semantics_spotchecks(ray_session, corpus):
    """Human-readable anchors: first occurrence kept, blank lines kept,
    intra-doc duplicates removed, join removes exactly one separator."""
    import ray.data

    ds = ray.data.from_arrow(corpus)
    got = (
        paragraph_dedup_clean(ds, emit_text=True)
        .to_pandas()
        .set_index("doc_id")["cleaned_text"]
    )
    assert got[0] == "hello world\ncommon para\nunique zero"  # first wins
    assert got[1] == "\nunique one"  # blank line kept, dups removed
    assert got[4] == ""  # whole doc was a duplicated paragraph
    assert got[5] == "\n\n"  # blank-only doc untouched
    assert got[7] == "a"  # intra-doc dedup keeps first of three


def test_corpus_prep_stage_accounting(ray_session):
    """Composed prep pipeline (pipelines/prep.py): a corpus built to hit
    every drop path — low-quality doc, doc emptied by paragraph dedup,
    exact dup pair after cleaning — with both the gated-local and the
    forced-distributed election producing identical summaries."""
    import ray.data

    from plakar_ray.pipelines.prep import corpus_prep

    good_a = "the quick brown fox jumps over the lazy dog alpha " * 25
    good_b = "pack my box with five dozen liquor jugs beta " * 25
    shared = "shared boilerplate line"
    docs = [
        (0, good_a + "\n" + shared),       # keeps both (first everywhere)
        (1, shared + "\n" + good_b),       # cleans to good_b alone
        (2, shared),                       # emptied by the clean
        (3, good_a + "\n\n" + shared + "\n"),  # all non-empty paras are dups
        (4, good_b + "\n\n" + shared + "\n"),  # -> both clean to "\n": dup pair
        (5, "!!! ??? ,,, ..."),            # low quality -> gated out
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
            "text": pa.array([d[1] for d in docs], type=pa.large_string()),
        }
    )
    outs = []
    for lt in (1_000_000, 0):
        out = corpus_prep(
            ray.data.from_arrow(t), local_threshold=lt
        ).to_pandas()
        outs.append(out)
        r = out.iloc[0]
        assert r.docs_in == 6
        assert r.quality_dropped == 1       # doc 5
        assert r.paras_removed == 6         # shared x4, good_a x1, good_b x1
        assert r.empty_dropped == 1         # doc 2
        assert r.exact_dup_dropped == 1     # docs 3 and 4 both clean to "\n"
        assert r.docs_out == 3              # doc 0, doc 1, and one "\n" rep
        assert r.bytes_out > 0 and len(r.corpus_md5_xor) == 16
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_corpus_prep_tiered_accounting(ray_session):
    """Full tier-dedup stack (corpus_prep_tiered): the corpus_prep corpus
    plus a case-variant pair — different cleaned TEXT (so the exact tier
    keeps both) but identical token streams (so their word-3-gram shingle
    sets, signatures and every LSH band key are EQUAL and the near-dup
    tier must cluster them deterministically). Gated-local and
    forced-distributed paths must produce identical summaries."""
    import ray.data

    from plakar_ray.pipelines.prep import corpus_prep_tiered

    good_a = "the quick brown fox jumps over the lazy dog alpha " * 25
    good_b = "pack my box with five dozen liquor jugs beta " * 25
    good_c = "Sphinx Of Black Quartz Judge My Vow Gamma " * 25
    shared = "shared boilerplate line"
    docs = [
        (0, good_a + "\n" + shared),
        (1, shared + "\n" + good_b),
        (2, shared),                           # emptied by the clean
        (3, good_a + "\n\n" + shared + "\n"),  # cleans to "\n": dup pair
        (4, good_b + "\n\n" + shared + "\n"),
        (5, "!!! ??? ,,, ..."),                # low quality
        (6, good_c),                           # near-dup pair: same tokens,
        (7, good_c.lower()),                   # different exact text
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
            "text": pa.array([d[1] for d in docs], type=pa.large_string()),
        }
    )
    outs = []
    for lt in (1_000_000, 0):
        out = corpus_prep_tiered(
            ray.data.from_arrow(t), local_threshold=lt
        ).to_pandas()
        outs.append(out)
        r = out.iloc[0]
        assert r.docs_in == 8
        assert r.quality_dropped == 1      # doc 5
        assert r.paras_removed == 6
        assert r.empty_dropped == 1        # doc 2
        assert r.exact_dup_dropped == 1    # docs 3/4 both clean to "\n"
        assert r.neardup_dropped == 1      # doc 7 clusters under doc 6
        assert r.docs_out == 4             # doc 0, doc 1, "\n" rep, doc 6
        assert r.bytes_out > 0 and len(r.corpus_md5_xor) == 16
    pd.testing.assert_frame_equal(outs[0], outs[1])
