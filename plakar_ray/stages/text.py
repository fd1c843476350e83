"""Text-analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All per-batch kernels are vectorized through pyarrow.compute's RE2 regex
kernels (the same regex engine DuckDB uses, so the driver's SQL oracles can
reproduce every value exactly). No Python loop touches characters; loops are
per-regex, not per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.gear import GEAR

TOKEN_RE = "[a-zA-Z0-9]+"
ALPHA_RE = "[a-zA-Z]"
DIGIT_RE = "[0-9]"
SPACE_RE = " "

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Word-boundary regexes keep Python and SQL in exact agreement.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|you|that|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans)\b",
    "es": r"\b(el|los|las|es|una|para|con|por)\b",
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break: first wins


def _count(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(arr, pattern)


def text_stats_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-document stats: chars, tokens, alpha/digit/space counts and
    quality ratios."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = _count(text, TOKEN_RE).cast(pa.int64())
    n_alpha = _count(text, ALPHA_RE).cast(pa.int64())
    n_digit = _count(text, DIGIT_RE).cast(pa.int64())
    n_space = _count(text, SPACE_RE).cast(pa.int64())
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    safe = np.maximum(nc, 1.0)
    alpha_ratio = n_alpha.to_numpy(zero_copy_only=False) / safe
    space_ratio = n_space.to_numpy(zero_copy_only=False) / safe
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "n_space": n_space,
            "alpha_ratio": pa.array(alpha_ratio),
            "space_ratio": pa.array(space_ratio),
        }
    )


def quality_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Quality score in [0,1]: blends length, alpha ratio and mean token
    length — a C4/Gopher-style filter signal, deterministic and SQL-mirrorable."""
    st = text_stats_batch(batch, id_col, text_col)
    n_chars = st.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = st.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = st.column("n_alpha").to_numpy(zero_copy_only=False).astype(np.float64)
    mean_tok = np.where(n_tokens > 0, n_alpha / np.maximum(n_tokens, 1.0), 0.0)
    len_score = np.minimum(n_chars / 1000.0, 1.0)
    alpha_score = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1.0), 0.0)
    tok_score = np.minimum(mean_tok / 8.0, 1.0)
    quality = (len_score + alpha_score + tok_score) / 3.0
    return pa.table(
        {
            id_col: st.column(id_col),
            "n_chars": st.column("n_chars"),
            "n_tokens": st.column("n_tokens"),
            # raw float64, no rounding: consumers fixed-point it with
            # floor(q*1e6+0.5), which is bit-reproducible across engines when
            # the blend is computed in this exact operation order
            "quality": pa.array(quality),
        }
    )


def lang_id_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Stopword-marker language ID with deterministic tie-break
    (highest count wins; ties go to LANG_ORDER; all-zero -> 'unknown')."""
    text = batch.column(text_col)
    lower = pc.utf8_lower(text)
    counts = np.stack(
        [
            _count(lower, LANG_MARKERS[lang]).to_numpy(zero_copy_only=False)
            for lang in LANG_ORDER
        ],
        axis=1,
    )
    best = counts.argmax(axis=1)  # first max wins == LANG_ORDER tie-break
    has_any = counts.max(axis=1) > 0
    pred = np.where(has_any, np.array(LANG_ORDER, dtype=object)[best], "unknown")
    return pa.table(
        {
            id_col: batch.column(id_col),
            "lang_pred": pa.array(pred.tolist()),
            "marker_hits": pa.array(counts.sum(axis=1), type=pa.int64()),
        }
    )


_FP_MUL = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant


def fingerprint_mulhash_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", window: int = 8
) -> pa.Table:
    """SQL-checkable winnowing fingerprint: the document fingerprint is the
    MINIMUM over all `window`-byte windows of (window-bytes-as-big-endian-u64
    * golden-ratio constant mod 2^64). Same content-defined-sketch semantics
    as FingerprintStage's gear variant, but every step is plain integer
    arithmetic a DuckDB oracle reproduces exactly (ord/shift/multiply/mod).

    Docs shorter than `window` use their bytes zero-padded on the right;
    empty docs fingerprint to 0. Fully vectorized: 8 shift-or passes build
    every window value at once, one multiply, one min."""
    data, offsets = byte_views(batch.column(text_col))
    n = len(batch)
    fps = np.zeros(n, dtype=np.uint64)
    u = data.astype(np.uint64)
    for i in range(n):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        ln = hi - lo
        if ln == 0:
            continue
        if ln < window:
            pad = np.zeros(window, dtype=np.uint64)
            pad[:ln] = u[lo:hi]
            doc, ln = pad, window
        else:
            doc = u[lo:hi]
        acc = doc[: ln - window + 1].copy()
        for k in range(1, window):
            acc = (acc << np.uint64(8)) | doc[k : ln - window + 1 + k]
        fps[i] = (acc * _FP_MUL).min()
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fingerprint64": pa.array(fps, type=pa.uint64()),
        }
    )


class FingerprintStage:
    """Winnowing-style document fingerprint: gear rolling hash over bytes
    (window w=8), then the document fingerprint is the minimum window hash —
    a content-defined sketch stable under local edits. Rows-only (no SQL
    analogue); the gear table is shared with the chunkers."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", window: int = 8):
        self.id_col = id_col
        self.text_col = text_col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.text_col))
        n = len(batch)
        fps = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            doc = data[offsets[i] : offsets[i + 1]]
            if doc.shape[0] == 0:
                continue
            h = GEAR[doc]
            f = h.copy()
            for k in range(3):  # window-8 via doubling
                s = 1 << k
                if s >= f.shape[0]:
                    break
                f[s:] += np.left_shift(f[:-s], np.uint64(s))
            w = f[self.window - 1 :] if f.shape[0] >= self.window else f[-1:]
            fps[i] = w.min()
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "fingerprint64": pa.array(fps, type=pa.uint64()),
            }
        )


def token_explode_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Lowercased token partial counts per batch (map-side combiner): emits
    (token, partial count) so the global wordcount groupby shuffles counts,
    not token occurrences."""
    lower = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
    flat = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    all_tokens = flat.flatten()
    tbl = pa.table({"token": all_tokens})
    tbl = tbl.filter(pc.not_equal(tbl.column("token"), ""))
    counts = tbl.group_by("token").aggregate([("token", "count")])
    return pa.table(
        {
            "token": counts.column("token"),
            "partial": counts.column("token_count").cast(pa.int64()),
        }
    )
