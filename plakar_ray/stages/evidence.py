"""Driver-verifiable twins of the MinHash and SimHash cores.

The production near-dup stages (stages/minhash.py, stages/simhash.py) use
gear/FNV hash families that no SQL engine reproduces, so the driver's
DuckDB gate can only count their rows. The two map-side pipelines here run
the SAME core computations — min-over-permutations of word-3-gram shingle
hashes (MinHash), and sign-of-bit-sums over distinct token hashes
(SimHash) — with an md5-derived 64-bit hash that DuckDB reproduces
exactly: ``md5_number_upper(s)`` equals the little-endian first 8 bytes of
``hashlib.md5(s)``. Permutations are XORs with fixed md5-derived
constants (XOR by a constant is a bijection on uint64, the classic
one-hash-function MinHash family), so every signature VALUE — not just the
row count — is checked by the driver's oracle.

Scale shape: both pipelines are pure map_batches (no shuffle, streams at
any corpus size). md5 is computed per distinct string per document — a
Python hashlib loop by necessity (numpy has no md5 kernel); the
min/bit-sum reductions are vectorized numpy. This is the evidence path;
the production path keeps the vectorized gear/FNV family
(stages/minhash.py:109, stages/simhash.py).

Reference anchor: the signature layer these queries evidence implements
SURVEY.md §2's near-dup extension of cmd/cdc/stats.go's digest-set dedup
(/root/reference/cmd/cdc/stats.go:122-155).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_U64 = np.uint64


def md5u64(data: bytes) -> int:
    """DuckDB md5_number_upper(s): little-endian first 8 md5 bytes."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def perm_constants(num_perm: int) -> np.ndarray:
    """XOR constants for the permutation family, md5u64('perm-<j>')."""
    return np.fromiter(
        (md5u64(b"perm-%d" % j) for j in range(num_perm)),
        dtype=np.uint64,
        count=num_perm,
    )


# Token-hash cache shared across batches within a worker process. The
# vocabulary is Zipfian, so the hit rate is high; bounded to keep worker
# heap flat on an unbounded-vocabulary corpus.
_TOK_CACHE: dict[str, int] = {}
_TOK_CACHE_MAX = 1_000_000


def _token_hash(tok: str) -> int:
    h = _TOK_CACHE.get(tok)
    if h is None:
        if len(_TOK_CACHE) >= _TOK_CACHE_MAX:
            _TOK_CACHE.clear()
        h = md5u64(tok.encode())
        _TOK_CACHE[tok] = h
    return h


def _doc_sig(text: str, perms: np.ndarray) -> tuple[np.ndarray | None, int]:
    """One doc's (signature, n_shingles) over DISTINCT word 3-grams; None
    when the doc has fewer than 3 tokens (no shingle exists)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < 3:
        return None, 0
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    hs = np.fromiter(
        (md5u64(s.encode()) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )
    return (hs[:, None] ^ perms[None, :]).min(axis=0), len(shingles)


def ngram_minhash_sig_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
) -> pa.Table:
    """(doc_id, perm_id, minhash64): per-doc MinHash over DISTINCT word
    3-grams. Documents with fewer than 3 tokens emit no rows (the oracle's
    ``WHERE len(t) >= 3`` mirrors this)."""
    perms = perm_constants(num_perm)
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids: list[int] = []
    out_mins: list[np.ndarray] = []
    for did, text in zip(ids, texts):
        mins, _ = _doc_sig(text, perms)
        if mins is None:
            continue
        out_ids.append(did)
        out_mins.append(mins)
    k = len(out_ids)
    mins = (
        np.stack(out_mins) if k else np.empty((0, num_perm), dtype=np.uint64)
    )
    return pa.table(
        {
            id_col: pa.array(np.repeat(np.asarray(out_ids, dtype=np.int64), num_perm)),
            "perm_id": pa.array(np.tile(np.arange(num_perm, dtype=np.int64), k)),
            "minhash64": pa.array(mins.reshape(-1), type=pa.uint64()),
        }
    )


def ngram_minhash_sig_wide_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
) -> pa.Table:
    """(doc_id, sig: fixed_size_list<uint64>[num_perm], n_shingles) — the
    SAME schema stages/minhash.MinHashStage emits, so the production LSH
    banding / candidate-pair / connected-components tail (stages/lsh.py,
    pipelines/dedup.clusters_from_signatures) runs unchanged over these
    driver-reproducible signatures. Docs without a shingle get n_shingles=0
    (filtered by BandStage's min_shingles gate, exactly like production)."""
    perms = perm_constants(num_perm)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    texts = batch.column(text_col).to_pylist()
    n = len(batch)
    sigs = np.full((n, num_perm), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    n_sh = np.zeros(n, dtype=np.int32)
    for i, text in enumerate(texts):
        mins, k = _doc_sig(text, perms)
        if mins is not None:
            sigs[i] = mins
            n_sh[i] = k
    sig_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.reshape(-1), type=pa.uint64()), num_perm
    )
    return pa.table(
        {
            id_col: ids,
            "sig": sig_arr,
            "n_shingles": pa.array(n_sh, type=pa.int32()),
        }
    )


def simhash_md5_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(doc_id, simhash64): 64-bit SimHash over DISTINCT tokens — bit b is
    set iff more distinct-token hashes have bit b set than clear (strict
    majority; ties clear the bit, matching the oracle's ``s > 0``).
    Documents with no tokens emit no rows."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids: list[int] = []
    hash_runs: list[np.ndarray] = []
    for did, text in zip(ids, texts):
        toks = set(_TOKEN_RE.findall(text.lower()))
        if not toks:
            continue
        out_ids.append(did)
        hash_runs.append(
            np.fromiter(
                (_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
            )
        )
    if not out_ids:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "simhash64": pa.array([], type=pa.uint64()),
            }
        )
    counts = np.fromiter((h.shape[0] for h in hash_runs), dtype=np.int64)
    hs = np.concatenate(hash_runs)
    starts = np.cumsum(counts) - counts
    counts_u = counts.astype(np.uint64)
    # Per-bit-plane accumulation: majority(±1 signs) > 0 ⟺ 2*ones > count.
    # Peak temporary is ONE (tokens,) plane, not the (tokens, 64) sign
    # matrix the old reduceat materialized (ADVICE r3 #3); each plane op
    # stays fully vectorized.
    vals = np.zeros(len(out_ids), dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat((hs >> np.uint64(b)) & _U64(1), starts)
        vals |= (np.uint64(2) * ones > counts_u).astype(np.uint64) << np.uint64(b)
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_ids, dtype=np.int64)),
            "simhash64": pa.array(vals, type=pa.uint64()),
        }
    )


def ngram_minhash_signatures(
    ds, id_col: str = "doc_id", text_col: str = "text", num_perm: int = 16
):
    return ds.map_batches(
        lambda b: ngram_minhash_sig_batch(b, id_col, text_col, num_perm),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_md5(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda b: simhash_md5_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ngram_minhash_signatures_wide(
    ds, id_col: str = "doc_id", text_col: str = "text", num_perm: int = 16
):
    return ds.map_batches(
        lambda b: ngram_minhash_sig_wide_batch(b, id_col, text_col, num_perm),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------- SRP (hyperplane) evidence sketches ------------

_SRP_QUANT = float(1 << 30)
_srp_signs_cache: dict[tuple[int, int], np.ndarray] = {}


def srp_sign_matrix(n_bits: int, dim: int) -> np.ndarray:
    """(n_bits, dim) ±1 hyperplane matrix from md5 bits — deterministic and
    DuckDB-reproducible (sign = top bit of md5_number_upper('hp-<j>-<d>'))."""
    key = (n_bits, dim)
    m = _srp_signs_cache.get(key)
    if m is None:
        m = np.array(
            [
                [1 if (md5u64(b"hp-%d-%d" % (j, d)) >> 63) == 0 else -1 for d in range(dim)]
                for j in range(n_bits)
            ],
            dtype=np.int64,
        )
        _srp_signs_cache[key] = m
    return m


def srp_sketch_batch(
    batch: pa.Table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
) -> pa.Table:
    """(vec_id, simhash): SRP sketch with EXACT integer dot products — each
    component is quantized floor(e * 2^30 + 0.5) (bit-identical in IEEE
    double on both engines: *2^30 is exact, the +0.5 and floor round the
    same way), so bit j = [sum_d q_d * sign_jd > 0] is integer-exact and the
    sketch is reproducible by the driver's oracle. The sign of the dot is
    scale-invariant, so raw (unnormalized) embeddings give the same bits as
    the production normalized path (stages/embed.hyperplane_lsh_pairs)."""
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    emb = batch.column(vec_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(batch)
    flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    dim = flat.shape[0] // max(n, 1)
    q = np.floor(flat.reshape(n, dim) * _SRP_QUANT + 0.5).astype(np.int64)
    signs = srp_sign_matrix(n_bits, dim)
    bits = (q @ signs.T) > 0
    sk = (bits.astype(np.uint64) << np.arange(n_bits, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table({id_col: ids, "simhash": pa.array(sk, type=pa.uint64())})


def srp_candidate_pairs_md5(
    ds, bands: int = 4, n_bits: int = 16, id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic-hyperplane SRP bucketing through the production
    pigeonhole tail (simhash_pieces_batch + pieces_to_pairs): pairs sharing
    at least one of `bands` sketch pieces, each carrying the
    sketch-estimated cosine. max_hamming = n_bits makes the Hamming verify
    a no-op, so the pair set is exactly the band-collision candidate set —
    what the SQL oracle reproduces with a band self-join."""
    from plakar_ray.stages.simhash import pieces_to_pairs, simhash_pieces_batch

    sketches = ds.map_batches(
        lambda b: srp_sketch_batch(b, id_col, vec_col, n_bits),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pieces = sketches.map_batches(
        lambda b: simhash_pieces_batch(b, bands, id_col, n_bits=n_bits),
        batch_format="pyarrow",
    )
    return pieces_to_pairs(pieces, max_hamming=n_bits, id_col=id_col, n_bits=n_bits)


def _md5_gram_winnow_batch(
    batch: pa.Table, gram_len: int, winnow_w: int, id_col: str, text_col: str
) -> pa.Table:
    """One (gram64, id, pos) row per winnow-SELECTED stride-1 gram, with the
    md5u64 gram-hash family DuckDB reproduces exactly (md5_number_upper).

    The selection rule is the production one — leftmost argmin of every
    length-w window of the doc's gram-hash sequence, whole-sequence argmin
    when it is shorter than w (pipelines.dedup._window_argmin_select, the
    numpy form differential-tested equal to the native winnow kernel) — so
    oracle parity value-checks the winnowing selection itself, not just the
    exchange tail it feeds. Window md5s are batched through the native
    OpenSSL segment kernel (_native/sha.c) with a hashlib fallback."""
    from plakar_ray import _native
    from plakar_ray.functions.arrowbytes import byte_views
    from plakar_ray.pipelines.dedup import _window_argmin_select

    L = int(gram_len)
    w = int(winnow_w)
    empty = pa.table(
        {
            "gram64": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    data, offsets = byte_views(batch.column(text_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    valid = np.maximum(lens - L + 1, 0).astype(np.int64)
    total = int(valid.sum())
    if total == 0:
        return empty
    # Stride-1 window bytes, md5-hashed in bounded TILES: materializing
    # the whole batch's windows at once is an ~L-fold (24x) copy of the
    # text bytes; tiling caps the temporary at TILE*L bytes (~6 MB) while
    # keeping the segment kernel batched. Only the u64 half of each
    # digest is retained (8x text, not 16x + the window matrix).
    lib = _native.load_sha()
    TILE = 1 << 18

    def _md5_tile(mats: list, n: int) -> np.ndarray:
        stream = np.ascontiguousarray(np.concatenate(mats)).reshape(-1)
        if lib is not None and hasattr(lib, "md5_segments_full"):
            dig = _native.md5_segments_full(
                lib, np.full(n, L, dtype=np.int64), stream
            )
        else:
            dig = np.empty((n, 16), dtype=np.uint8)
            mv = memoryview(stream)
            for j in range(n):
                dig[j] = np.frombuffer(
                    hashlib.md5(mv[j * L : (j + 1) * L]).digest(), dtype=np.uint8
                )
        return np.ascontiguousarray(dig[:, :8]).view("<u8").reshape(-1)

    h_parts: list[np.ndarray] = []
    cur: list = []
    cur_n = 0
    for d in range(lens.size):
        v = int(valid[d])
        if v == 0:
            continue
        vw = np.lib.stride_tricks.sliding_window_view(
            data[offsets[d] : offsets[d + 1]], L
        )[:v]
        i = 0
        while i < v:
            take = min(v - i, TILE - cur_n)
            cur.append(vw[i : i + take])
            cur_n += take
            i += take
            if cur_n == TILE:
                h_parts.append(_md5_tile(cur, cur_n))
                cur, cur_n = [], 0
    if cur_n:
        h_parts.append(_md5_tile(cur, cur_n))
    h_all = np.concatenate(h_parts)
    hs, ds_, ps = [], [], []
    start = 0
    for d in range(lens.size):
        v = int(valid[d])
        if v == 0:
            continue
        seg = h_all[start : start + v]
        start += v
        sel = _window_argmin_select(seg, w)
        hs.append(seg[sel])
        ds_.append(np.full(sel.size, ids[d], dtype=np.int64))
        ps.append(sel)
    return pa.table(
        {
            "gram64": pa.array(np.concatenate(hs), type=pa.uint64()),
            id_col: pa.array(np.concatenate(ds_), type=pa.int64()),
            "pos": pa.array(np.concatenate(ps), type=pa.int64()),
        }
    )


def substring_winnow_spans_md5(
    ds,
    gram_len: int = 24,
    winnow_w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    local_threshold: int = 2_000_000,
):
    """SQL-checkable twin of substring_dup_spans(winnow_w=w): md5u64 gram
    hashes + the production winnow selection feed the SAME packed
    gram-keyed / doc-keyed exchange tail (pipelines.dedup.
    spans_from_gram_rows). DuckDB reproduces the full result — window
    minima via min() over a w-row frame on (h * 2^40 + pos) composites
    (leftmost tie-break by construction), whole-sequence argmin for docs
    shorter than w, then the shared gaps-and-islands merge at
    merge_gap = L + w - 1."""
    from plakar_ray.pipelines.dedup import spans_from_gram_rows

    L = int(gram_len)
    merge_gap = L + max(0, int(winnow_w) - 1)
    grams = ds.map_batches(
        lambda b: _md5_gram_winnow_batch(b, L, int(winnow_w), id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return spans_from_gram_rows(grams, L, merge_gap, id_col, local_threshold)
