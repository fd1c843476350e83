"""MinHash signature stage: document -> (id, signature, n_shingles).

Shingles are the document's CDC chunk digests (digest64), so the signature
layer composes directly with the reference's chunkers: two documents share a
shingle iff they share a byte-identical chunk. The permutation family is
x -> a*x + b (mod 2^64) with odd `a` — a bijection on uint64, giving the
standard MinHash estimator. The permutation matrix is built once per actor
(__init__), the per-document min is one vectorized (P, k) reduction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from plakar_ray.functions.arrowbytes import byte_views
from plakar_ray.opts import ChunkerOpts
from plakar_ray.stages.chunk import ChunkerStage, default_pool_size

_U64 = np.uint64


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Finalizer mixing (splitmix64): makes each per-permutation map behave
    like a uniform random permutation of uint64 — plain a*x+b keeps low-bit
    structure that biases the min on small shingle sets."""
    z = z + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _perm_minima(
    shingles: np.ndarray, counts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, P) per-document minima of splitmix64(a*s + b) over
    doc-ordered contiguous shingle runs (doc d owns `counts[d]` shingles).
    Rows of shingle-less docs are all-0xFF sentinels.

    Dispatches to the native kernel (cdc.c:minhash_minima, bit-identical
    mod-2^64) when available; the numpy fallback processes permutations in
    blocks so the (P_block, total) working matrix stays ~100 MB."""
    from plakar_ray import _native

    n = counts.shape[0]
    num_perm = a.shape[0]
    total = int(shingles.shape[0])
    if total == 0 or n == 0:
        return np.full((n, num_perm), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    lib = _native.load()
    if lib is not None:
        offsets = np.empty(n + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(counts, out=offsets[1:])
        return _native.minhash_minima(lib, shingles, offsets, a, b)
    # reduceat over NON-EMPTY docs' starts only (strictly increasing):
    # clamping a trailing empty doc's start to total-1 would steal the
    # final shingle from the last non-empty doc's min.
    nz = counts > 0
    goff_nz = (np.cumsum(counts) - counts)[nz]
    sigs = np.full((n, num_perm), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    p_block = max(1, (100 << 20) // (8 * total))
    for p0 in range(0, num_perm, p_block):
        av = a[p0 : p0 + p_block, None]
        bv = b[p0 : p0 + p_block, None]
        vals = _splitmix64(av * shingles[None, :] + bv)
        sigs[nz, p0 : p0 + p_block] = np.minimum.reduceat(vals, goff_nz, axis=1).T
    return sigs


class MinHashStage:
    """documents batch -> signatures batch (fused chunk+digest+minhash: no
    intermediate chunk table leaves the actor).

    shingle="cdc" (default): shingles are CDC chunk digests — composes with
    the reference's chunkers; two documents share a shingle iff they share a
    byte-identical chunk. shingle="word3": lowercased word 3-gram hashes
    (classic n-gram Jaccard shingling, robust for short documents)."""

    def __init__(
        self,
        algo: str = "fastcdc",
        opts: ChunkerOpts | None = None,
        num_perm: int = 128,
        seed: int = 1337,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle: str = "cdc",
        chunk_hash: str = "wfnv",
    ):
        self.chunker = ChunkerStage(algo, opts, id_col=id_col, text_col=text_col)
        self.num_perm = num_perm
        self.a, self.b = minhash_params(num_perm, seed)
        self.id_col = id_col
        self.text_col = text_col
        if shingle not in ("cdc", "word3"):
            raise ValueError(f"unknown shingle mode: {shingle}")
        self.shingle = shingle
        # CDC chunk-shingle hash family. Shingles only need a strong 64-bit
        # hash (two docs share a shingle iff they share a byte-identical
        # chunk, up to 64-bit collisions at ~2^-64/pair): "wfnv" (word-wise
        # FNV variant, strhash.wfnv64_segments) runs ~6 GB/s in the native
        # kernel vs ~0.9 GB/s for C sha256 and ~0.6 GB/s for byte-serial
        # FNV, removing the signature stage's residual gap vs boundary-only
        # chunking. "fnv" is standard byte FNV-1a; "sha256" keeps the legacy
        # first-8-bytes-of-sha256 family.
        if chunk_hash not in ("wfnv", "fnv", "sha256"):
            raise ValueError(f"unknown chunk_hash: {chunk_hash}")
        self.chunk_hash = chunk_hash

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(k,) uint64 shingles -> (P,) uint64 signature."""
        # (P, k): splitmix64(a*s + b) (mod 2^64), then min over k.
        vals = _splitmix64(self.a[:, None] * shingles[None, :] + self.b[:, None])
        return vals.min(axis=1)

    def doc_shingles(self, doc: np.ndarray) -> np.ndarray:
        if self.shingle == "word3":
            return self._word3_shingles(doc)
        return self._cdc_shingles(doc)

    def _word3_shingles(self, doc: np.ndarray) -> np.ndarray:
        """Lowercased [a-z0-9]+ token stream -> FNV64 hash per 3-gram."""
        import re

        text = doc.tobytes().decode("utf-8", "replace").lower()
        toks = re.findall(r"[a-z0-9]+", text)
        if len(toks) < 3:
            toks = toks + ["\x00"] * (3 - len(toks)) if toks else []
        out = np.empty(max(len(toks) - 2, 0), dtype=np.uint64)
        for i in range(out.shape[0]):
            h = 0xCBF29CE484222325
            for b in ("\x1f".join(toks[i : i + 3])).encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return _splitmix64(out) if out.shape[0] else out

    def _segment_hash(self, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
        from plakar_ray.functions.strhash import (
            fnv1a64_segments,
            sha256_segments,
            wfnv64_segments,
        )

        if self.chunk_hash == "wfnv":
            return wfnv64_segments(lengths, data)
        if self.chunk_hash == "fnv":
            return fnv1a64_segments(lengths, data)
        return sha256_segments(lengths, data)

    def _cdc_shingles(self, doc: np.ndarray, lengths: np.ndarray | None = None) -> np.ndarray:
        """Chunk shingles = one 64-bit hash per CDC chunk (self.chunk_hash
        family; see __init__). The flagship's former cost was the per-DOC
        Python loop + per-doc np.unique + per-doc signature calls, removed
        by _cdc_batch."""
        if lengths is None:
            lengths = self.chunker.chunk_doc(doc)
        if lengths.shape[0] == 0:
            return np.empty(0, dtype=np.uint64)
        return self._segment_hash(lengths, doc)

    def _word3_batch(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized word-3-gram shingles + signatures for a whole batch.

        Tokens are re-joined into one '\\x1f'-separated byte stream per batch
        (doc-ordered), so every 3-gram is a CONTIGUOUS slice of that stream;
        slice hashes come from the positional FNV scan
        (functions/strhash.fnv1a64_slices) and per-doc signature minima from
        one segmented reduction. Bit-identical to the scalar _word3_shingles
        path (same bytes, same FNV/splitmix, same '\\x00' padding for 1-2
        token documents)."""
        import pyarrow.compute as pc

        from plakar_ray.functions.strhash import (
            arrow_token_lists,
            fnv1a64_slices,
            splitmix64,
        )

        n = len(batch)
        lower = pc.utf8_lower(batch.column(self.text_col))
        lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
        starts, ends, data, doc_off = arrow_token_lists(lists)
        lens = ends - starts
        keep = lens > 0
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(doc_off))
        kept_doc = doc_idx[keep]
        kcnt = np.bincount(kept_doc, minlength=n).astype(np.int64)
        # pad 1-2 token docs to exactly 3 tokens with single '\x00' bytes
        pad_docs = np.nonzero((kcnt >= 1) & (kcnt < 3))[0]
        pad_counts = 3 - kcnt[pad_docs]
        pad_doc_idx = np.repeat(pad_docs, pad_counts)
        all_doc = np.concatenate([kept_doc, pad_doc_idx])
        all_len = np.concatenate(
            [lens[keep], np.ones(pad_doc_idx.shape[0], dtype=np.int64)]
        )
        all_src = np.concatenate(
            [starts[keep], np.full(pad_doc_idx.shape[0], -1, dtype=np.int64)]
        )
        order = np.argsort(all_doc, kind="stable")  # kept tokens stay first
        all_doc, all_len, all_src = all_doc[order], all_len[order], all_src[order]
        t = all_doc.shape[0]
        sigs = np.full((n, self.num_perm), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        n_shingles = np.zeros(n, dtype=np.int32)
        if t == 0:
            return sigs, n_shingles
        # joined stream: token bytes followed by one separator each
        dst_sizes = all_len + 1
        dst_starts = np.cumsum(dst_sizes) - dst_sizes
        out = np.full(int(dst_sizes.sum()), 0x1F, dtype=np.uint8)
        total_tok_bytes = int(all_len.sum())
        cum = np.cumsum(all_len) - all_len
        off_in_tok = np.arange(total_tok_bytes) - np.repeat(cum, all_len)
        dst_idx = np.repeat(dst_starts, all_len) + off_in_tok
        src_idx = np.repeat(all_src, all_len) + off_in_tok
        pad_b = np.repeat(all_src < 0, all_len)
        out[dst_idx[~pad_b]] = data[src_idx[~pad_b]]
        out[dst_idx[pad_b]] = 0
        # 3-gram slices: tokens i, i+1, i+2 of the same doc
        valid = all_doc[:-2] == all_doc[2:] if t >= 3 else np.zeros(0, dtype=bool)
        gi = np.nonzero(valid)[0]
        if gi.shape[0] == 0:
            return sigs, n_shingles
        g_start = dst_starts[gi]
        g_end = dst_starts[gi + 2] + all_len[gi + 2]
        grams = splitmix64(fnv1a64_slices(g_start, g_end, out))
        g_doc = all_doc[gi]
        gcnt = np.bincount(g_doc, minlength=n).astype(np.int64)
        n_shingles = gcnt.astype(np.int32)
        # per-doc signature minima: grams are doc-ordered and contiguous
        sigs = _perm_minima(grams, gcnt, self.a, self.b)
        return sigs, n_shingles

    def _cdc_batch(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Fully batched CDC path: ONE boundary pass (batched frontier
        kernels), one C-speed segment-hash pass over every chunk in the batch
        (chunks tile the doc byte stream contiguously), then per-doc
        signature minima via _perm_minima (native kernel / blocked reduceat)
        — no per-doc Python loop, no per-doc np.unique, no per-doc
        signature() calls.
        Signature-identical to the scalar path (same chunk_hash shingle
        family; duplicate shingles never change a min)."""
        n = len(batch)
        data, offsets = byte_views(batch.column(self.text_col))
        multi = self.chunker.spec.boundaries_multi
        if multi is not None and n > 1:
            per_doc = multi(self.chunker.cfg, self.chunker.opts, data, offsets)
        else:
            per_doc = [
                self.chunker.chunk_doc(data[offsets[i] : offsets[i + 1]])
                for i in range(n)
            ]
        counts = np.fromiter(
            (p.shape[0] for p in per_doc), dtype=np.int64, count=n
        )
        n_shingles = counts.astype(np.int32)
        total = int(counts.sum())
        if total == 0:
            return _perm_minima(np.empty(0, np.uint64), counts, self.a, self.b), n_shingles
        lengths = np.concatenate(per_doc) if n > 1 else per_doc[0]
        # chunk lengths tile the rows' value-buffer region exactly
        shingles = self._segment_hash(lengths, data[offsets[0] : offsets[-1]])
        return _perm_minima(shingles, counts, self.a, self.b), n_shingles

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.shingle == "word3":
            sigs, n_shingles = self._word3_batch(batch)
        else:
            sigs, n_shingles = self._cdc_batch(batch)
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm
        )
        return pa.table(
            {
                self.id_col: ids,
                "sig": sig_arr,
                "n_shingles": pa.array(n_shingles, type=pa.int32()),
            }
        )


from functools import lru_cache


@lru_cache(maxsize=64)
def _cached_minhash_stage(
    algo, opts, num_perm, seed, id_col, text_col, shingle, chunk_hash="wfnv"
) -> "MinHashStage":
    return MinHashStage(algo, opts, num_perm=num_perm, seed=seed, id_col=id_col,
                        text_col=text_col, shingle=shingle, chunk_hash=chunk_hash)


def minhash_signatures(
    ds,
    algo: str = "fastcdc",
    opts: ChunkerOpts | None = None,
    num_perm: int = 128,
    seed: int = 1337,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
    batch_size: int | None = None,
    use_actors: bool = False,
    shingle: str = "cdc",
):
    """Stateless-task mode (default) caches the stage (permutation matrix +
    gear setup) once per worker process; actor mode for expensive keyed
    state. See chunk_dataset for the tradeoff."""
    if use_actors:
        if concurrency is None:
            concurrency = default_pool_size()
        return ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs=dict(
                algo=algo, opts=opts, num_perm=num_perm, seed=seed,
                id_col=id_col, text_col=text_col, shingle=shingle,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def apply(batch):
        return _cached_minhash_stage(algo, opts, num_perm, seed, id_col, text_col, shingle)(batch)

    return ds.map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate: fraction of agreeing signature slots."""
    return float((sig_a == sig_b).mean())
