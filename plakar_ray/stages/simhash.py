"""SimHash near-duplicate detection.

simhash64(doc): 64-bit sketch from token hashes — each token votes its bit
pattern weighted by its count; the sign of each bit's vote sum becomes the
sketch bit. Near-dups have small Hamming distance. Candidate generation uses
the pigeonhole principle: split the 64 bits into `bands` pieces; two sketches
within hamming <= bands-1 share at least one exact piece, so a groupby on
(piece_id, piece_value) finds all candidates, verified by exact Hamming
distance. Same star-edge + groupby machinery as MinHash LSH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = z + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """FNV-1a 64-bit per token, then splitmix-finalized (scalar reference,
    kept as the differential-test spec for the vectorized batch path)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 0xCBF29CE484222325
        for b in t.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return _splitmix64(out)


def simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    hs = _token_hashes(tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(lists) -> np.ndarray:
    """Vectorized simhash64 for a list<string> token array: FNV-1a over byte
    positions (functions/strhash.py), bit votes aggregated per document with
    a segmented reduction. Bit-identical to simhash64 per document."""
    from plakar_ray.functions.strhash import (
        arrow_token_lists,
        fnv1a64_slices,
        reduceat_fixed,
        splitmix64,
    )

    starts, ends, data, doc_off = arrow_token_lists(lists)
    n_docs = doc_off.shape[0] - 1
    hs = splitmix64(fnv1a64_slices(starts, ends, data))
    w = (ends > starts)  # drop empty split artifacts
    # unpackbits(bitorder=little) on the LE uint64 bytes puts column b at
    # bit (h >> b) & 1 — ~200x faster than a 64-way shift broadcast.
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    bits *= w[:, None]
    sums = reduceat_fixed(bits, doc_off)  # (n_docs, 64) per-bit one-votes
    cnt = reduceat_fixed(w.astype(np.int32), doc_off)  # non-empty tokens/doc
    votes = 2 * sums - cnt[:, None]
    shifts = np.arange(64, dtype=np.uint64)
    out = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[cnt == 0] = 0
    return out if n_docs else out[:0]


class SimHashStage:
    """documents batch -> (id, simhash) rows."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column(self.text_col))
        lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(simhash_batch(lists), type=pa.uint64()),
            }
        )


def simhash_pieces_batch(batch: pa.Table, bands: int, id_col: str) -> pa.Table:
    """(id, simhash) -> (id, piece_id, piece, simhash) band rows."""
    sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = sh.shape[0]
    width = 64 // bands
    mask = _U64((1 << width) - 1)
    pieces = np.stack(
        [(sh >> _U64(width * j)) & mask for j in range(bands)], axis=1
    )
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    take = pa.array(np.repeat(np.arange(n), bands), type=pa.int64())
    return pa.table(
        {
            id_col: ids.take(take),
            "piece_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), type=pa.int32()),
            "piece": pa.array(pieces.reshape(-1), type=pa.uint64()),
            "simhash": pa.array(np.repeat(sh, bands), type=pa.uint64()),
        }
    )


def simhash_candidate_pairs(ds, bands: int = 4, max_hamming: int = 3, id_col: str = "doc_id"):
    """documents -> verified near-dup edges (hamming(simhash) <= max_hamming).
    Guaranteed complete for max_hamming <= bands-1 (pigeonhole)."""
    from plakar_ray.stages.chunk import default_pool_size

    sketches = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool_size(),
    )
    pieces = sketches.map_batches(
        lambda b: simhash_pieces_batch(b, bands, id_col), batch_format="pyarrow"
    )

    def verified_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        shs = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, shs = ids[order], shs[order]
        uniq, first = np.unique(ids, return_index=True)
        shs = shs[first]
        m = uniq.shape[0]
        if m < 2:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
            )
        xor = shs[:, None] ^ shs[None, :]
        ham = np.zeros((m, m), dtype=np.int64)
        v = xor.copy()
        for _ in range(8):  # byte-wise popcount of the 64-bit xor
            ham += _POP8[(v & _U64(0xFF)).astype(np.int64)]
            v >>= _U64(8)
        ia, ib = np.nonzero(np.triu(ham <= max_hamming, k=1))
        return pa.table(
            {
                "id_a": pa.array(uniq[ia], type=pa.int64()),
                "id_b": pa.array(uniq[ib], type=pa.int64()),
            }
        )

    return pieces.groupby(["piece_id", "piece"]).map_groups(
        verified_pairs, batch_format="pyarrow"
    )


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
