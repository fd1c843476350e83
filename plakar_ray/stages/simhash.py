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


def simhash_pieces_batch(
    batch: pa.Table, bands: int, id_col: str, n_bits: int = 64
) -> pa.Table:
    """(id, simhash) -> (id, piece_id, piece, simhash) band rows. `n_bits`
    is the populated sketch width (16 for the SRP evidence sketches; pieces
    over the full 64 would put every doc in the same all-zero high-piece
    buckets)."""
    sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = sh.shape[0]
    width = n_bits // bands
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


def _bucket_hamming_pairs(
    pid: np.ndarray, piece: np.ndarray, ids: np.ndarray, shs: np.ndarray,
    max_hamming: int, n_bits: int | None = None,
) -> pa.Table:
    """Verified pairs from co-located (piece_id, piece) bucket rows.

    One vectorized lexsort finds every bucket; only buckets with >= 2
    distinct docs (rare — real near-dup collisions) pay the m^2 popcount
    verify. Shared by the driver-local fast path and the per-partition
    distributed stage, so both paths are result-identical by construction.
    With `n_bits` set (the SRP embedding path, stages/embed.py) each pair
    additionally carries cosine_est = cos(pi * hamming / n_bits)."""
    cols = {"id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64())}
    if n_bits:
        cols["cosine_est"] = pa.array([], type=pa.float64())
    empty = pa.table(cols)
    n = ids.shape[0]
    if n < 2:
        return empty
    order = np.lexsort((ids, piece, pid))
    pid, piece, ids, shs = pid[order], piece[order], ids[order], shs[order]
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = (pid[1:] != pid[:-1]) | (piece[1:] != piece[:-1])
    gstart = np.flatnonzero(newg)
    gend = np.append(gstart[1:], n)
    multi = np.flatnonzero(gend - gstart >= 2)
    if multi.size == 0:
        return empty
    out_a, out_b, out_h = [], [], []
    for g in multi:
        s, e = gstart[g], gend[g]
        uniq, first = np.unique(ids[s:e], return_index=True)
        gsh = shs[s:e][first]
        m = uniq.shape[0]
        if m < 2:
            continue
        xor = gsh[:, None] ^ gsh[None, :]
        ham = np.zeros((m, m), dtype=np.int64)
        v = xor.copy()
        for _ in range(8):  # byte-wise popcount of the 64-bit xor
            ham += _POP8[(v & _U64(0xFF)).astype(np.int64)]
            v >>= _U64(8)
        ia, ib = np.nonzero(np.triu(ham <= max_hamming, k=1))
        out_a.append(uniq[ia])
        out_b.append(uniq[ib])
        if n_bits:
            out_h.append(ham[ia, ib])
    if not out_a:
        return empty
    cols = {
        "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
        "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
    }
    if n_bits:
        est = np.cos(np.pi * np.concatenate(out_h) / n_bits)
        cols["cosine_est"] = pa.array(np.round(est, 6), type=pa.float64())
    return pa.table(cols)


def pieces_to_pairs(
    pieces, max_hamming: int, id_col: str = "doc_id",
    n_bits: int | None = None, local_threshold: int = 100_000,
):
    """(id, piece_id, piece, simhash) Dataset -> verified pair Dataset.

    The shared exchange tail for every pigeonhole-sketch pipeline (SimHash
    text near-dup, SRP embedding near-dup): ONE hash-partition repartition
    on (piece_id, piece) + per-partition lexsort verify, with a size-gated
    driver-local fast path. No global sort, no per-group UDF dispatch."""
    import ray.data

    def _arrays(t: pa.Table):
        return (
            t.column("piece_id").to_numpy(zero_copy_only=False),
            t.column("piece").to_numpy(zero_copy_only=False).astype(np.uint64),
            t.column(id_col).to_numpy(zero_copy_only=False),
            t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64),
        )

    # The piece table is sketch-scale (bands rows x 28 bytes per doc), far
    # smaller than the corpus; materializing it is the lineage boundary that
    # keeps the branch below from re-running the sketch stage.
    pieces = pieces.materialize()
    if local_threshold and pieces.count() <= local_threshold:
        tables = [b for b in pieces.iter_batches(batch_format="pyarrow", batch_size=None) if len(b)]
        if not tables:
            return ray.data.from_arrow(_bucket_hamming_pairs(
                np.empty(0, np.int32), np.empty(0, np.uint64),
                np.empty(0, np.int64), np.empty(0, np.uint64),
                max_hamming, n_bits,
            ))
        t = pa.concat_tables(tables)
        return ray.data.from_arrow(
            _bucket_hamming_pairs(*_arrays(t), max_hamming, n_bits)
        )

    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # Packed exchange (functions/exchange.py): piece rows are bands rows
    # per doc — blobs keep the shuffled row count block-granular.
    from plakar_ray.functions.exchange import packed_exchange

    piece_empty = pa.table(
        {
            "piece_id": pa.array([], type=pa.int32()),
            "piece": pa.array([], type=pa.uint64()),
            id_col: pa.array([], type=pa.int64()),
            "simhash": pa.array([], type=pa.uint64()),
        }
    )
    return packed_exchange(
        pieces, ["piece_id", "piece"], max(8, cpus // 4),
        lambda b: _bucket_hamming_pairs(*_arrays(b), max_hamming, n_bits),
        piece_empty,
    )


def simhash_candidate_pairs(
    ds, bands: int = 4, max_hamming: int = 3, id_col: str = "doc_id",
    local_threshold: int = 100_000,
):
    """documents -> verified near-dup edges (hamming(simhash) <= max_hamming).
    Guaranteed complete for max_hamming <= bands-1 (pigeonhole).

    Same exchange design as the MinHash LSH path (stages/lsh.py): piece rows
    move through ONE hash-partition repartition on (piece_id, piece) — no
    global sort, no per-group UDF dispatch (the former groupby().map_groups
    paid ~0.1 ms of scheduling per bucket x tens of thousands of singleton
    buckets) — then each partition verifies its buckets with one lexsort.
    Piece tables at or under `local_threshold` rows skip the exchange and
    group on the driver (identical results; piece rows are 28 bytes/doc/band,
    so the default admits ~25k docs at bands=4)."""
    # Stateless sketch stage -> task pool (no actor-pool startup tax; the
    # same trade measured in stages/lsh.py's exchange tail).
    sketch = SimHashStage(id_col=id_col)
    sketches = ds.map_batches(
        sketch,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pieces = sketches.map_batches(
        lambda b: simhash_pieces_batch(b, bands, id_col), batch_format="pyarrow"
    )
    return pieces_to_pairs(
        pieces, max_hamming, id_col=id_col, local_threshold=local_threshold
    )


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
