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
    ):
        self.chunker = ChunkerStage(algo, opts, id_col=id_col, text_col=text_col)
        self.num_perm = num_perm
        self.a, self.b = minhash_params(num_perm, seed)
        self.id_col = id_col
        self.text_col = text_col
        if shingle not in ("cdc", "word3"):
            raise ValueError(f"unknown shingle mode: {shingle}")
        self.shingle = shingle

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

    def _cdc_shingles(self, doc: np.ndarray) -> np.ndarray:
        import hashlib

        lengths = self.chunker.chunk_doc(doc)
        if lengths.shape[0] == 0:
            return np.empty(0, dtype=np.uint64)
        ends = np.cumsum(lengths)
        starts = ends - lengths
        mv = memoryview(doc)
        out = np.empty(lengths.shape[0], dtype=np.uint64)
        for j, (s0, e0) in enumerate(zip(starts.tolist(), ends.tolist())):
            out[j] = int.from_bytes(hashlib.sha256(mv[s0:e0]).digest()[:8], "little")
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.text_col))
        n = len(batch)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        n_shingles = np.empty(n, dtype=np.int32)
        for i in range(n):
            sh = self.doc_shingles(data[offsets[i] : offsets[i + 1]])
            n_shingles[i] = sh.shape[0]
            if sh.shape[0]:
                sigs[i] = self.signature(np.unique(sh))
            else:
                sigs[i] = _U64(0xFFFFFFFFFFFFFFFF)
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
def _cached_minhash_stage(algo, opts, num_perm, seed, id_col, text_col, shingle) -> "MinHashStage":
    return MinHashStage(algo, opts, num_perm=num_perm, seed=seed, id_col=id_col,
                        text_col=text_col, shingle=shingle)


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
