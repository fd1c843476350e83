"""Native C boundary kernels: build-on-first-use, ctypes-bound, optional.

cdc.c implements the oracle cut functions (plakar_ray/oracle.py — the
repo's cited spec of fastcdc.go:225-253 / jc.go:205-244 /
ultracdc.go:101-240 / fastcdc4stadia.go:77-149) as sequential C. The
loader compiles it with the system gcc into a plain shared library keyed
by a source hash (no CPython ABI dependency, so any interpreter on the
node shares the artifact) and binds it via ctypes.

Everything degrades gracefully: no gcc, failed compile, or
PLAKAR_NATIVE=0 returns None and callers (plakar_ray/kernels.py) fall
through to the vectorized-numpy kernels. Concurrent first-use by many Ray
workers is safe — each compiles to a pid-suffixed temp file and
os.replace()s it into place atomically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cdc.c")

_i64 = ctypes.c_int64
_u64 = ctypes.c_uint64
_int = ctypes.c_int
_p_u8 = ctypes.POINTER(ctypes.c_uint8)
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_u64 = ctypes.POINTER(ctypes.c_uint64)

_SIGNATURES = {
    "fastcdc_doc": [_p_u8, _i64, _i64, _i64, _i64, _u64, _u64, _p_u64, _p_i64],
    "fastcdc_multi": [_p_u8, _p_i64, _i64, _i64, _i64, _i64, _u64, _u64, _p_u64, _p_i64, _p_i64],
    "jc_doc": [_p_u8, _i64, _i64, _i64, _i64, _u64, _u64, _i64, _int, _p_u64, _p_i64],
    "jc_multi": [_p_u8, _p_i64, _i64, _i64, _i64, _i64, _u64, _u64, _i64, _int, _p_u64, _p_i64, _p_i64],
    "ultracdc_doc": [_p_u8, _i64, _i64, _i64, _i64, _u64, _u64, _i64, _int, _p_i64],
    "ultracdc_multi": [_p_u8, _p_i64, _i64, _i64, _i64, _i64, _u64, _u64, _i64, _int, _p_i64, _p_i64],
    "stadia_doc": [_p_u8, _i64, _i64, _i64, _i64, _p_u64, _p_i64],
    "stadia_multi": [_p_u8, _p_i64, _i64, _i64, _i64, _i64, _p_u64, _p_i64, _p_i64],
    "fnv1a64_segments": [_p_u8, _p_i64, _i64, _p_u64],
    "wfnv64_segments": [_p_u8, _p_i64, _i64, _p_u64],
    "minhash_minima": [_p_u64, _p_i64, _i64, _p_u64, _p_u64, _i64, _p_u64],
    "winnow_select": [_p_u64, _i64, _i64, _p_i64, _p_i64],
    "gram_winnow_multi": [_p_u8, _p_i64, _i64, _i64, _i64, _u64, _i64,
                          _p_u64, ctypes.POINTER(ctypes.c_int32), _p_i64,
                          _p_i64, _p_u64],
}

_SHA_SRC = os.path.join(_DIR, "sha.c")

_SHA_SIGNATURES = {
    "sha256_segments_full": [_p_u8, _p_i64, _i64, _p_u8],
    "md5_segments_full": [_p_u8, _p_i64, _i64, _p_u8],
}

_lib = None
_tried = False
_sha_lib = None
_sha_tried = False


def _build(src_path: str, stem: str, signatures: dict,
           extra: list[str]) -> ctypes.CDLL | None:
    with open(src_path, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    name = f"lib{stem}_{tag}.so"
    for base in (_DIR, os.path.join(tempfile.gettempdir(), "plakar_native")):
        so = os.path.join(base, name)
        try:
            if not os.path.exists(so):
                os.makedirs(base, exist_ok=True)
                tmp = f"{so}.tmp{os.getpid()}"
                cmd = ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, src_path] + extra
                # Alignment pins the unrolled gear scan's hot loop to a
                # 32B boundary (throughput is alignment-sensitive on the
                # uop cache); optional, stripped with -march=native if the
                # local toolchain rejects either.
                opt = ["-march=native", "-falign-functions=64",
                       "-falign-loops=32"]
                r = subprocess.run(cmd + opt, capture_output=True)
                if r.returncode != 0:
                    r = subprocess.run(cmd, capture_output=True)
                    if r.returncode != 0:
                        continue
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            for fname, argtypes in signatures.items():
                fn = getattr(lib, fname)
                fn.argtypes = argtypes
                fn.restype = _i64
            return lib
        except (OSError, AttributeError):
            continue
    return None


def _compile_and_bind() -> ctypes.CDLL | None:
    return _build(_SRC, "plakarcdc", _SIGNATURES, [])


def _compile_and_bind_sha() -> ctypes.CDLL | None:
    return _build(_SHA_SRC, "plakarsha", _SHA_SIGNATURES, ["-lcrypto"])


def load() -> ctypes.CDLL | None:
    """The bound library, or None (unavailable / disabled). Cached per
    process; the compile itself is cached on disk across processes."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PLAKAR_NATIVE", "1") == "0":
        return None
    try:
        _lib = _compile_and_bind()
    except Exception:
        _lib = None
    return _lib


def load_sha() -> ctypes.CDLL | None:
    """The sha256 accelerator library, or None. Independent of load():
    it links -lcrypto, so its absence must not cost the boundary/shingle
    kernels."""
    global _sha_lib, _sha_tried
    if _sha_tried:
        return _sha_lib
    _sha_tried = True
    if os.environ.get("PLAKAR_NATIVE", "1") == "0":
        return None
    try:
        _sha_lib = _compile_and_bind_sha()
    except Exception:
        _sha_lib = None
    return _sha_lib


def sha256_segments_full(lib, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 sha256 digests of the contiguous segments tiling
    `data` (sum(lengths) == data.size)."""
    n = lengths.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    if n == 0:
        return out
    keep, p = _doc_ptr(data)
    lens = np.ascontiguousarray(lengths.astype(np.int64, copy=False))
    m = lib.sha256_segments_full(p, lens.ctypes.data_as(_p_i64), n,
                                 out.ctypes.data_as(_p_u8))
    if m != n:
        raise RuntimeError("sha256_segments_full failed")
    return out


def md5_segments_full(lib, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 md5 digests of the contiguous segments tiling
    `data` (sum(lengths) == data.size)."""
    n = lengths.shape[0]
    out = np.empty((n, 16), dtype=np.uint8)
    if n == 0:
        return out
    keep, p = _doc_ptr(data)
    lens = np.ascontiguousarray(lengths.astype(np.int64, copy=False))
    m = lib.md5_segments_full(p, lens.ctypes.data_as(_p_i64), n,
                              out.ctypes.data_as(_p_u8))
    if m != n:
        raise RuntimeError("md5_segments_full failed")
    return out


def _as_c(data: np.ndarray, ctype):
    if not data.flags["C_CONTIGUOUS"]:
        data = np.ascontiguousarray(data)
    return data, data.ctypes.data_as(ctype)


_EMPTY_U8 = np.zeros(1, dtype=np.uint8)  # non-NULL pointer for 0-byte docs


def _doc_ptr(data: np.ndarray):
    if data.shape[0] == 0:
        return _EMPTY_U8, _EMPTY_U8.ctypes.data_as(_p_u8)
    return _as_c(data, _p_u8)


def _split(flat: np.ndarray, counts: np.ndarray) -> list[np.ndarray]:
    return np.split(flat, np.cumsum(counts)[:-1])


def fastcdc_doc(lib, data, opts, mask_s, mask_l, gear) -> np.ndarray:
    keep, p = _doc_ptr(data)
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(data.shape[0] // max(opts.min_size, 1) + 2, dtype=np.int64)
    m = lib.fastcdc_doc(p, data.shape[0], opts.min_size, opts.max_size,
                        opts.normal_size, mask_s, mask_l, gp,
                        out.ctypes.data_as(_p_i64))
    return out[:m]


def fastcdc_multi(lib, data, doc_offsets, opts, mask_s, mask_l, gear) -> list[np.ndarray]:
    n_docs = len(doc_offsets) - 1
    offs = np.ascontiguousarray(np.asarray(doc_offsets, dtype=np.int64))
    total = int(offs[-1] - offs[0])
    keep, p = _doc_ptr(data[offs[0]:offs[-1]])
    rel = offs - offs[0]
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(total // max(opts.min_size, 1) + n_docs + 1, dtype=np.int64)
    counts = np.empty(n_docs, dtype=np.int64)
    lib.fastcdc_multi(p, rel.ctypes.data_as(_p_i64), n_docs, opts.min_size,
                      opts.max_size, opts.normal_size, mask_s, mask_l, gp,
                      out.ctypes.data_as(_p_i64), counts.ctypes.data_as(_p_i64))
    return _split(out[:int(counts.sum())], counts)


def jc_doc(lib, data, opts, mask_c, mask_j, jump_length, spec_faithful, gear) -> np.ndarray:
    keep, p = _doc_ptr(data)
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(data.shape[0] // max(opts.min_size, 1) + 2, dtype=np.int64)
    m = lib.jc_doc(p, data.shape[0], opts.min_size, opts.max_size,
                   opts.normal_size, mask_c, mask_j, jump_length,
                   int(spec_faithful), gp, out.ctypes.data_as(_p_i64))
    return out[:m]


def jc_multi(lib, data, doc_offsets, opts, mask_c, mask_j, jump_length,
             spec_faithful, gear) -> list[np.ndarray]:
    n_docs = len(doc_offsets) - 1
    offs = np.ascontiguousarray(np.asarray(doc_offsets, dtype=np.int64))
    total = int(offs[-1] - offs[0])
    keep, p = _doc_ptr(data[offs[0]:offs[-1]])
    rel = offs - offs[0]
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(total // max(opts.min_size, 1) + n_docs + 1, dtype=np.int64)
    counts = np.empty(n_docs, dtype=np.int64)
    lib.jc_multi(p, rel.ctypes.data_as(_p_i64), n_docs, opts.min_size,
                 opts.max_size, opts.normal_size, mask_c, mask_j, jump_length,
                 int(spec_faithful), gp, out.ctypes.data_as(_p_i64),
                 counts.ctypes.data_as(_p_i64))
    return _split(out[:int(counts.sum())], counts)


def ultracdc_doc(lib, data, opts, mask_s, mask_l, lest, spec_faithful) -> np.ndarray:
    keep, p = _doc_ptr(data)
    out = np.empty(data.shape[0] // max(opts.min_size, 1) + 2, dtype=np.int64)
    m = lib.ultracdc_doc(p, data.shape[0], opts.min_size, opts.max_size,
                         opts.normal_size, mask_s, mask_l, lest,
                         int(spec_faithful), out.ctypes.data_as(_p_i64))
    return out[:m]


def ultracdc_multi(lib, data, doc_offsets, opts, mask_s, mask_l, lest,
                   spec_faithful) -> list[np.ndarray]:
    n_docs = len(doc_offsets) - 1
    offs = np.ascontiguousarray(np.asarray(doc_offsets, dtype=np.int64))
    total = int(offs[-1] - offs[0])
    keep, p = _doc_ptr(data[offs[0]:offs[-1]])
    rel = offs - offs[0]
    out = np.empty(total // max(opts.min_size, 1) + n_docs + 1, dtype=np.int64)
    counts = np.empty(n_docs, dtype=np.int64)
    lib.ultracdc_multi(p, rel.ctypes.data_as(_p_i64), n_docs, opts.min_size,
                       opts.max_size, opts.normal_size, mask_s, mask_l, lest,
                       int(spec_faithful), out.ctypes.data_as(_p_i64),
                       counts.ctypes.data_as(_p_i64))
    return _split(out[:int(counts.sum())], counts)


def fnv_segments(lib, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    return _segments_hash(lib.fnv1a64_segments, lengths, data)


def wfnv_segments(lib, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    return _segments_hash(lib.wfnv64_segments, lengths, data)


def _segments_hash(fn, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    n = lengths.shape[0]
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    keep, p = _doc_ptr(data)
    lens = np.ascontiguousarray(lengths.astype(np.int64, copy=False))
    fn(p, lens.ctypes.data_as(_p_i64), n, out.ctypes.data_as(_p_u64))
    return out


def minhash_minima(lib, shingles: np.ndarray, offsets: np.ndarray,
                   a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-doc splitmix64(a*s+b) minima; offsets is int64 (n_docs+1) with
    offsets[-1] == shingles.shape[0]. Rows of shingle-less docs come back
    all-UINT64_MAX."""
    n_docs = offsets.shape[0] - 1
    n_perm = a.shape[0]
    out = np.empty((n_docs, n_perm), dtype=np.uint64)
    if n_docs == 0:
        return out
    sh = shingles if shingles.shape[0] else np.zeros(1, dtype=np.uint64)
    sh, shp = _as_c(sh, _p_u64)
    offs = np.ascontiguousarray(offsets.astype(np.int64, copy=False))
    a, ap = _as_c(a, _p_u64)
    b, bp = _as_c(b, _p_u64)
    lib.minhash_minima(shp, offs.ctypes.data_as(_p_i64), n_docs, ap, bp,
                       n_perm, out.ctypes.data_as(_p_u64))
    return out


def gram_winnow_multi(lib, data: np.ndarray, offsets: np.ndarray,
                      gram_len: int, winnow_w: int, mul: int):
    """Fused rolling-gram hash + winnow selection over the doc segments
    data[offsets[d]:offsets[d+1]] (one C pass per batch, no h_all array).
    Returns (hash u64, doc_index int32, pos int64) arrays of the selected
    windows; winnow_w <= 1 emits every stride-1 window."""
    n_docs = offsets.shape[0] - 1
    if n_docs <= 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int32), z
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    lens = offs[1:] - offs[:-1]
    total = int(np.maximum(lens - gram_len + 1, 0).sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int32), z
    data, dp = _doc_ptr(data)
    op = offs.ctypes.data_as(_p_i64)
    w = int(winnow_w)
    # expected selections ~ 2v/(w+1); 3x headroom, exact-bound retry.
    cap = total if w <= 1 else min(total, 6 * total // (w + 1) + 4 * n_docs + 1024)
    ringsz = 1
    while ringsz < max(w, 1) + 1:  # C uses a pow2 mask ring of >= w+1 slots
        ringsz <<= 1
    dq = np.empty(ringsz, dtype=np.int64)
    ring = np.empty(ringsz, dtype=np.uint64)
    while True:
        out_h = np.empty(cap, dtype=np.uint64)
        out_d = np.empty(cap, dtype=np.int32)
        out_p = np.empty(cap, dtype=np.int64)
        n = lib.gram_winnow_multi(
            dp, op, n_docs, int(gram_len), w, _u64(int(mul)), cap,
            out_h.ctypes.data_as(_p_u64),
            out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_p.ctypes.data_as(_p_i64),
            dq.ctypes.data_as(_p_i64),
            ring.ctypes.data_as(_p_u64),
        )
        if n >= 0:
            return out_h[:n], out_d[:n], out_p[:n]
        cap = total  # exact stride-1 upper bound; cannot fail twice


def winnow_select(lib, h: np.ndarray, w: int,
                  out: np.ndarray, scratch: np.ndarray) -> np.ndarray:
    """Leftmost argmin of every w-window of h, deduped+sorted (the winnow
    selection of pipelines/dedup.py). `out` and `scratch` are caller-owned
    int64 buffers of capacity >= h.size (reused across calls); returns a
    COPY of the selected slice."""
    if h.size == 0:
        return np.empty(0, dtype=np.int64)
    h, hp = _as_c(h, _p_u64)
    n = lib.winnow_select(hp, h.shape[0], w,
                          out.ctypes.data_as(_p_i64),
                          scratch.ctypes.data_as(_p_i64))
    return out[:n].copy()


def stadia_doc(lib, data, opts, gear) -> np.ndarray:
    keep, p = _doc_ptr(data)
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(data.shape[0] // max(opts.min_size, 1) + 2, dtype=np.int64)
    m = lib.stadia_doc(p, data.shape[0], opts.min_size, opts.max_size,
                       opts.normal_size, gp, out.ctypes.data_as(_p_i64))
    return out[:m]


def stadia_multi(lib, data, doc_offsets, opts, gear) -> list[np.ndarray]:
    n_docs = len(doc_offsets) - 1
    offs = np.ascontiguousarray(np.asarray(doc_offsets, dtype=np.int64))
    total = int(offs[-1] - offs[0])
    keep, p = _doc_ptr(data[offs[0]:offs[-1]])
    rel = offs - offs[0]
    gear, gp = _as_c(gear, _p_u64)
    out = np.empty(total // max(opts.min_size, 1) + n_docs + 1, dtype=np.int64)
    counts = np.empty(n_docs, dtype=np.int64)
    lib.stadia_multi(p, rel.ctypes.data_as(_p_i64), n_docs, opts.min_size,
                     opts.max_size, opts.normal_size, gp,
                     out.ctypes.data_as(_p_i64), counts.ctypes.data_as(_p_i64))
    return _split(out[:int(counts.sum())], counts)
