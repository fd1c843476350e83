"""Vectorized whole-document CDC boundary kernels (NumPy).

Each kernel returns the full sequence of chunk *lengths* for one document,
reproducing the reference's Next()-stream semantics byte-exactly
(chunkers.go:160-190): windows of at most MaxSize, every non-final chunk in
[MinSize, MaxSize], a short tail ends the stream.

Vectorization strategy (differential-tested against plakar_ray.oracle):

* Gear-hash algorithms (FastCDC / JC / Stadia) exploit the window-64 identity:
  fp after byte i is Sigma_{j<64} G[b_{i-j}] << j (mod 2^64) once >=64 bytes
  have accumulated, because a 64-bit left shift annihilates older terms. The
  whole-buffer array F of those window hashes is computed with a log-doubling
  scan (6 shifted adds), cut *candidates* are extracted once with np.nonzero,
  and a sparse per-chunk resolution loop walks the candidates. Only warm-up
  positions (< 64 bytes into a scan segment) need exact short-window hashes,
  computed per segment with a <=63x63 shifted outer-product matrix.
* UltraCDC computes the sliding 8-byte Hamming-to-0xAA window sums with a
  tiled 3-pass doubling add (SIMD-friendly; np.cumsum is a scalar loop and
  measured ~20x slower on this host); equal-window runs (the low-entropy
  path) come from maximal runs of byte-equality at lag 8.

No Python loop ever iterates bytes in steady state; loops iterate chunks and
sparse candidate/event lists only.

Measured dead end (do not retry): a uint32 prefilter scan (window hash mod
2^32, 5 doubling passes over half-width data, then exact u64 verify of the
survivors via an (m, 64) gather matrix) is 0.57-0.60x the u64 scan for both
fastcdc-legacy and jc-legacy. Every registry premask has only ~6 low-32 bits
(1/64 selectivity), so the sparse verify touches one 64-wide window per 64
positions — the same memory traffic the narrower scan saved.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import numpy as np

from plakar_ray import _native
from plakar_ray.gear import GEAR, GEAR64_STADIA
from plakar_ray.opts import (
    ULTRACDC_LEST,
    ULTRACDC_MASK_L,
    ULTRACDC_MASK_S,
    ChunkerOpts,
)

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

def _gear_window64(h: np.ndarray, in_place: bool = False) -> np.ndarray:
    """F[i] = Sigma_{j=0}^{63} h[i-j] << j (mod 2^64), prefix-truncated for
    i < 63, via log-doubling: 6 shifted adds instead of 64. in_place=True
    destroys h (callers passing a fresh gather temp skip a copy)."""
    f = h if in_place else h.copy()
    for k in range(6):
        s = 1 << k
        if s >= f.shape[0]:
            break
        f[s:] += np.left_shift(f[:-s], _U64(s))
    return f


# Tile size for candidate extraction: arrays stay cache-resident so the
# 6-pass doubling scan does not round-trip DRAM per pass. 2^16 elements
# (~0.5 MB of uint64 working set) measured fastest single-core; under
# many-core execution the per-core working set x cores must fit shared L3,
# so the default errs small. Tunable for experiments via PLAKAR_TILE_POW.
import os as _os

_TILE = 1 << int(_os.environ.get("PLAKAR_TILE_POW", "16"))


def _gear_candidates(
    data: np.ndarray, gear: np.ndarray, test, premask: int | None = None
) -> tuple[list, list]:
    """Scan the whole buffer tile-by-tile (63-byte overlap keeps the window-64
    hash exact across tile edges) and return (positions, hash values) of all
    positions where test(F) holds, as Python lists for fast resolution.

    `premask`: a necessary-condition mask ((F & premask) == 0 for every true
    candidate — e.g. the intersection of the strict and loose masks); the
    dense test then runs in 3 array passes and `test` only on the sparse
    prefiltered values. premask == the exact mask <=> test may be None."""
    n = data.shape[0]
    idx_parts: list[np.ndarray] = []
    f_parts: list[np.ndarray] = []
    pm = _U64(premask) if premask is not None else None
    for start in range(0, n, _TILE):
        lo = max(0, start - 63)
        hi = min(n, start + _TILE)
        f = _gear_window64(gear[data[lo:hi]], in_place=True)
        seg = f[start - lo :]
        if pm is not None:
            rel = np.nonzero((seg & pm) == 0)[0]
            if rel.shape[0] == 0:
                continue
            vals = seg[rel]
            if test is not None:
                keep = test(vals)
                rel, vals = rel[keep], vals[keep]
        else:
            rel = np.nonzero(test(seg))[0]
            vals = seg[rel]
        if rel.shape[0]:
            idx_parts.append(rel + start)
            f_parts.append(vals)
    if not idx_parts:
        return [], []
    return (
        np.concatenate(idx_parts).tolist(),
        np.concatenate(f_parts).tolist(),
    )


def _gear_f_range(data: np.ndarray, gear: np.ndarray, a: int, b: int) -> np.ndarray:
    """Exact window-64 gear hashes for positions [a, b) only."""
    lo = max(0, a - 63)
    return _gear_window64(gear[data[lo:b]])[a - lo :]


def _warm_fps(h_seg: np.ndarray) -> np.ndarray:
    """Exact short-window fingerprints for one scan segment's warm-up: given
    gear values h_seg (length L <= 63) starting at the segment's first scanned
    byte, return fp[d] = Sigma_{j<=d} h_seg[d-j] << j for d = 0..L-1.

    For L <= 64 the log-doubling window scan IS the prefix-truncated warm-up
    (no byte older than 63 positions exists to be forgotten), so this is
    _gear_window64 on the segment — ~20% faster per call than the previous
    (L, L) shift-matrix formulation, and callers pass a fresh gather temp so
    in_place is safe. Equality with the matrix form is pinned by
    tests/test_kernels_differential.py::test_warm_fps_matches_matrix."""
    return _gear_window64(h_seg, in_place=True)


def boundaries_fixed(data: np.ndarray, opts: ChunkerOpts) -> np.ndarray:
    total = data.shape[0]
    if total == 0:
        return np.empty(0, dtype=np.int64)
    size = opts.normal_size
    n_full, tail = divmod(total, size)
    lengths = np.full(n_full + (1 if tail else 0), size, dtype=np.int64)
    if tail:
        lengths[-1] = tail
    return lengths


def boundaries_fastcdc(
    data: np.ndarray,
    opts: ChunkerOpts,
    mask_s: int,
    mask_l: int,
    gear: np.ndarray = GEAR,
) -> np.ndarray:
    """FastCDC (fastcdc.go:225-253) over a whole document."""
    lib = _native.load()
    if lib is not None:
        return _native.fastcdc_doc(lib, data, opts, int(mask_s), int(mask_l), gear)
    total = int(data.shape[0])
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    if total == 0:
        return np.empty(0, dtype=np.int64)
    if total <= min_size:
        return np.array([total], dtype=np.int64)

    ms, ml = _U64(mask_s), _U64(mask_l)
    cand_pos, cand_fp = _gear_candidates(
        data, gear,
        lambda f: ((f & ms) == 0) | ((f & ml) == 0),
        premask=mask_s & mask_l,
    )
    ims, iml = int(mask_s), int(mask_l)

    lengths: list[int] = []
    s = 0
    n_cand = len(cand_pos)
    j = 0
    while s < total:
        n = min(total - s, max_size)
        if n <= min_size:
            lengths.append(n)
            break
        normal_eff = normal_size if n > normal_size else n

        scan_start = s + min_size
        warm_end = min(scan_start + 63, s + n)
        cut = -1
        # Warm-up: fp has seen < 64 bytes; exact short-window check.
        L = warm_end - scan_start
        if L > 0:
            fps = _warm_fps(gear[data[scan_start:warm_end]])
            rel = np.arange(min_size, min_size + L)
            masks = np.where(rel < normal_eff, ms, ml)
            hits = np.nonzero((fps & masks) == 0)[0]
            if hits.shape[0]:
                cut = scan_start + int(hits[0])
        if cut < 0:
            # Steady state: walk precomputed candidates.
            j = bisect_left(cand_pos, warm_end, j)
            end = s + n
            switch = s + normal_eff
            while j < n_cand:
                p = cand_pos[j]
                if p >= end:
                    break
                m = ims if p < switch else iml
                if (cand_fp[j] & m) == 0:
                    cut = p
                    break
                j += 1
        cut_len = (cut - s) if cut >= 0 else n
        lengths.append(cut_len)
        s += cut_len
    return np.asarray(lengths, dtype=np.int64)


def boundaries_jc(
    data: np.ndarray,
    opts: ChunkerOpts,
    mask_c: int,
    mask_j: int,
    jump_length: int,
    spec_faithful: bool,
    gear: np.ndarray = GEAR,
) -> np.ndarray:
    """JC jump chunking (jc.go:205-244) over a whole document. fp resets to 0
    after every jump, so each chunk is a chain of scan *segments*; each segment
    has a warm-up (<64 bytes, exact matrix fps) and a steady tail (window-64
    candidates). All events (cuts and jumps) live at maskJ candidates because
    maskJ subset maskC."""
    lib = _native.load()
    if lib is not None:
        return _native.jc_doc(
            lib, data, opts, int(mask_c), int(mask_j), jump_length,
            spec_faithful, gear,
        )
    total = int(data.shape[0])
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    if total == 0:
        return np.empty(0, dtype=np.int64)

    mc, mj = _U64(mask_c), _U64(mask_j)
    cand_pos, cand_fp = _gear_candidates(data, gear, None, premask=mask_j)
    imc = int(mask_c)
    # Note: batching all candidate-derived warm-ups into one (m, 63) scan was
    # tried and measured SLOWER here — only ~25% of candidate positions become
    # real segment starts, and this host's memory throughput makes computing
    # 4x the needed warm-ups cost more than the per-segment matrix calls.
    lengths: list[int] = []
    s = 0
    n_cand = len(cand_pos)
    while s < total:
        n = min(total - s, max_size)
        if not spec_faithful and n <= normal_size:
            # Legacy: final sub-NormalSize segment returned whole (jc.go:219-223).
            lengths.append(n)
            break
        if n <= min_size:
            # Spec path's implicit min guard: loop from MinSize >= n returns n.
            lengths.append(n)
            break

        end = s + n
        cut = -1
        seg = s + min_size  # current scan segment start (fp == 0 before it)
        while seg < end:
            # Warm-up for this segment.
            warm_end = min(seg + 63, end)
            event = -1  # absolute position of first maskJ hit
            event_fp = 0
            if warm_end - seg > 0:
                fps = _warm_fps(gear[data[seg:warm_end]])
                hits = np.nonzero((fps & mj) == 0)[0]
                if hits.shape[0]:
                    event = seg + int(hits[0])
                    event_fp = int(fps[hits[0]])
            if event < 0:
                j = bisect_left(cand_pos, warm_end)
                if j < n_cand and cand_pos[j] < end:
                    event = cand_pos[j]
                    event_fp = cand_fp[j]
            if event < 0:
                break  # no event: chunk runs to end
            if (event_fp & imc) == 0:
                cut = event
                break
            # Jump: fp = 0, i += jumpLength (jc.go:236-238).
            seg = event + jump_length

        if cut >= 0:
            cut_len = cut - s
        else:
            # return min(i, n): i may have jumped past n (jc.go:243).
            cut_len = n
        lengths.append(cut_len)
        s += cut_len
        if cut_len < min_size:
            break
    return np.asarray(lengths, dtype=np.int64)


# --------------------- batched multi-document warm-up frontier -------------
#
# ChunkerStage hands the kernels a whole batch (one contiguous buffer +
# doc offsets). The per-segment warm-up calls in boundaries_fastcdc /
# boundaries_jc are numpy-launch-overhead-bound (~18 us for 63 elements,
# ~25% of JC wall time at 2 warm-ups per chunk), so the multi-doc drivers
# below advance every document's scan frontier in WAVES: each wave gathers
# all active segments' warm windows with one fancy-index and computes their
# prefix fingerprints with one axis-1 log-doubling — a handful of numpy
# calls per wave instead of per segment. Results are cutpoint-identical to
# the per-document kernels (pinned by
# tests/test_kernels_differential.py::test_multi_doc_matches_per_doc).


def _warm_rows(
    data: np.ndarray, abs_starts: np.ndarray, warm_lens: np.ndarray, gear: np.ndarray
) -> np.ndarray:
    """(n_active, 63) exact prefix-window fps for many scan segments at
    once. Bytes beyond each row's warm_len are zeroed pre-scan (a zero gear
    value contributes nothing to later prefixes and the caller masks those
    columns out of the hit test)."""
    cols = np.arange(63)
    idx = abs_starts[:, None] + cols[None, :]
    np.clip(idx, 0, max(data.shape[0] - 1, 0), out=idx)
    h = gear[data[idx]]
    h[cols[None, :] >= warm_lens[:, None]] = _U64(0)
    for k in range(6):
        s = 1 << k
        h[:, s:] += h[:, :-s] << _U64(s)
    return h


def _split_batch_candidates(
    data: np.ndarray,
    doc_offsets: np.ndarray,
    out: list,
    cands: list,
    gear: np.ndarray,
    test,
    premask: int,
) -> None:
    """ONE dense candidate scan over the whole batch buffer, split per doc.

    Full-window hashes from the concatenated buffer are exact for every
    position >= 63 bytes into its document; the resolution loops only ever
    consult candidates at doc-relative positions >= MinSize + 63 (and
    MinSize >= 64), so cross-document window contamination — confined to
    the first 63 bytes after each doc start — touches only positions that
    are never read. Those entries are dropped when splitting. Replaces a
    per-document scan whose fixed setup cost dominates for small (web-page
    or driver-table) documents."""
    pos_all, fp_all = _gear_candidates(data, gear, test, premask)
    pos_arr = np.asarray(pos_all, dtype=np.int64)
    fp_arr = np.asarray(fp_all, dtype=np.uint64)
    for d in range(len(doc_offsets) - 1):
        if out[d] is not None:
            continue
        lo = int(np.searchsorted(pos_arr, doc_offsets[d] + 63))
        hi = int(np.searchsorted(pos_arr, doc_offsets[d + 1]))
        cands[d] = (
            (pos_arr[lo:hi] - doc_offsets[d]).tolist(),
            fp_arr[lo:hi].tolist(),
        )


def boundaries_fastcdc_multi(
    data: np.ndarray,
    doc_offsets: np.ndarray,
    opts: ChunkerOpts,
    mask_s: int,
    mask_l: int,
    gear: np.ndarray = GEAR,
) -> list[np.ndarray]:
    """FastCDC over every document of a batch buffer; one warm-up wave per
    chunk generation across all still-active documents."""
    lib = _native.load()
    if lib is not None:
        return _native.fastcdc_multi(
            lib, data, doc_offsets, opts, int(mask_s), int(mask_l), gear
        )
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    ms, ml = _U64(mask_s), _U64(mask_l)
    ims, iml = int(mask_s), int(mask_l)
    n_docs = len(doc_offsets) - 1
    out: list = [None] * n_docs
    cands: list = [None] * n_docs
    lengths: list[list[int]] = [[] for _ in range(n_docs)]
    jptr = [0] * n_docs
    s_pos = [0] * n_docs

    for d in range(n_docs):
        total = int(doc_offsets[d + 1] - doc_offsets[d])
        if total == 0:
            out[d] = np.empty(0, dtype=np.int64)
        elif total <= min_size:
            out[d] = np.array([total], dtype=np.int64)

    _split_batch_candidates(
        data, doc_offsets, out, cands, gear,
        lambda f: ((f & ms) == 0) | ((f & ml) == 0),
        mask_s & mask_l,
    )
    active = [d for d in range(n_docs) if out[d] is None]
    cols = np.arange(63)
    while active:
        rows = []
        for d in active:
            total = int(doc_offsets[d + 1] - doc_offsets[d])
            s = s_pos[d]
            n = min(total - s, max_size)
            if n <= min_size:
                lengths[d].append(n)
                out[d] = np.asarray(lengths[d], dtype=np.int64)
                continue
            normal_eff = normal_size if n > normal_size else n
            scan_start = s + min_size
            warm_end = min(scan_start + 63, s + n)
            rows.append((d, n, normal_eff, scan_start, warm_end - scan_start))
        if not rows:
            break
        abs_starts = np.array(
            [doc_offsets[r[0]] + r[3] for r in rows], dtype=np.int64
        )
        warm_lens = np.array([r[4] for r in rows], dtype=np.int64)
        fps = _warm_rows(data, abs_starts, warm_lens, gear)
        neff = np.array([r[2] for r in rows], dtype=np.int64)
        masks = np.where((min_size + cols)[None, :] < neff[:, None], ms, ml)
        hitm = ((fps & masks) == 0) & (cols[None, :] < warm_lens[:, None])
        has = hitm.any(axis=1)
        first = hitm.argmax(axis=1)
        for r_i, (d, n, normal_eff, scan_start, wl) in enumerate(rows):
            s = s_pos[d]
            total = int(doc_offsets[d + 1] - doc_offsets[d])
            cut = -1
            if has[r_i]:
                cut = scan_start + int(first[r_i])
            else:
                cand_pos, cand_fp = cands[d]
                j = bisect_left(cand_pos, scan_start + wl, jptr[d])
                end = s + n
                switch = s + normal_eff
                n_cand = len(cand_pos)
                while j < n_cand:
                    p = cand_pos[j]
                    if p >= end:
                        break
                    m = ims if p < switch else iml
                    if (cand_fp[j] & m) == 0:
                        cut = p
                        break
                    j += 1
                jptr[d] = j
            cut_len = (cut - s) if cut >= 0 else n
            lengths[d].append(cut_len)
            s_pos[d] = s + cut_len
            if s_pos[d] >= total:
                out[d] = np.asarray(lengths[d], dtype=np.int64)
        active = [d for d in active if out[d] is None]
    for d in range(n_docs):
        if out[d] is None:
            out[d] = np.asarray(lengths[d], dtype=np.int64)
    return out


def boundaries_jc_multi(
    data: np.ndarray,
    doc_offsets: np.ndarray,
    opts: ChunkerOpts,
    mask_c: int,
    mask_j: int,
    jump_length: int,
    spec_faithful: bool,
    gear: np.ndarray = GEAR,
) -> list[np.ndarray]:
    """JC over every document of a batch buffer; one warm-up wave per scan
    SEGMENT generation (jumps spawn segments) across all active documents."""
    lib = _native.load()
    if lib is not None:
        return _native.jc_multi(
            lib, data, doc_offsets, opts, int(mask_c), int(mask_j),
            jump_length, spec_faithful, gear,
        )
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    mj = _U64(mask_j)
    imc = int(mask_c)
    n_docs = len(doc_offsets) - 1
    out: list = [None] * n_docs
    cands: list = [None] * n_docs
    lengths: list[list[int]] = [[] for _ in range(n_docs)]
    s_pos = [0] * n_docs
    # pending[d] = (s, n, seg) — chunk context awaiting this wave's segment
    pending: dict[int, tuple[int, int, int]] = {}

    for d in range(n_docs):
        if doc_offsets[d + 1] - doc_offsets[d] == 0:
            out[d] = np.empty(0, dtype=np.int64)
    _split_batch_candidates(data, doc_offsets, out, cands, gear, None, mask_j)

    def advance_outer(d: int) -> None:
        """Open the next chunk (handling terminal guards) or finish the doc;
        mirrors boundaries_jc's outer loop head."""
        total = int(doc_offsets[d + 1] - doc_offsets[d])
        s = s_pos[d]
        if s >= total:
            out[d] = np.asarray(lengths[d], dtype=np.int64)
            return
        n = min(total - s, max_size)
        if (not spec_faithful and n <= normal_size) or n <= min_size:
            lengths[d].append(n)
            out[d] = np.asarray(lengths[d], dtype=np.int64)
            return
        pending[d] = (s, n, s + min_size)

    def complete_chunk(d: int, s: int, n: int, cut: int) -> None:
        cut_len = (cut - s) if cut >= 0 else n
        lengths[d].append(cut_len)
        s_pos[d] = s + cut_len
        if cut_len < min_size:
            out[d] = np.asarray(lengths[d], dtype=np.int64)
            return
        advance_outer(d)

    for d in range(n_docs):
        if out[d] is None:
            advance_outer(d)

    cols = np.arange(63)
    while pending:
        rows = list(pending.items())  # [(d, (s, n, seg))]
        pending = {}
        abs_starts = np.array(
            [doc_offsets[d] + seg for d, (s, n, seg) in rows], dtype=np.int64
        )
        warm_lens = np.array(
            [min(seg + 63, s + n) - seg for d, (s, n, seg) in rows], dtype=np.int64
        )
        fps = _warm_rows(data, abs_starts, warm_lens, gear)
        hitm = ((fps & mj) == 0) & (cols[None, :] < warm_lens[:, None])
        has = hitm.any(axis=1)
        first = hitm.argmax(axis=1)
        for r_i, (d, (s, n, seg)) in enumerate(rows):
            end = s + n
            if has[r_i]:
                t = int(first[r_i])
                event = seg + t
                event_fp = int(fps[r_i, t])
            else:
                cand_pos, cand_fp = cands[d]
                warm_end = min(seg + 63, end)
                j = bisect_left(cand_pos, warm_end)
                if j < len(cand_pos) and cand_pos[j] < end:
                    event = cand_pos[j]
                    event_fp = cand_fp[j]
                else:
                    event = -1
                    event_fp = 0
            if event < 0:
                complete_chunk(d, s, n, -1)
            elif (event_fp & imc) == 0:
                complete_chunk(d, s, n, event)
            else:
                seg2 = event + jump_length
                if seg2 < end:
                    pending[d] = (s, n, seg2)
                else:
                    complete_chunk(d, s, n, -1)
    for d in range(n_docs):
        if out[d] is None:
            out[d] = np.asarray(lengths[d], dtype=np.int64)
    return out


_POPCOUNT_AA = np.array([bin(b ^ 0xAA).count("1") for b in range(256)], dtype=np.int64)
_POPCOUNT_AA_U8 = _POPCOUNT_AA.astype(np.uint8)


def boundaries_ultracdc(data: np.ndarray, opts: ChunkerOpts, spec_faithful: bool) -> np.ndarray:
    """UltraCDC (ultracdc.go:101-240) over a whole document.

    dist at checked byte p is the Hamming-to-0xAA sum over data[p-8:p],
    obtained from a prefix sum; this holds across skipped (equal) windows
    because an equal window contributes an equal sum. Low-entropy forced cuts
    come from runs of lag-8 byte equality: a chain of k consecutive equal
    8-byte windows is exactly an 8k-long lag-8-equal run."""
    lib = _native.load()
    if lib is not None:
        return _native.ultracdc_doc(
            lib, data, opts, ULTRACDC_MASK_S, ULTRACDC_MASK_L, ULTRACDC_LEST,
            spec_faithful,
        )
    total = int(data.shape[0])
    if total == 0:
        return np.empty(0, dtype=np.int64)
    pos_arr, dist_arr = _ultracdc_candidates(data)
    run_starts, run_ends = _lag8_runs(data)
    return _ultracdc_resolve(
        total, opts, spec_faithful, pos_arr.tolist(), dist_arr.tolist(),
        run_starts, run_ends,
    )


def _ultracdc_candidates(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(positions, dists) of every check position whose 8-byte
    Hamming-to-0xAA sum passes the loose-mask premask.

    Sliding sums via a 3-pass doubling add (SIMD; np.cumsum is a scalar
    loop and measured ~20x slower on this host), tiled so the int16 working
    set stays cache-resident. dist(p) = sum h[p-8:p], checked at
    p in [8, total-1]. Loop bound must be `total`, not `total - 7`: check
    positions run through total-1, and a tile starting inside the final 7
    bytes still holds real positions (n_here clamps the segment)."""
    total = int(data.shape[0])
    msl = ULTRACDC_MASK_L  # subset of mask_s: superset of candidate positions
    pos_parts: list[np.ndarray] = []
    dist_parts: list[np.ndarray] = []
    for start in range(8, total, _TILE):
        hi = min(total, start + _TILE + 7)  # w8 needs 7 lookahead bytes
        hp = _POPCOUNT_AA_U8[data[start - 8 : hi]].astype(np.int16)
        w2 = hp[:-1] + hp[1:]
        w4 = w2[:-2] + w2[2:]
        w8 = w4[:-4] + w4[4:]
        # w8[i] = sum h[(start-8+i) : ...+8]; position p = start + i.
        n_here = min(_TILE, (total - 1) - start + 1)
        seg = w8[:n_here]
        rel = np.nonzero((seg & msl) == 0)[0]
        if rel.shape[0]:
            pos_parts.append(rel + start)
            dist_parts.append(seg[rel])
    if not pos_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int16)
    return np.concatenate(pos_parts).astype(np.int64), np.concatenate(dist_parts)


def boundaries_ultracdc_multi(
    data: np.ndarray, doc_offsets: np.ndarray, opts: ChunkerOpts, spec_faithful: bool
) -> list[np.ndarray]:
    """UltraCDC over every document of a batch buffer: ONE candidate scan
    and ONE lag-8 run extraction for the whole buffer, split per document.

    Validity of the split: dist(p) reads data[p-8:p] and beq(p) compares
    data[p] with data[p-8], so batch values equal per-doc values at every
    doc-relative position >= 8; the resolution only consults positions >=
    MinSize + 8 >= 72 and windows >= MinSize + 8. Candidates below
    doc-relative 8 are dropped; runs are clipped to [doc_start + 8,
    doc_end), which reproduces the per-doc run set exactly (per-doc beq is
    defined False below 8)."""
    lib = _native.load()
    if lib is not None:
        return _native.ultracdc_multi(
            lib, data, doc_offsets, opts, ULTRACDC_MASK_S, ULTRACDC_MASK_L,
            ULTRACDC_LEST, spec_faithful,
        )
    n_docs = len(doc_offsets) - 1
    pos_arr, dist_arr = _ultracdc_candidates(data)
    run_s, run_e = _lag8_runs(data)
    out: list = []
    for d in range(n_docs):
        ds, de = int(doc_offsets[d]), int(doc_offsets[d + 1])
        total = de - ds
        if total == 0:
            out.append(np.empty(0, dtype=np.int64))
            continue
        lo = int(np.searchsorted(pos_arr, ds + 8))
        hi = int(np.searchsorted(pos_arr, de))
        cp = (pos_arr[lo:hi] - ds).tolist()
        cd = dist_arr[lo:hi].tolist()
        # runs overlapping [ds + 8, de), clipped and shifted to doc-relative
        ri = bisect_right(run_e, ds + 8)
        rs_d: list[int] = []
        re_d: list[int] = []
        while ri < len(run_s) and run_s[ri] < de:
            a = max(run_s[ri], ds + 8) - ds
            b = min(run_e[ri], de) - ds
            if b > a:
                rs_d.append(a)
                re_d.append(b)
            ri += 1
        out.append(
            _ultracdc_resolve(total, opts, spec_faithful, cp, cd, rs_d, re_d)
        )
    return out


def _lag8_runs(data: np.ndarray) -> tuple[list, list]:
    total = int(data.shape[0])
    if total <= 8:
        return [], []
    beq = np.zeros(total, dtype=bool)
    beq[8:] = data[8:] == data[:-8]
    d = np.diff(beq.astype(np.int8))
    run_starts = (np.nonzero(d == 1)[0] + 1).tolist()
    run_ends = (np.nonzero(d == -1)[0] + 1).tolist()
    if beq[0]:
        run_starts = [0] + run_starts
    if beq[-1]:
        run_ends = run_ends + [total]
    return run_starts, run_ends


def _ultracdc_resolve(
    total: int,
    opts: ChunkerOpts,
    spec_faithful: bool,
    cand_pos: list,
    cand_dist: list,
    run_starts: list,
    run_ends: list,
) -> np.ndarray:
    """Chunk-lengths resolution given one document's candidate (position,
    dist) lists and lag-8 equality runs (all doc-relative); shared by the
    per-doc and batched entry points."""
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size

    def window_equal(i: int) -> bool:
        ri = bisect_right(run_starts, i) - 1
        return ri >= 0 and run_ends[ri] >= i + 8

    # Only runs that can hold a full LEST chain of aligned windows can ever
    # force a cut (chain needs >= 512 bytes inside the run).
    chain_span = ULTRACDC_LEST * 8
    long_runs = [
        (a, b) for a, b in zip(run_starts, run_ends) if b - a >= chain_span
    ]
    long_ends = [b for _, b in long_runs]

    lengths: list[int] = []
    s = 0
    n_cand = len(cand_pos)
    n_runs = len(long_runs)
    while s < total:
        n = min(total - s, max_size)
        if n <= min_size or n < min_size + 8:
            lengths.append(n)
            break
        normal_eff = normal_size if n > normal_size else n
        grid0 = s + min_size + 8
        last_win = s + n - 8  # largest window start (loop: i <= n-8)

        # Earliest forced low-entropy cut: first grid window chain of LEST
        # consecutive equal windows. A chain lives inside one beq run [a, b):
        # window i equal iff a <= i and i + 8 <= b.
        forced_win = -1
        if n_runs:
            ri = bisect_right(long_ends, grid0)
            while ri < n_runs:
                a, b = long_runs[ri]
                if a > last_win:
                    break
                # First grid-aligned window fully inside [a, b) and >= grid0;
                # the chain of equal windows runs from there.
                base = max(grid0, a)
                off = (base - grid0) % 8
                if off:
                    base += 8 - off
                fw = base + (ULTRACDC_LEST - 1) * 8
                if fw + 8 <= b and fw <= last_win:
                    forced_win = fw
                    break
                ri += 1

        # Earliest valid candidate cut.
        cut = -1
        j = bisect_left(cand_pos, grid0)
        while j < n_cand:
            p = cand_pos[j]
            if p > s + n - 1:
                break
            win = grid0 + ((p - grid0) // 8) * 8
            if win > last_win:
                break
            if forced_win >= 0 and win > forced_win:
                break  # forced cut happens first
            if window_equal(win):
                j += 1
                continue  # checks skipped inside an equal window
            mask = ULTRACDC_MASK_S if (win - s) < normal_eff else ULTRACDC_MASK_L
            if (cand_dist[j] & mask) == 0:
                cut = (win + 8) if spec_faithful else p
                break
            j += 1

        # The candidate walk stops before any window past forced_win, so a
        # found cut always happens in an earlier window than the forced cut.
        if cut >= 0:
            cut_len = cut - s
        elif forced_win >= 0:
            cut_len = forced_win + 8 - s
        else:
            cut_len = n
        lengths.append(cut_len)
        s += cut_len
        if cut_len < min_size:
            break
    return np.asarray(lengths, dtype=np.int64)


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values."""
    out = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (_U64(1) << _U64(s))
        out[big] += s
        v = np.where(big, v >> _U64(s), v)
    out[x != 0] += 1
    return out


def boundaries_stadia(data: np.ndarray, opts: ChunkerOpts) -> np.ndarray:
    """FastCDC4Stadia (fastcdc4stadia.go:77-149) over a whole document.

    With MinSize >= 64 the all-ones seed is annihilated by the time checks
    begin, so the hash at every check position i is exactly the window-64 gear
    hash of the 64 bytes ending at i-1. The regression path (no
    threshold match before MaxSize) reduces to: the last check position whose
    hash bit-length equals the running minimum; the final hash competes too.
    """
    lib = _native.load()
    if lib is not None:
        return _native.stadia_doc(lib, data, opts, GEAR64_STADIA)
    total = int(data.shape[0])
    min_size, max_size, normal_size = opts.min_size, opts.max_size, opts.normal_size
    if total == 0:
        return np.empty(0, dtype=np.int64)

    thresh = _U64(0xFFFFFFFFFFFFFFFF) // _U64(normal_size - min_size + 1)
    # hash F[p] is checked at i = p+1
    cand_pos, _ = _gear_candidates(data, GEAR64_STADIA, lambda f: f <= thresh)
    return _stadia_resolve(data, opts, cand_pos)


def _stadia_resolve(
    data: np.ndarray, opts: ChunkerOpts, cand_pos: list
) -> np.ndarray:
    """Chunk-lengths resolution for one document given its below-threshold
    candidate positions (doc-relative); shared by the per-doc and batched
    entry points."""
    total = int(data.shape[0])
    min_size, max_size = opts.min_size, opts.max_size
    n_cand = len(cand_pos)

    lengths: list[int] = []
    s = 0
    j = 0
    while s < total:
        n = min(total - s, max_size)
        if n <= min_size:
            lengths.append(n)
            break
        # First i in [min, n) with F[s+i-1] <= thresh. (Any below-threshold
        # hash always passes the regression gate; see module docstring.)
        j = bisect_left(cand_pos, s + min_size - 1, j)
        cut = -1
        if j < n_cand:
            p = cand_pos[j]
            if p < s + n - 1:
                cut = p + 1 - s
        if cut < 0:
            # Regression: hashes at checks i = min..n-1 are F[s+min-1 : s+n-1];
            # the final hash (after the last add) is F[s+n-1].
            window = _gear_f_range(data, GEAR64_STADIA, s + min_size - 1, s + n)
            bl = _bitlen_u64(window)
            checks = bl[:-1]
            final_bl = int(bl[-1])
            run_min = np.minimum.accumulate(checks)
            mn = int(run_min[-1])
            if final_bl <= mn:
                cut = n
            else:
                last = int(np.nonzero(checks == mn)[0][-1])
                # regressionLen updates only when bl <= running min at that
                # point, which for the last occurrence of the global min is
                # always true.
                cut = min_size + last
        lengths.append(cut)
        s += cut
        if cut < min_size:
            break
    return np.asarray(lengths, dtype=np.int64)


def boundaries_stadia_multi(
    data: np.ndarray, doc_offsets: np.ndarray, opts: ChunkerOpts
) -> list[np.ndarray]:
    """FastCDC4Stadia over every document of a batch buffer: ONE dense
    threshold scan for the whole batch (consultations start at doc-relative
    MinSize - 1 >= 63, past the cross-doc contamination zone), then the
    shared per-doc resolution. The regression fallback (no candidate before
    MaxSize) still reads its window from the doc slice, so it never sees a
    neighboring document."""
    lib = _native.load()
    if lib is not None:
        return _native.stadia_multi(lib, data, doc_offsets, opts, GEAR64_STADIA)
    min_size, max_size = opts.min_size, opts.max_size
    thresh = _U64(0xFFFFFFFFFFFFFFFF) // _U64(opts.normal_size - opts.min_size + 1)
    n_docs = len(doc_offsets) - 1
    out: list = [None] * n_docs
    cands: list = [None] * n_docs
    for d in range(n_docs):
        if doc_offsets[d + 1] - doc_offsets[d] == 0:
            out[d] = np.empty(0, dtype=np.int64)
    _split_batch_candidates(
        data, doc_offsets, out, cands, GEAR64_STADIA,
        lambda f: f <= thresh, None,
    )

    lengths: list[list[int]] = [[] for _ in range(n_docs)]
    s_pos = [0] * n_docs
    jptr = [0] * n_docs

    def advance(d: int):
        """Resolve chunks via the candidate list (pure Python) until one
        needs the regression fallback — return its (s, n) — or the doc
        finishes (set out[d], return None)."""
        total = int(doc_offsets[d + 1] - doc_offsets[d])
        cand_pos = cands[d][0]
        n_cand = len(cand_pos)
        while True:
            s = s_pos[d]
            if s >= total:
                out[d] = np.asarray(lengths[d], dtype=np.int64)
                return None
            n = min(total - s, max_size)
            if n <= min_size:
                lengths[d].append(n)
                out[d] = np.asarray(lengths[d], dtype=np.int64)
                return None
            j = bisect_left(cand_pos, s + min_size - 1, jptr[d])
            jptr[d] = j
            cut = -1
            if j < n_cand:
                p = cand_pos[j]
                if p < s + n - 1:
                    cut = p + 1 - s
            if cut < 0:
                return (s, n)
            lengths[d].append(cut)
            s_pos[d] = s + cut

    pending: dict[int, tuple[int, int]] = {}
    for d in range(n_docs):
        if out[d] is None:
            r = advance(d)
            if r is not None:
                pending[d] = r

    while pending:
        rows = list(pending.items())  # [(d, (s, n))]
        pending = {}
        # Batched regression: window hashes for checks i = min..n-1 are
        # F[s+min-1 : s+n-1] plus the final hash F[s+n-1]; rows gather 63
        # bytes of left context (a - 63 >= s >= doc start, never crossing a
        # doc boundary) and one axis-1 doubling yields every row's exact
        # window hashes — one wave replaces per-chunk _gear_f_range +
        # _bitlen_u64 calls.
        Ls = np.array([n - min_size + 1 for d, (s, n) in rows], dtype=np.int64)
        Lmax = int(Ls.max())
        W = 63 + Lmax
        starts = np.array(
            [doc_offsets[d] + s + min_size - 1 - 63 for d, (s, n) in rows],
            dtype=np.int64,
        )
        cols = np.arange(W)
        idx = starts[:, None] + cols[None, :]
        np.clip(idx, 0, max(data.shape[0] - 1, 0), out=idx)
        h = GEAR64_STADIA[data[idx]]
        for k in range(6):
            step = 1 << k
            h[:, step:] += h[:, :-step] << _U64(step)
        R = len(rows)
        final_v = h[np.arange(R), 63 + Ls - 1].copy()
        # bitlen is monotone in the value, so the running/global min of the
        # check BIT LENGTHS is the bitlen of the min check VALUE, and "last
        # position at the min bitlen" is "last value below 2^mn" — three
        # matrix passes instead of a 19-pass elementwise bitlen.
        h[cols[None, :] >= (62 + Ls)[:, None]] = _MASK64  # mask final + padding
        vals = h[:, 63 : 63 + Lmax]
        vmin = vals.min(axis=1)
        thr1 = np.array(
            [(1 << int(v).bit_length()) - 1 for v in vmin], dtype=np.uint64
        )
        below = vals <= thr1[:, None]
        last = Lmax - 1 - np.argmax(below[:, ::-1], axis=1)
        final_le = final_v <= thr1
        for r_i, (d, (s, n)) in enumerate(rows):
            cut = n if bool(final_le[r_i]) else min_size + int(last[r_i])
            lengths[d].append(cut)
            s_pos[d] = s + cut
            r = advance(d)
            if r is not None:
                pending[d] = r

    for d in range(n_docs):
        if out[d] is None:
            out[d] = np.asarray(lengths[d], dtype=np.int64)
    return out
