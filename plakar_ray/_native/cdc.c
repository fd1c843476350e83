/* Native CDC boundary kernels — sequential C implementations of the cut
 * functions specified by plakar_ray/oracle.py (the repo's cited scalar
 * re-derivation of the reference algorithms: fastcdc.go:225-253,
 * jc.go:205-244, ultracdc.go:101-240, fastcdc4stadia.go:77-149).
 *
 * Written from that spec, NOT translated from the Go source. Each function
 * mirrors the oracle statement-for-statement so the existing
 * kernel-vs-oracle differential + golden test suites gate it directly.
 * uint64_t arithmetic wraps mod 2^64 exactly like the oracle's explicit
 * `& MASK64`.
 *
 * Single-threaded on purpose: parallelism comes from Ray workers (one
 * process per core), so the per-call working set stays cache-resident and
 * there is no threading state to share.
 *
 * Built at first use by plakar_ray/_native/__init__.py via gcc into a
 * plain shared library (ctypes, no CPython ABI dependency); every entry
 * point has a vectorized-numpy fallback in plakar_ray/kernels.py.
 */

#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------ fastcdc -- */

/* Unrolled gear scan over [i, end): returns the first index whose
 * post-absorb fingerprint passes ((fp & mask) == 0), or -1 when none does.
 * *fp_io carries the rolling fingerprint in and out (on a hit it holds the
 * fingerprint after absorbing data[hit]; on a miss, after absorbing
 * data[end-1]).
 *
 * The scalar loop's carried dependency is fp' = (fp << 1) + gear[b] — a
 * 1-cycle lea per byte that, with the per-byte load/test traffic, bounds
 * the scan near 2 cycles/byte. Unrolling 8-wide with the identity
 *     fp_{i+j} = (fp_i << j) + s_j,   s_j = (s_{j-1} << 1) + gear[b_{i+j}]
 * moves the carried chain to ONE shift+add per 8 bytes: the s-chain
 * depends only on the data (consecutive blocks' chains overlap in the
 * out-of-order window) and the eight mask tests fold into a single
 * predictable branch. Boundaries (first hit wins, exact fp state at the
 * phase edge) are bit-identical to the scalar loop — gated by the golden
 * and native-vs-numpy differential suites. */
static inline int64_t scan_gear8(const uint8_t *data, int64_t i, int64_t end,
                                 uint64_t mask, const uint64_t *gear,
                                 uint64_t *fp_io) {
    uint64_t fp = *fp_io;
    for (; i + 8 <= end; i += 8) {
        uint64_t g0 = gear[data[i]], g1 = gear[data[i + 1]],
                 g2 = gear[data[i + 2]], g3 = gear[data[i + 3]],
                 g4 = gear[data[i + 4]], g5 = gear[data[i + 5]],
                 g6 = gear[data[i + 6]], g7 = gear[data[i + 7]];
        uint64_t s0 = g0;
        uint64_t s1 = (s0 << 1) + g1;
        uint64_t s2 = (s1 << 1) + g2;
        uint64_t s3 = (s2 << 1) + g3;
        uint64_t s4 = (s3 << 1) + g4;
        uint64_t s5 = (s4 << 1) + g5;
        uint64_t s6 = (s5 << 1) + g6;
        uint64_t s7 = (s6 << 1) + g7;
        uint64_t f0 = (fp << 1) + s0;
        uint64_t f1 = (fp << 2) + s1;
        uint64_t f2 = (fp << 3) + s2;
        uint64_t f3 = (fp << 4) + s3;
        uint64_t f4 = (fp << 5) + s4;
        uint64_t f5 = (fp << 6) + s5;
        uint64_t f6 = (fp << 7) + s6;
        uint64_t f7 = (fp << 8) + s7;
        int hit = ((f0 & mask) == 0) | ((f1 & mask) == 0) |
                  ((f2 & mask) == 0) | ((f3 & mask) == 0) |
                  ((f4 & mask) == 0) | ((f5 & mask) == 0) |
                  ((f6 & mask) == 0) | ((f7 & mask) == 0);
        if (__builtin_expect(hit, 0)) {
            if ((f0 & mask) == 0) { *fp_io = f0; return i; }
            if ((f1 & mask) == 0) { *fp_io = f1; return i + 1; }
            if ((f2 & mask) == 0) { *fp_io = f2; return i + 2; }
            if ((f3 & mask) == 0) { *fp_io = f3; return i + 3; }
            if ((f4 & mask) == 0) { *fp_io = f4; return i + 4; }
            if ((f5 & mask) == 0) { *fp_io = f5; return i + 5; }
            if ((f6 & mask) == 0) { *fp_io = f6; return i + 6; }
            *fp_io = f7;
            return i + 7;
        }
        fp = f7;
    }
    for (; i < end; i++) {
        fp = (fp << 1) + gear[data[i]];
        if ((fp & mask) == 0) {
            *fp_io = fp;
            return i;
        }
    }
    *fp_io = fp;
    return -1;
}

static inline int64_t cut_fastcdc(const uint8_t *data, int64_t n,
                                  int64_t min_size, int64_t max_size,
                                  int64_t normal_size, uint64_t mask_s,
                                  uint64_t mask_l, const uint64_t *gear) {
    if (n <= min_size)
        return n;
    if (n >= max_size)
        n = max_size;
    else if (n <= normal_size)
        normal_size = n;
    /* The oracle switches mask when i == normal_size, checked before each
     * byte; normal_size <= n after clamping, so the scan splits into a
     * mask_s phase [min_size, normal_size) and a mask_l phase
     * [normal_size, n) with no per-byte branch. If min_size > normal_size
     * the equality never fires and mask_s runs to the end — phase 2's
     * lower bound max(normal_size, min_size) preserves that. */
    uint64_t fp = 0;
    int64_t i = min_size;
    int64_t ph1 = normal_size > i ? normal_size : i;
    if (ph1 > n)
        ph1 = n;
    int64_t hit = scan_gear8(data, i, ph1, mask_s, gear, &fp);
    if (hit >= 0)
        return hit;
    i = ph1;
    if (min_size > normal_size) {
        hit = scan_gear8(data, i, n, mask_s, gear, &fp);
        return hit >= 0 ? hit : n;
    }
    hit = scan_gear8(data, i, n, mask_l, gear, &fp);
    return hit >= 0 ? hit : n;
}

int64_t fastcdc_doc(const uint8_t *data, int64_t total, int64_t min_size,
                    int64_t max_size, int64_t normal_size, uint64_t mask_s,
                    uint64_t mask_l, const uint64_t *gear, int64_t *out) {
    int64_t m = 0, pos = 0;
    while (pos < total) {
        int64_t n = total - pos;
        if (n > max_size)
            n = max_size;
        int64_t cut = cut_fastcdc(data + pos, n, min_size, max_size,
                                  normal_size, mask_s, mask_l, gear);
        if (cut <= 0)
            break;
        out[m++] = cut;
        pos += cut;
        if (cut < min_size)
            break;
    }
    return m;
}

int64_t fastcdc_multi(const uint8_t *data, const int64_t *offsets,
                      int64_t n_docs, int64_t min_size, int64_t max_size,
                      int64_t normal_size, uint64_t mask_s, uint64_t mask_l,
                      const uint64_t *gear, int64_t *out_lengths,
                      int64_t *out_counts) {
    int64_t m = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t c = fastcdc_doc(data + offsets[d], offsets[d + 1] - offsets[d],
                                min_size, max_size, normal_size, mask_s,
                                mask_l, gear, out_lengths + m);
        out_counts[d] = c;
        m += c;
    }
    return m;
}

/* ----------------------------------------------------------------- jc -- */

static inline int64_t cut_jc(const uint8_t *data, int64_t n, int64_t min_size,
                             int64_t max_size, int64_t normal_size,
                             uint64_t mask_c, uint64_t mask_j,
                             int64_t jump_length, int spec_faithful,
                             const uint64_t *gear) {
    if (spec_faithful) {
        if (n >= max_size)
            n = max_size;
    } else if (n <= normal_size) {
        return n;
    } else if (n >= max_size) {
        n = max_size;
    }
    uint64_t fp = 0;
    int64_t i = min_size;
    while (i < n) {
        fp = (fp << 1) + gear[data[i]];
        if ((fp & mask_j) == 0) {
            if ((fp & mask_c) == 0)
                return i;
            fp = 0;
            i += jump_length;
        } else {
            i++;
        }
    }
    return i < n ? i : n;
}

int64_t jc_doc(const uint8_t *data, int64_t total, int64_t min_size,
               int64_t max_size, int64_t normal_size, uint64_t mask_c,
               uint64_t mask_j, int64_t jump_length, int spec_faithful,
               const uint64_t *gear, int64_t *out) {
    int64_t m = 0, pos = 0;
    while (pos < total) {
        int64_t n = total - pos;
        if (n > max_size)
            n = max_size;
        int64_t cut = cut_jc(data + pos, n, min_size, max_size, normal_size,
                             mask_c, mask_j, jump_length, spec_faithful, gear);
        if (cut <= 0)
            break;
        out[m++] = cut;
        pos += cut;
        if (cut < min_size)
            break;
    }
    return m;
}

int64_t jc_multi(const uint8_t *data, const int64_t *offsets, int64_t n_docs,
                 int64_t min_size, int64_t max_size, int64_t normal_size,
                 uint64_t mask_c, uint64_t mask_j, int64_t jump_length,
                 int spec_faithful, const uint64_t *gear, int64_t *out_lengths,
                 int64_t *out_counts) {
    int64_t m = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t c = jc_doc(data + offsets[d], offsets[d + 1] - offsets[d],
                           min_size, max_size, normal_size, mask_c, mask_j,
                           jump_length, spec_faithful, gear, out_lengths + m);
        out_counts[d] = c;
        m += c;
    }
    return m;
}

/* ----------------------------------------------------------- ultracdc -- */

/* popcount(b ^ 0xAA) per byte value; idempotent lazy init (all racers
 * write identical values). */
static uint8_t pc_aa[256];
static int pc_aa_init = 0;

static inline void ensure_pc_aa(void) {
    if (!pc_aa_init) {
        for (int b = 0; b < 256; b++)
            pc_aa[b] = (uint8_t)__builtin_popcount((unsigned)(b ^ 0xAA));
        pc_aa_init = 1;
    }
}

static inline int64_t cut_ultracdc(const uint8_t *data, int64_t n,
                                   int64_t min_size, int64_t max_size,
                                   int64_t normal_size, uint64_t mask_s,
                                   uint64_t mask_l, int64_t lest,
                                   int spec_faithful) {
    if (n <= min_size)
        return n;
    if (n >= max_size)
        n = max_size;
    else if (n <= normal_size)
        normal_size = n;
    if (n < min_size + 8)
        return n;

    const uint8_t *out_win = data + min_size;
    int64_t dist = 0;
    for (int j = 0; j < 8; j++)
        dist += pc_aa[out_win[j]];

    uint64_t mask = mask_s;
    int64_t low_entropy_count = 0;
    int64_t i = min_size + 8;
    while (i <= n - 8) {
        if (i >= normal_size)
            mask = mask_l;
        const uint8_t *in_win = data + i;
        if (memcmp(in_win, out_win, 8) == 0) {
            low_entropy_count++;
            if (low_entropy_count >= lest)
                return i + 8;
            i += 8;
            continue;
        }
        low_entropy_count = 0;
        for (int j = 0; j < 8; j++) {
            if (((uint64_t)dist & mask) == 0)
                return spec_faithful ? i + 8 : i + j;
            dist += (int64_t)pc_aa[data[i + j]] - (int64_t)pc_aa[data[i + j - 8]];
        }
        out_win = in_win;
        i += 8;
    }
    return n;
}

int64_t ultracdc_doc(const uint8_t *data, int64_t total, int64_t min_size,
                     int64_t max_size, int64_t normal_size, uint64_t mask_s,
                     uint64_t mask_l, int64_t lest, int spec_faithful,
                     int64_t *out) {
    ensure_pc_aa();
    int64_t m = 0, pos = 0;
    while (pos < total) {
        int64_t n = total - pos;
        if (n > max_size)
            n = max_size;
        int64_t cut = cut_ultracdc(data + pos, n, min_size, max_size,
                                   normal_size, mask_s, mask_l, lest,
                                   spec_faithful);
        if (cut <= 0)
            break;
        out[m++] = cut;
        pos += cut;
        if (cut < min_size)
            break;
    }
    return m;
}

int64_t ultracdc_multi(const uint8_t *data, const int64_t *offsets,
                       int64_t n_docs, int64_t min_size, int64_t max_size,
                       int64_t normal_size, uint64_t mask_s, uint64_t mask_l,
                       int64_t lest, int spec_faithful, int64_t *out_lengths,
                       int64_t *out_counts) {
    ensure_pc_aa();
    int64_t m = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t c = ultracdc_doc(data + offsets[d], offsets[d + 1] - offsets[d],
                                 min_size, max_size, normal_size, mask_s,
                                 mask_l, lest, spec_faithful, out_lengths + m);
        out_counts[d] = c;
        m += c;
    }
    return m;
}

/* ----------------------------------------------------- fastcdc4stadia -- */

static inline int64_t cut_stadia(const uint8_t *data, int64_t n,
                                 int64_t min_size, int64_t max_size,
                                 int64_t normal_size, const uint64_t *gear) {
    uint64_t thresh =
        0xFFFFFFFFFFFFFFFFULL / (uint64_t)(normal_size - min_size + 1);
    if (n <= min_size)
        return n;
    if (n >= max_size)
        n = max_size;

    int64_t regression_len = n;
    uint64_t regression_mask = 0; /* 0 => matches anything */
    uint64_t fp = 0xFFFFFFFFFFFFFFFFULL;
    const int64_t k_hash_bits = 64;
    int64_t i = min_size > k_hash_bits ? min_size - k_hash_bits : 0;
    for (; i < min_size; i++)
        fp = (fp << 1) + gear[data[i]];
    for (; i < n; i++) {
        if ((fp & regression_mask) == 0) {
            if (fp <= thresh)
                return i;
            regression_len = i;
            regression_mask = 0xFFFFFFFFFFFFFFFFULL;
            while ((fp & regression_mask) != 0)
                regression_mask <<= 1;
        }
        fp = (fp << 1) + gear[data[i]];
    }
    if ((fp & regression_mask) != 0)
        return regression_len;
    return i;
}

int64_t stadia_doc(const uint8_t *data, int64_t total, int64_t min_size,
                   int64_t max_size, int64_t normal_size,
                   const uint64_t *gear, int64_t *out) {
    int64_t m = 0, pos = 0;
    while (pos < total) {
        int64_t n = total - pos;
        if (n > max_size)
            n = max_size;
        int64_t cut =
            cut_stadia(data + pos, n, min_size, max_size, normal_size, gear);
        if (cut <= 0)
            break;
        out[m++] = cut;
        pos += cut;
        if (cut < min_size)
            break;
    }
    return m;
}

int64_t stadia_multi(const uint8_t *data, const int64_t *offsets,
                     int64_t n_docs, int64_t min_size, int64_t max_size,
                     int64_t normal_size, const uint64_t *gear,
                     int64_t *out_lengths, int64_t *out_counts) {
    int64_t m = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t c = stadia_doc(data + offsets[d], offsets[d + 1] - offsets[d],
                               min_size, max_size, normal_size, gear,
                               out_lengths + m);
        out_counts[d] = c;
        m += c;
    }
    return m;
}

/* -------------------------------------------------- segment hashing ----- */

/* FNV-1a 64 of each contiguous segment of `data` (segments tile the byte
 * stream: sum(lengths) == total data bytes). Used for CDC chunk shingles in
 * the near-dup signature path, where a strong 64-bit hash suffices —
 * identical values to functions/strhash.py:fnv1a64_slices, which is the
 * vectorized-numpy fallback. */
int64_t fnv1a64_segments(const uint8_t *data, const int64_t *lengths,
                         int64_t n_segments, uint64_t *out) {
    const uint64_t FNV_OFF = 0xcbf29ce484222325ULL;
    const uint64_t FNV_PRIME = 0x100000001b3ULL;
    const uint8_t *p = data;
    for (int64_t i = 0; i < n_segments; i++) {
        uint64_t h = FNV_OFF;
        const int64_t len = lengths[i];
        for (int64_t j = 0; j < len; j++)
            h = (h ^ (uint64_t)p[j]) * FNV_PRIME;
        out[i] = h;
        p += len;
    }
    return n_segments;
}

/* Word-wise FNV-1a variant ("wfnv"): one xor-multiply per 8-byte
 * little-endian word instead of per byte (8x fewer multiplies on the
 * latency chain -> memory-bound ~6 GB/s vs ~0.6 GB/s for byte FNV).
 * The final (h ^ len) * PRIME mix disambiguates zero-padded tails from
 * genuinely shorter segments. Not standard FNV-1a — a repo-defined 64-bit
 * shingle family; functions/strhash.py:wfnv64_segments_np is the
 * bit-identical vectorized-numpy fallback. */
int64_t wfnv64_segments(const uint8_t *data, const int64_t *lengths,
                        int64_t n_segments, uint64_t *out) {
    const uint64_t FNV_OFF = 0xcbf29ce484222325ULL;
    const uint64_t FNV_PRIME = 0x100000001b3ULL;
    const uint8_t *p = data;
    for (int64_t i = 0; i < n_segments; i++) {
        uint64_t h = FNV_OFF;
        const int64_t len = lengths[i];
        const int64_t nw = len >> 3;
        for (int64_t j = 0; j < nw; j++) {
            uint64_t w;
            memcpy(&w, p + (j << 3), 8);
            h = (h ^ w) * FNV_PRIME;
        }
        const int64_t rem = len & 7;
        if (rem) {
            uint64_t w = 0;
            memcpy(&w, p + (nw << 3), (size_t)rem);
            h = (h ^ w) * FNV_PRIME;
        }
        h = (h ^ (uint64_t)len) * FNV_PRIME;
        out[i] = h;
        p += len;
    }
    return n_segments;
}

/* -------------------------------------------------- minhash minima ------ */

/* Per-document MinHash signature minima over pre-hashed shingles.
 * Shingles are doc-ordered and contiguous: document d owns
 * shingles[offsets[d] .. offsets[d+1]).  For permutation p,
 * out[d*n_perm + p] = min over the doc's shingles s of
 * splitmix64(a[p]*s + b[p]) — bit-identical (mod-2^64 wraparound) to
 * stages/minhash.py:_splitmix64 over numpy uint64.  Documents with no
 * shingles keep UINT64_MAX sentinels.  The permutation loop is the
 * vectorizable inner loop; the accumulator row (n_perm * 8 B) stays in
 * L1 across a document's shingles. */
int64_t minhash_minima(const uint64_t *shingles, const int64_t *offsets,
                       int64_t n_docs, const uint64_t *a, const uint64_t *b,
                       int64_t n_perm, uint64_t *out) {
    for (int64_t d = 0; d < n_docs; d++) {
        uint64_t *acc = out + d * n_perm;
        for (int64_t p = 0; p < n_perm; p++)
            acc[p] = UINT64_MAX;
        for (int64_t i = offsets[d]; i < offsets[d + 1]; i++) {
            const uint64_t s = shingles[i];
            for (int64_t p = 0; p < n_perm; p++) {
                uint64_t z = a[p] * s + b[p] + 0x9E3779B97F4A7C15ULL;
                z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
                z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
                z ^= z >> 31;
                if (z < acc[p])
                    acc[p] = z;
            }
        }
    }
    return n_docs;
}

/* -------------------------------------------------- winnow select ------- */

/* Winnowing selection (Schleimer et al. 2003): leftmost argmin of every
 * length-w sliding window of h[0..v), deduplicated.  Monotonic min-deque;
 * popping the back only on STRICT > keeps the oldest entry among equal
 * values, so the front is the LEFTMOST minimum — identical tie-breaking
 * to np.argmin and to _window_argmin_select in pipelines/dedup.py.  The
 * leftmost-argmin sequence is non-decreasing as the window slides (any
 * j < argmin_k still inside window k+1 has h[j] > h[argmin_k]), so
 * dedup is a compare against the last emitted index.  `out` needs
 * capacity v; `scratch` needs capacity v (deque ring).  Returns the
 * number of selected indices (sorted ascending). */
int64_t winnow_select(const uint64_t *h, int64_t v, int64_t w,
                      int64_t *out, int64_t *scratch) {
    if (v <= 0)
        return 0;
    if (v <= w) {
        int64_t best = 0;
        for (int64_t i = 1; i < v; i++)
            if (h[i] < h[best])
                best = i;
        out[0] = best;
        return 1;
    }
    int64_t *dq = scratch;
    int64_t head = 0, tail = 0, n_out = 0, last = -1;
    for (int64_t i = 0; i < v; i++) {
        while (tail > head && h[dq[tail - 1]] > h[i])
            tail--;
        dq[tail++] = i;
        int64_t k = i - w + 1;
        if (k >= 0) {
            while (dq[head] < k)
                head++;
            if (dq[head] != last) {
                out[n_out++] = dq[head];
                last = dq[head];
            }
        }
    }
    return n_out;
}

/* --------------------------------------- fused gram hash + winnow ------- */

/* Fused rolling polynomial gram hash + winnowing selection over the doc
 * segments of one Arrow batch (pipelines/dedup.py winnow scale path).
 *
 * data + offsets[d] .. offsets[d+1] is document d's byte run (offsets are
 * absolute into `data`, exactly Arrow's value_offsets).  For each doc with
 * len >= L there are v = len-L+1 windows; window p's hash is
 * H[p] = sum_{j<L} d[p+j] * mul^(L-1-j) (mod 2^64), identical to
 * gram_window_hashes in pipelines/dedup.py, computed by Horner +
 * rolling update (no h_all array ever materializes).  When w > 1 the
 * winnow selection (leftmost argmin of every w-window, deduped — same
 * monotonic deque + tie-breaking as winnow_select above) runs inline on a
 * (w+1)-slot hash ring; when w <= 1 every window is emitted.
 *
 * Emits (hash, doc_index, doc-local pos) triples.  Returns rows written,
 * or -1 the moment `cap` would be exceeded (caller re-calls with the
 * exact stride-1 bound).  dq/ring need capacity w+1 (w >= 2) each. */
int64_t gram_winnow_multi(const uint8_t *data, const int64_t *offsets,
                          int64_t n_docs, int64_t L, int64_t w, uint64_t mul,
                          int64_t cap, uint64_t *out_hash, int32_t *out_doc,
                          int64_t *out_pos, int64_t *dq, uint64_t *ring) {
    uint64_t mulp = 1; /* mul^(L-1) mod 2^64 */
    for (int64_t j = 0; j + 1 < L; j++)
        mulp *= mul;
    int64_t n_out = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        const uint8_t *p = data + offsets[d];
        int64_t len = offsets[d + 1] - offsets[d];
        if (len < L)
            continue;
        int64_t v = len - L + 1;
        uint64_t h = 0;
        for (int64_t j = 0; j < L; j++)
            h = h * mul + (uint64_t)p[j];
        if (w <= 1) { /* stride-1: emit every window */
            if (n_out + v > cap)
                return -1;
            for (int64_t i = 0; i < v; i++) {
                if (i > 0)
                    h = (h - (uint64_t)p[i - 1] * mulp) * mul + (uint64_t)p[i + L - 1];
                out_hash[n_out] = h;
                out_doc[n_out] = (int32_t)d;
                out_pos[n_out] = i;
                n_out++;
            }
            continue;
        }
        if (v <= w) { /* one window of the whole segment: plain argmin */
            uint64_t best = h;
            int64_t besti = 0;
            for (int64_t i = 1; i < v; i++) {
                h = (h - (uint64_t)p[i - 1] * mulp) * mul + (uint64_t)p[i + L - 1];
                if (h < best) {
                    best = h;
                    besti = i;
                }
            }
            if (n_out + 1 > cap)
                return -1;
            out_hash[n_out] = best;
            out_doc[n_out] = (int32_t)d;
            out_pos[n_out] = besti;
            n_out++;
            continue;
        }
        /* Classic winnowing scan (Schleimer Fig. 6 shape, leftmost-min
         * tie-breaking): track the current window's leftmost argmin; when
         * it slides out, rescan the (mask-indexed pow2) ring of the last
         * w hashes left-to-right. One predictable compare per window,
         * O(w) rescans amortized over >= the argmin's lifetime — measured
         * ~2.5x the monotonic deque (whose dependent ring loads stall).
         * dq is unused on this path (kept for ABI stability). */
        int64_t mask = 1;
        while (mask < w)
            mask <<= 1;
        mask -= 1;
        (void)dq;
        int64_t sel = 0, last = -1;
        uint64_t selv = h;
        ring[0] = h;
        for (int64_t i = 0; i < v; i++) {
            if (i > 0) {
                h = (h - (uint64_t)p[i - 1] * mulp) * mul + (uint64_t)p[i + L - 1];
                ring[i & mask] = h;
                if (h < selv) { /* strict: equal keeps the older (leftmost) */
                    sel = i;
                    selv = h;
                } else if (sel <= i - w) {
                    /* argmin slid out: leftmost min of [i-w+1, i] */
                    sel = i - w + 1;
                    selv = ring[sel & mask];
                    for (int64_t j = sel + 1; j <= i; j++) {
                        uint64_t x = ring[j & mask];
                        if (x < selv) {
                            sel = j;
                            selv = x;
                        }
                    }
                }
            }
            if (i >= w - 1 && sel != last) {
                if (n_out + 1 > cap)
                    return -1;
                out_hash[n_out] = selv;
                out_doc[n_out] = (int32_t)d;
                out_pos[n_out] = sel;
                n_out++;
                last = sel;
            }
        }
    }
    return n_out;
}
