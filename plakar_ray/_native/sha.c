/* Per-segment sha256 via OpenSSL EVP (the same libcrypto CPython's
 * hashlib binds): one digest per contiguous segment of `data`, segments
 * tiling the byte stream exactly (sum(lengths) == total bytes), 32-byte
 * digests packed row-major into out32.
 *
 * Built as a SEPARATE shared library from cdc.c so a node without
 * libcrypto headers/libs loses only this accelerator — the boundary and
 * shingle kernels build without -lcrypto. The hash family is unchanged
 * (reference parity: cmd/cdc/stats.go digests each chunk with sha256);
 * this only removes the per-chunk Python call/alloc overhead of
 * hashlib in a loop.
 */

#include <stdint.h>

#include <openssl/evp.h>

int64_t sha256_segments_full(const uint8_t *data, const int64_t *lengths,
                             int64_t n_segments, uint8_t *out32) {
    const EVP_MD *md = EVP_sha256();
    EVP_MD_CTX *ctx = EVP_MD_CTX_new();
    if (ctx == NULL)
        return -1;
    const uint8_t *p = data;
    for (int64_t i = 0; i < n_segments; i++) {
        unsigned int len = 0;
        if (!EVP_DigestInit_ex(ctx, md, NULL) ||
            !EVP_DigestUpdate(ctx, p, (size_t)lengths[i]) ||
            !EVP_DigestFinal_ex(ctx, out32 + (size_t)i * 32, &len) ||
            len != 32) {
            EVP_MD_CTX_free(ctx);
            return -1;
        }
        p += lengths[i];
    }
    EVP_MD_CTX_free(ctx);
    return n_segments;
}

/* Per-segment md5, same contract as sha256_segments_full but 16-byte
 * digests (exact-dedup digest groupby and the clean transform's
 * cleaned-text evidence both use md5 to match the DuckDB oracle's md5()). */
int64_t md5_segments_full(const uint8_t *data, const int64_t *lengths,
                          int64_t n_segments, uint8_t *out16) {
    const EVP_MD *md = EVP_md5();
    EVP_MD_CTX *ctx = EVP_MD_CTX_new();
    if (ctx == NULL)
        return -1;
    const uint8_t *p = data;
    for (int64_t i = 0; i < n_segments; i++) {
        unsigned int len = 0;
        if (!EVP_DigestInit_ex(ctx, md, NULL) ||
            !EVP_DigestUpdate(ctx, p, (size_t)lengths[i]) ||
            !EVP_DigestFinal_ex(ctx, out16 + (size_t)i * 16, &len) ||
            len != 16) {
            EVP_MD_CTX_free(ctx);
            return -1;
        }
        p += lengths[i];
    }
    EVP_MD_CTX_free(ctx);
    return n_segments;
}
