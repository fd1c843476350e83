"""Minimal pure-Python BLAKE3 (hash / keyed hash / XOF output).

Implemented from the public BLAKE3 specification (Aumasson et al.,
https://github.com/BLAKE3-team/BLAKE3-specs). Used only for the keyed Gear
table derivation (once per key, 2 KiB of XOF output — reference
chunkers/fastcdc/fastcdc.go:43-75), so throughput is irrelevant;
correctness is pinned by the reference's kfastcdc golden fingerprints and
the spec's published test vectors.
"""

from __future__ import annotations

import struct

MASK32 = 0xFFFFFFFF
IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]
MSG_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8
KEYED_HASH = 16

BLOCK_LEN = 64
CHUNK_LEN = 1024


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & MASK32


def _g(st: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    st[a] = (st[a] + st[b] + mx) & MASK32
    st[d] = _rotr(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & MASK32
    st[b] = _rotr(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b] + my) & MASK32
    st[d] = _rotr(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & MASK32
    st[b] = _rotr(st[b] ^ st[c], 7)


def _compress(cv: list[int], block: list[int], counter: int, block_len: int,
              flags: int) -> list[int]:
    st = cv[:8] + IV[:4] + [
        counter & MASK32, (counter >> 32) & MASK32, block_len, flags,
    ]
    m = list(block)
    for r in range(7):
        _g(st, 0, 4, 8, 12, m[0], m[1])
        _g(st, 1, 5, 9, 13, m[2], m[3])
        _g(st, 2, 6, 10, 14, m[4], m[5])
        _g(st, 3, 7, 11, 15, m[6], m[7])
        _g(st, 0, 5, 10, 15, m[8], m[9])
        _g(st, 1, 6, 11, 12, m[10], m[11])
        _g(st, 2, 7, 8, 13, m[12], m[13])
        _g(st, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[MSG_PERM[i]] for i in range(16)]
    out = [(st[i] ^ st[i + 8]) & MASK32 for i in range(8)]
    out += [(st[i + 8] ^ cv[i]) & MASK32 for i in range(8)]
    return out


def _words(b: bytes) -> list[int]:
    b = b + b"\x00" * (-len(b) % 4)
    return list(struct.unpack("<%dI" % (len(b) // 4), b))


def _chunk_output(chunk: bytes, key: list[int], chunk_counter: int, flags: int):
    """Returns (cv_input, final_block_words, final_block_len, final_flags,
    counter) describing the chunk's final compression (deferred so the root
    can re-run it with the ROOT flag)."""
    cv = key[:]
    blocks = [chunk[i : i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)] or [b""]
    for i, blk in enumerate(blocks[:-1]):
        f = flags | (CHUNK_START if i == 0 else 0)
        cv = _compress(cv, _words(blk.ljust(BLOCK_LEN, b"\x00")), chunk_counter,
                       BLOCK_LEN, f)[:8]
    last = blocks[-1]
    f = flags | CHUNK_END | (CHUNK_START if len(blocks) == 1 else 0)
    return cv, _words(last.ljust(BLOCK_LEN, b"\x00")), len(last), f, chunk_counter


def _tree_output(data: bytes, key: list[int], flags: int, chunk_counter: int = 0):
    """Hash a subtree; returns the deferred final-compression tuple."""
    if len(data) <= CHUNK_LEN:
        return _chunk_output(data, key, chunk_counter, flags)
    # Left subtree: largest power-of-two number of full chunks < total chunks.
    n_chunks = (len(data) + CHUNK_LEN - 1) // CHUNK_LEN
    left_chunks = 1
    while left_chunks * 2 < n_chunks:
        left_chunks *= 2
    split = left_chunks * CHUNK_LEN
    lcv = _finalize_cv(_tree_output(data[:split], key, flags, chunk_counter))
    rcv = _finalize_cv(_tree_output(data[split:], key, flags, chunk_counter + left_chunks))
    return key[:], lcv + rcv, BLOCK_LEN, flags | PARENT, 0


def _finalize_cv(out) -> list[int]:
    cv, block, block_len, flags, counter = out
    return _compress(cv, block, counter, block_len, flags)[:8]


def blake3(data: bytes, key: bytes | None = None, out_len: int = 32) -> bytes:
    """BLAKE3 hash (key=None) or keyed hash, with XOF output of out_len."""
    if key is not None:
        if len(key) != 32:
            raise ValueError("blake3 key must be 32 bytes")
        key_words = _words(key)
        flags = KEYED_HASH
    else:
        key_words = IV[:]
        flags = 0
    cv, block, block_len, final_flags, counter = _tree_output(data, key_words, flags)
    # Root output: re-run the final compression with ROOT and an output
    # counter, taking all 16 words per 64-byte block.
    out = bytearray()
    t = 0
    while len(out) < out_len:
        words = _compress(cv, block, t, block_len, final_flags | ROOT)
        out += struct.pack("<16I", *words)
        t += 1
    return bytes(out[:out_len])
