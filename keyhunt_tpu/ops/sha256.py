"""Vectorized SHA-256 over uint32 lane batches.

Each batch element is an independent message; all words are ``(*batch,)``
uint32 arrays stacked as ``(16, *batch)`` blocks. The reference's 4-way SSE
kernels (`hash/sha256_sse.cpp`, dispatch `hash/sha256.h:31-51`) become
B-way VPU lanes here; the fixed-size 33/65-byte pubkey paths mirror
`sha256_33`/`sha256_65` (`hash/sha256.h:26-30`) and the limb->block macros
`KEYBUFFCOMP/KEYBUFFUNCOMP` (`SECP256K1.cpp:1187-1203`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_IV = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def bswap32(x):
    return ((x & np.uint32(0xFF)) << 24) | ((x & np.uint32(0xFF00)) << 8) | \
           ((x >> 8) & np.uint32(0xFF00)) | (x >> 24)


def _compress(state, w):
    """One SHA-256 compression: state tuple of 8 arrays, w list of 16 words."""
    ws = list(w)
    for i in range(16, 64):
        s0 = rotr(ws[i - 15], 7) ^ rotr(ws[i - 15], 18) ^ (ws[i - 15] >> 3)
        s1 = rotr(ws[i - 2], 17) ^ rotr(ws[i - 2], 19) ^ (ws[i - 2] >> 10)
        ws.append(ws[i - 16] + s0 + ws[i - 7] + s1)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + _K[i] + ws[i]
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return tuple(s + v for s, v in zip(state, (a, b, c, d, e, f, g, h)))


def sha256_blocks(blocks) -> jnp.ndarray:
    """Digest of pre-padded message blocks.

    blocks: list of 16-word lists (each word a (*batch,) uint32 array).
    Returns (8, *batch) big-endian digest words.
    """
    state = tuple(jnp.broadcast_to(np.uint32(v), blocks[0][0].shape).astype(U32)
                  for v in _IV)
    for w in blocks:
        state = _compress(state, w)
    return jnp.stack(state)


def _be_words(limbs):
    """(8, *batch) little-endian limbs -> list of 8 big-endian message words
    (most-significant word first). A uint32 limb IS its big-endian word —
    only the limb order reverses."""
    return [limbs[7 - i] for i in range(8)]


def block_compressed_pubkey(prefix, x_limbs):
    """Single padded block for SHA256(prefix || X_be), the 33-byte
    compressed-pubkey path. `prefix` is a (*batch,) uint32 array of
    0x02/0x03 (the from-X two-prefix trick, `SECP256K1.cpp:1207-1250`)."""
    sx = _be_words(x_limbs)
    batch = x_limbs.shape[1:]
    zero = jnp.zeros(batch, U32)
    w = [None] * 16
    w[0] = (prefix << 24) | (sx[0] >> 8)
    for i in range(1, 8):
        w[i] = (sx[i - 1] << 24) | (sx[i] >> 8)
    w[8] = (sx[7] << 24) | np.uint32(0x00800000)
    for i in range(9, 15):
        w[i] = zero
    w[15] = jnp.full(batch, 33 * 8, U32)
    return w


def blocks_uncompressed_pubkey(x_limbs, y_limbs):
    """Two padded blocks for SHA256(0x04 || X_be || Y_be) (65 bytes)."""
    sx = _be_words(x_limbs)
    sy = _be_words(y_limbs)
    batch = x_limbs.shape[1:]
    zero = jnp.zeros(batch, U32)
    w1 = [None] * 16
    w1[0] = jnp.full(batch, 0x04 << 24, U32) | (sx[0] >> 8)
    for i in range(1, 8):
        w1[i] = (sx[i - 1] << 24) | (sx[i] >> 8)
    w1[8] = (sx[7] << 24) | (sy[0] >> 8)
    for i in range(1, 8):
        w1[8 + i] = (sy[i - 1] << 24) | (sy[i] >> 8)
    w2 = [zero] * 16
    w2[0] = (sy[7] << 24) | np.uint32(0x00800000)
    w2[15] = jnp.full(batch, 65 * 8, U32)
    return [w1, w2]


def sha256_compressed(prefix, x_limbs):
    """(8, *batch) digest of the compressed pubkey (prefix || X)."""
    return sha256_blocks([block_compressed_pubkey(prefix, x_limbs)])


def sha256_uncompressed(x_limbs, y_limbs):
    """(8, *batch) digest of the uncompressed pubkey (04 || X || Y)."""
    return sha256_blocks(blocks_uncompressed_pubkey(x_limbs, y_limbs))
