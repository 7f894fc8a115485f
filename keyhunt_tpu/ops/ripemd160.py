"""Vectorized RIPEMD-160 over uint32 lane batches.

Specialised to the 32-byte-input path (`ripemd160_32` /
`ripemd160_simd_32`, `hash/ripemd160.h:42-53` in the reference): hashing a
SHA-256 digest is the only hot use (hash160). B-way VPU lanes replace the
4-way SSE kernels (`hash/ripemd160_sse.cpp`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .sha256 import bswap32

U32 = jnp.uint32

_R_L = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
        7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
        3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
        1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
        4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13]
_R_R = [5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
        6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
        15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
        8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
        12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11]
_S_L = [11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
        7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
        11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
        11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
        9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6]
_S_R = [8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
        9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
        9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
        15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
        8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11]
_K_L = [0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
_K_R = [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000]

_H0 = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0]


def _rol(x, n: int):
    if n == 0:
        return x
    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def _f(j: int, x, y, z):
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return (x & y) | (~x & z)
    if j < 48:
        return (x | ~y) ^ z
    if j < 64:
        return (x & z) | (y & ~z)
    return x ^ (y | ~z)


def ripemd160_32(digest_be) -> jnp.ndarray:
    """RIPEMD-160 of a 32-byte message given as (8, *batch) big-endian
    words (i.e. a SHA-256 digest). Returns (5, *batch) little-endian state
    words h0..h4 — digest bytes are the LE serialisation of each word, the
    same convention the reference compares hash160 bytes in.
    """
    batch = digest_be.shape[1:]
    zero = jnp.zeros(batch, U32)
    x = [bswap32(digest_be[i]) for i in range(8)]     # LE message words
    x.append(jnp.full(batch, 0x80, U32))              # padding byte
    x += [zero] * 5
    x.append(jnp.full(batch, 256, U32))               # bit length, low word
    x.append(zero)

    al, bl, cl, dl, el = [jnp.broadcast_to(np.uint32(v), batch).astype(U32) for v in _H0]
    ar, br, cr, dr, er = al, bl, cl, dl, el
    for j in range(80):
        t = al + _f(j, bl, cl, dl) + x[_R_L[j]] + np.uint32(_K_L[j // 16])
        t = _rol(t, _S_L[j]) + el
        al, el, dl, cl, bl = el, dl, _rol(cl, 10), bl, t
        t = ar + _f(79 - j, br, cr, dr) + x[_R_R[j]] + np.uint32(_K_R[j // 16])
        t = _rol(t, _S_R[j]) + er
        ar, er, dr, cr, br = er, dr, _rol(cr, 10), br, t
    h0, h1, h2, h3, h4 = [np.uint32(v) for v in _H0]
    out1 = h1 + cl + dr
    out2 = h2 + dl + er
    out3 = h3 + el + ar
    out4 = h4 + al + br
    out0 = h0 + bl + cr
    return jnp.stack([out1, out2, out3, out4, out0])
