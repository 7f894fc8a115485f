"""Vectorized XXH64 on uint32 lane pairs (device).

Bit-exact with `ref.xxh64` (and therefore with the reference's
`xxhash/xxhash.h` usage in `bloom/bloom.cpp:122-147`). Only the fixed-size
paths the bloom filters need are implemented: 20-byte (hash160) and
32-byte (X coordinate) messages, given as little-endian uint32 words of
the byte stream.

u64 values are (hi, lo) uint32 pairs; 64-bit multiplies decompose into
16-bit half products exactly like `ops.u256`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ref.xxh64 import P1, P2, P3, P4, P5, BLOOM_SEED

U32 = jnp.uint32
M16 = np.uint32(0xFFFF)


def _const(v: int):
    return (np.uint32((v >> 32) & 0xFFFFFFFF), np.uint32(v & 0xFFFFFFFF))


def _add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    return (a[0] + b[0] + carry, lo)


def _xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _rol(a, n: int):
    hi, lo = a
    n %= 64
    if n == 0:
        return a
    if n == 32:
        return (lo, hi)
    if n < 32:
        s, c = np.uint32(n), np.uint32(32 - n)
        return ((hi << s) | (lo >> c), (lo << s) | (hi >> c))
    s, c = np.uint32(n - 32), np.uint32(64 - n)
    return ((lo << s) | (hi >> c), (hi << s) | (lo >> c))


def _shr(a, n: int):
    hi, lo = a
    assert 0 < n < 64
    if n < 32:
        s, c = np.uint32(n), np.uint32(32 - n)
        return (hi >> s, (lo >> s) | (hi << c))
    return (jnp.zeros_like(hi), hi >> np.uint32(n - 32))


def _mul32x32(a, b):
    """Full 32x32 -> 64 product of uint32 arrays, as (hi, lo)."""
    a0, a1 = a & M16, a >> 16
    b0, b1 = b & M16, b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    t = (p00 >> 16) + (p01 & M16) + (p10 & M16)
    lo = (p00 & M16) | (t << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (t >> 16)
    return (hi, lo)


def _mul(a, b):
    """Low 64 bits of a 64x64 product (wrapping, like C)."""
    hi, lo = _mul32x32(a[1], b[1])
    cross = a[1] * b[0] + a[0] * b[1]          # low 32 bits suffice
    return (hi + cross, lo)


def _round(acc, lane):
    acc = _add(acc, _mul(lane, _const(P2)))
    return _mul(_rol(acc, 31), _const(P1))


def _avalanche(h):
    h = _xor(h, _shr(h, 33))
    h = _mul(h, _const(P2))
    h = _xor(h, _shr(h, 29))
    h = _mul(h, _const(P3))
    h = _xor(h, _shr(h, 32))
    return h


def _seed_pair(seed):
    """seed may be a Python int or a (hi, lo) traced pair."""
    if isinstance(seed, tuple):
        return seed
    return (jnp.broadcast_to(np.uint32((seed >> 32) & 0xFFFFFFFF), ()).astype(U32),
            jnp.broadcast_to(np.uint32(seed & 0xFFFFFFFF), ()).astype(U32))


def xxh64_20(words, seed):
    """XXH64 of a 20-byte message given as 5 LE uint32 words (5, *batch)."""
    s = _seed_pair(seed)
    h = _add(s, _const(P5))
    h = _add(h, _const(20))
    # two 8-byte lanes
    for k in ((words[1], words[0]), (words[3], words[2])):
        h = _xor(h, _round(_const(0), k))
        h = _add(_mul(_rol(h, 27), _const(P1)), _const(P4))
    # one 4-byte lane
    h = _xor(h, _mul((jnp.zeros_like(words[4]), words[4]), _const(P1)))
    h = _add(_mul(_rol(h, 23), _const(P2)), _const(P3))
    return _avalanche(h)


def xxh64_32(words, seed):
    """XXH64 of a 32-byte message given as 8 LE uint32 words (8, *batch)."""
    s = _seed_pair(seed)
    v = [_add(s, _const((P1 + P2) & 0xFFFFFFFFFFFFFFFF)),
         _add(s, _const(P2)),
         s,
         _add(s, _const((-P1) & 0xFFFFFFFFFFFFFFFF))]
    lanes = [(words[2 * i + 1], words[2 * i]) for i in range(4)]
    v = [_round(vi, ki) for vi, ki in zip(v, lanes)]
    h = _add(_add(_rol(v[0], 1), _rol(v[1], 7)),
             _add(_rol(v[2], 12), _rol(v[3], 18)))
    for vi in v:
        h = _xor(h, _round(_const(0), vi))
        h = _add(_mul(h, _const(P1)), _const(P4))
    h = _add(h, _const(32))
    return _avalanche(h)


def bloom_hash_pair_20(words):
    """(a, b) bloom double-hash pair for 20-byte messages, matching
    ref.xxh64.bloom_hash_pair bit-exactly."""
    a = xxh64_20(words, BLOOM_SEED)
    b = xxh64_20(words, a)
    return a, b


def bloom_hash_pair_32(words):
    a = xxh64_32(words, BLOOM_SEED)
    b = xxh64_32(words, a)
    return a, b
