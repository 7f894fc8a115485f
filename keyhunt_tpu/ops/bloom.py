"""Bloom filter: host-built bit array in HBM, device-probed by gathers.

Functional counterpart of the reference's libbloom fork (`bloom/bloom.cpp`):
same sizing math (`bloom_init2`, bloom.cpp:154-188) and the same XXH64
double-hash pair (a, b) — with ONE deliberate TPU-first deviation: the bit
count is rounded up to a power of two so the slot map `(a + i*b) mod bits`
becomes a mask of the low 64-bit word (an exact operation on uint32 lanes;
a general u64-by-u32 modulus would cost a long shift-subtract chain per
probe). Geometry therefore differs from the reference's files while the
hash pair is bit-exact; persistence uses our own .npz format.

Build (insert) is host-side numpy — tables are built once, probed O(keys)
times. Check is a jittable device fn.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ref.xxh64 import bloom_hash_pair
from .xxh64 import bloom_hash_pair_20, bloom_hash_pair_32

U32 = jnp.uint32


@dataclass
class BloomFilter:
    entries: int
    error: float
    nbits: int            # power of two
    hashes: int
    bits: np.ndarray      # (nbits/32,) uint32

    @classmethod
    def create(cls, entries: int, error: float = 1e-6) -> "BloomFilter":
        """Sizing per libbloom (bloom.cpp:154-188): bpe = -ln(err)/ln2^2,
        bits = entries*bpe (rounded up to 2^k), hashes = ceil(ln2 * bpe)."""
        assert entries >= 1 and 0 < error < 1
        bpe = -math.log(error) / (math.log(2) ** 2)
        raw_bits = max(int(entries * bpe), 64)
        nbits = 1 << (raw_bits - 1).bit_length()
        hashes = math.ceil(math.log(2) * bpe)
        return cls(entries=entries, error=error, nbits=nbits, hashes=hashes,
                   bits=np.zeros(nbits // 32, dtype=np.uint32))

    # -- host insert -------------------------------------------------------

    def add(self, blobs: list[bytes]) -> None:
        mask = self.nbits - 1
        for blob in blobs:
            a, b = bloom_hash_pair(blob)
            for i in range(self.hashes):
                pos = (a + i * b) & 0xFFFFFFFFFFFFFFFF & mask
                self.bits[pos >> 5] |= np.uint32(1 << (pos & 31))

    def contains(self, blob: bytes) -> bool:
        mask = self.nbits - 1
        a, b = bloom_hash_pair(blob)
        for i in range(self.hashes):
            pos = (a + i * b) & 0xFFFFFFFFFFFFFFFF & mask
            if not (self.bits[pos >> 5] >> np.uint32(pos & 31)) & 1:
                return False
        return True

    # -- device probe ------------------------------------------------------

    def check_words(self, bits_dev, words, msg_len: int):
        """Boolean membership mask for a batch of messages given as LE
        uint32 words ((5, B) for 20-byte, (8, B) for 32-byte messages).
        `bits_dev` is this filter's bit array already on device."""
        pair_fn = bloom_hash_pair_20 if msg_len == 20 else bloom_hash_pair_32
        a, b = pair_fn(words)
        mask = np.uint32((self.nbits - 1) & 0xFFFFFFFF)
        mask_hi = np.uint32((self.nbits - 1) >> 32)
        hit = None
        x = a
        for i in range(self.hashes):
            if i:
                # x = a + i*b incrementally (wrapping u64 add)
                lo = x[1] + b[1]
                carry = (lo < x[1]).astype(U32)
                x = (x[0] + b[0] + carry, lo)
            pos_lo = x[1] & mask
            pos_hi = x[0] & mask_hi
            # nbits <= 2^37 in practice; word index needs the low bits only
            word_idx = (pos_lo >> 5) | (pos_hi << 27)
            bit_idx = pos_lo & np.uint32(31)
            w = bits_dev[word_idx]
            ok = ((w >> bit_idx) & 1) == 1
            hit = ok if hit is None else (hit & ok)
        return hit
