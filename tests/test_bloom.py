"""XXH64 device/host parity and bloom filter behaviour."""

import os
import random

import numpy as np
import jax
import jax.numpy as jnp

from keyhunt_tpu.ref.xxh64 import xxh64, bloom_hash_pair, BLOOM_SEED
from keyhunt_tpu.ops.xxh64 import xxh64_20, xxh64_32
from keyhunt_tpu.ops.bloom import BloomFilter
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

random.seed(99)


def _words(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype="<u4").copy()


def test_xxh64_known_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B


def test_device_xxh64_20_parity():
    blobs = [random.randbytes(20) for _ in range(32)]
    words = jnp.asarray(np.stack([_words(b) for b in blobs], axis=1))  # (5, 32)
    f = jax.jit(lambda w: jnp.stack(xxh64_20(w, BLOOM_SEED)))
    out = np.asarray(f(words))
    for i, b in enumerate(blobs):
        want = xxh64(b, BLOOM_SEED)
        got = (int(out[0, i]) << 32) | int(out[1, i])
        assert got == want, b.hex()


def test_device_xxh64_32_parity():
    blobs = [random.randbytes(32) for _ in range(32)]
    words = jnp.asarray(np.stack([_words(b) for b in blobs], axis=1))  # (8, 32)
    f = jax.jit(lambda w: jnp.stack(xxh64_32(w, BLOOM_SEED)))
    out = np.asarray(f(words))
    for i, b in enumerate(blobs):
        want = xxh64(b, BLOOM_SEED)
        got = (int(out[0, i]) << 32) | int(out[1, i])
        assert got == want, b.hex()


def test_bloom_membership_and_fp_rate():
    members = [random.randbytes(20) for _ in range(500)]
    bf = BloomFilter.create(500, error=1e-4)
    bf.add(members)
    for m in members:
        assert bf.contains(m)
    fps = sum(bf.contains(random.randbytes(20)) for _ in range(2000))
    assert fps <= 5          # ~1e-4 expected; generous bound


def test_bloom_device_host_parity():
    members = [random.randbytes(20) for _ in range(200)]
    bf = BloomFilter.create(200, error=1e-5)
    bf.add(members)
    queries = members[:50] + [random.randbytes(20) for _ in range(50)]
    words = jnp.asarray(np.stack([_words(b) for b in queries], axis=1))
    bits_dev = jnp.asarray(bf.bits)
    f = jax.jit(lambda bd, w: bf.check_words(bd, w, 20))
    got = np.asarray(f(bits_dev, words))
    want = np.array([bf.contains(q) for q in queries])
    assert (got == want).all()


def test_bloom_device_host_parity_32():
    members = [random.randbytes(32) for _ in range(100)]
    bf = BloomFilter.create(100, error=1e-5)
    bf.add(members)
    queries = members[:30] + [random.randbytes(32) for _ in range(30)]
    words = jnp.asarray(np.stack([_words(b) for b in queries], axis=1))
    f = jax.jit(lambda bd, w: bf.check_words(bd, w, 32))
    got = np.asarray(f(jnp.asarray(bf.bits), words))
    want = np.array([bf.contains(q) for q in queries])
    assert (got == want).all()
