"""Hash-layer parity: device SHA-256 / RIPEMD-160 / Keccak vs the host
oracles (SURVEY.md §7 step 3)."""

import hashlib
import random

import numpy as np
import jax
import jax.numpy as jnp

from keyhunt_tpu.ops import u256, field, curve, hash160 as h160
from keyhunt_tpu.ops.sha256 import sha256_compressed, sha256_uncompressed
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160, eth_address, keccak256
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

random.seed(7)

KEYS = [1, 2, 3, 7, 8, 21, 0xDEADBEEF, 2**31 + 12345, 2**200 + 5]


def _points(keys):
    x, y = curve.points_for_keys(keys)
    return jnp.asarray(x), jnp.asarray(y)


def _words_to_bytes20(words, col) -> bytes:
    w = np.asarray(words)[:, col]
    return b"".join(int(v).to_bytes(4, "little") for v in w)


def test_sha256_compressed():
    x, y = _points(KEYS)
    parity = jnp.asarray(np.array([p[1] & 1 for p in map(ecc.pubkey, KEYS)], np.uint32))
    f = jax.jit(lambda xx, pp: sha256_compressed(np.uint32(2) + pp, xx))
    out = np.asarray(f(x, parity))
    for i, k in enumerate(KEYS):
        want = hashlib.sha256(ecc.compress(ecc.pubkey(k))).digest()
        got = b"".join(int(v).to_bytes(4, "big") for v in out[:, i])
        assert got == want, f"key {k}"


def test_sha256_uncompressed():
    x, y = _points(KEYS)
    f = jax.jit(sha256_uncompressed)
    out = np.asarray(f(x, y))
    for i, k in enumerate(KEYS):
        want = hashlib.sha256(ecc.uncompress_bytes(ecc.pubkey(k))).digest()
        got = b"".join(int(v).to_bytes(4, "big") for v in out[:, i])
        assert got == want, f"key {k}"


def test_hash160_both_prefixes():
    x, _ = _points(KEYS)
    f = jax.jit(h160.hash160_both_prefixes)
    h02, h03 = f(x)
    for i, k in enumerate(KEYS):
        pt = ecc.pubkey(k)
        want02 = hash160(b"\x02" + pt[0].to_bytes(32, "big"))
        want03 = hash160(b"\x03" + pt[0].to_bytes(32, "big"))
        assert _words_to_bytes20(h02, i) == want02, f"key {k} 02"
        assert _words_to_bytes20(h03, i) == want03, f"key {k} 03"


def test_hash160_uncompressed():
    x, y = _points(KEYS)
    f = jax.jit(h160.hash160_uncompressed)
    out = f(x, y)
    for i, k in enumerate(KEYS):
        want = hash160(ecc.uncompress_bytes(ecc.pubkey(k)))
        assert _words_to_bytes20(out, i) == want, f"key {k}"


def test_eth_address():
    x, y = _points(KEYS)
    f = jax.jit(h160.eth_address_words)
    out = f(x, y)
    for i, k in enumerate(KEYS):
        px, py = ecc.pubkey(k)
        want = eth_address(px, py)
        assert _words_to_bytes20(out, i) == want, f"key {k}"


def test_keccak_full_digest():
    from keyhunt_tpu.ops.keccak import keccak256_pubkey64
    x, y = _points(KEYS[:3])
    out = np.asarray(jax.jit(keccak256_pubkey64)(x, y))
    for i, k in enumerate(KEYS[:3]):
        px, py = ecc.pubkey(k)
        want = keccak256(px.to_bytes(32, "big") + py.to_bytes(32, "big"))
        got = b"".join(int(v).to_bytes(4, "little") for v in out[:, i])
        assert got == want


# -- fused Pallas kernel parity (ops.pallas_hash) ---------------------------
# Interpret mode is impractically slow for the full sha+ripemd pipeline
# (>5 min for 256 lanes even on CPU), so parity runs the REAL kernel on the
# attached accelerator against the jnp expansion; skipped on CPU-only hosts.

import pytest


def _rand_x(batch):
    rng = np.random.default_rng(11)
    vals = [int.from_bytes(rng.bytes(32), "big") % ecc.P for _ in range(batch)]
    return jnp.asarray(u256.from_ints(vals))


accel = pytest.mark.skipif(jax.default_backend() == "cpu",
                           reason="needs an accelerator (kernel parity)")


@accel
@pytest.mark.slow
def test_pallas_hash160_both_parity():
    from keyhunt_tpu.ops import pallas_hash
    x = _rand_x(256)
    a02, a03 = jax.jit(h160._both_jnp)(x)
    b02, b03 = jax.jit(pallas_hash.hash160_both)(x)
    assert np.array_equal(np.asarray(a02), np.asarray(b02))
    assert np.array_equal(np.asarray(a03), np.asarray(b03))


@accel
@pytest.mark.slow
def test_pallas_hash160_tail_tile():
    """Batches not divisible by the default tile must still cover every
    lane (ADVICE r1: 384 with tile 256 silently dropped the tail)."""
    from keyhunt_tpu.ops import pallas_hash
    x = _rand_x(384)
    a02, _ = jax.jit(h160._both_jnp)(x)
    b02, _ = jax.jit(pallas_hash.hash160_both)(x)
    assert np.array_equal(np.asarray(a02), np.asarray(b02))


@accel
@pytest.mark.slow
def test_pallas_hash160_uncompressed_parity():
    from keyhunt_tpu.ops import pallas_hash
    x, y = _points(KEYS)
    pad = 128 - x.shape[1]
    xp = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (8, pad))], axis=1)
    yp = jnp.concatenate([y, jnp.broadcast_to(y[:, :1], (8, pad))], axis=1)
    a = jax.jit(h160._uncompressed_jnp)(xp, yp)
    b = jax.jit(pallas_hash.hash160_uncompressed)(xp, yp)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_tile_selection():
    from keyhunt_tpu.ops import pallas_hash
    assert pallas_hash._pick_tile(384, None) == 384
    assert pallas_hash._pick_tile(8192, None) == 8192
    # 8320 = 65*128: the divisor-seeking picker returns the largest
    # 128-multiple divisor <= TILE (13*128), not the 128 floor
    assert pallas_hash._pick_tile(8192 + 128, None) == 13 * 128
    assert pallas_hash._pick_tile(1 << 18, None) == 8192
    with pytest.raises(ValueError):
        pallas_hash._pick_tile(200, None)
    with pytest.raises(ValueError):
        pallas_hash._pick_tile(512, 384)
    assert not pallas_hash.supported((8, 200))
    assert pallas_hash.supported((8, 2, 128))
