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
