"""Native host runtime (native/keyhunt_native.cpp) vs the pure-Python
oracles in keyhunt_tpu.ref — hashes, EC, seeding, argsort.

The reference implements these host roles in C++ (`secp256k1/*.cpp`,
`hash/*.cpp`, `xxhash/`); these tests pin the native library to the same
behavior the rest of the package assumes from the Python oracles.
"""

import hashlib
import random

import numpy as np
import pytest

from keyhunt_tpu import native
from keyhunt_tpu.ref import ecc, hashes, xxh64 as rxx

pytestmark = pytest.mark.skipif(not native.ensure_built(),
                                reason="native library unavailable")


def test_hashes_match_oracles():
    rng = random.Random(7)
    for length in (0, 1, 22, 33, 55, 64, 65, 136, 137, 300):
        data = bytes(rng.randrange(256) for _ in range(length))
        assert native.sha256(data) == hashlib.sha256(data).digest()
        assert native.ripemd160(data) == hashes.ripemd160(data)
        assert native.keccak256(data) == hashes.keccak256(data)
        assert native.hash160(data) == hashes.hash160(data)


def test_xxh64_bloom_seed_parity():
    rng = random.Random(8)
    seed = 0x59F2815B16F81798  # the bloom seed, bloom/bloom.cpp:129
    for length in (1, 4, 8, 20, 32, 33, 100):
        data = bytes(rng.randrange(256) for _ in range(length))
        assert native.xxh64(data, seed) == rxx.xxh64(data, seed)
        assert native.xxh64(data, 0) == rxx.xxh64(data, 0)


def test_pubkey_batch_vs_oracle():
    rng = random.Random(9)
    keys = [1, 2, 3, 7, 0xFFFF, ecc.N - 1, ecc.N - 2,
            rng.randrange(1, ecc.N), rng.randrange(1, ecc.N)]
    got = native.pubkey_batch(keys)
    for k, pt in zip(keys, got):
        assert pt == ecc.pubkey(k)


def test_ec_mul_add_lift():
    q = ecc.pubkey(123456789)
    assert native.ec_mul(5, q) == ecc.ec_mul(5, q)
    assert native.ec_add(q, ecc.pubkey(42)) == ecc.ec_add(q, ecc.pubkey(42))
    assert native.ec_add(q, ecc.ec_neg(q)) is None
    assert native.ec_add(q, q) == ecc.ec_add(q, q)  # doubling branch
    assert native.lift_x(q[0], bool(q[1] & 1)) == q


def test_seed_lanes_including_infinity():
    key = 1000003
    q = ecc.pubkey(key)
    c0, stride, lanes = 999991, 3, 16
    xy, mask = native.seed_lanes(q, c0, stride, lanes)
    saw_inf = False
    for lane in range(lanes):
        want = ecc.ec_sub(q, ecc.ec_mul(c0 + lane * stride))
        if want is None:
            assert mask[lane] == 1
            saw_inf = True
        else:
            assert mask[lane] == 0
            got = (int.from_bytes(xy[lane, :32].tobytes(), "big"),
                   int.from_bytes(xy[lane, 32:].tobytes(), "big"))
            assert got == want
    assert saw_inf


def test_radix_argsort():
    rng = random.Random(10)
    arr = np.array([rng.randrange(1 << 64) for _ in range(5000)], dtype=np.uint64)
    perm = native.radix_argsort_u64(arr)
    assert np.array_equal(arr[perm], np.sort(arr))
    # stability on duplicates
    arr2 = np.array([5, 3, 5, 3, 5], dtype=np.uint64)
    assert list(native.radix_argsort_u64(arr2)) == [1, 3, 0, 2, 4]


def test_hash160_batch():
    rng = random.Random(11)
    msgs = np.frombuffer(bytes(rng.randrange(256) for _ in range(33 * 20)),
                         np.uint8).reshape(20, 33).copy()
    outs = native.hash160_batch(msgs)
    for i in range(20):
        assert outs[i].tobytes() == hashes.hash160(msgs[i].tobytes())


def test_sha256_batch():
    rng = random.Random(12)
    msgs = np.frombuffer(bytes(rng.randrange(256) for _ in range(22 * 8)),
                         np.uint8).reshape(8, 22).copy()
    outs = native.sha256_batch(msgs)
    for i in range(8):
        assert outs[i].tobytes() == hashlib.sha256(msgs[i].tobytes()).digest()


def test_points_for_keys_uses_native():
    """curve.points_for_keys must agree with the oracle regardless of path."""
    from keyhunt_tpu.ops import curve, u256
    keys = [1, 2, 77, 1 << 40]
    x, y = curve.points_for_keys(keys)
    for i, k in enumerate(keys):
        assert u256.to_ints(x[:, i:i + 1])[0] == ecc.pubkey(k)[0]
        assert u256.to_ints(y[:, i:i + 1])[0] == ecc.pubkey(k)[1]
