"""Jacobian giant-walk parity: the fused/vectorized walk must emit the
same affine X per step as the Python EC oracle, flag degenerate lanes
(point x-equal to the advance point), and never poison the deferred
shared inversion (Z stays nonzero)."""

import numpy as np
import jax
import pytest

from keyhunt_tpu.ops import u256, jacwalk
from keyhunt_tpu.ref import ecc

pytestmark = pytest.mark.slow

C = 1000                       # advance key: lanes step by +1000*G
S = 4


def _seed(keys):
    pts = [ecc.pubkey(k) for k in keys]
    X = u256.from_ints([p[0] for p in pts])
    Y = u256.from_ints([p[1] for p in pts])
    Z = np.zeros((8, len(keys)), np.uint32)
    Z[0] = 1
    return X, Y, Z


def _run(keys, fn):
    X, Y, Z = _seed(keys)
    cx, cy = ecc.pubkey(C)
    return fn(X, Y, Z, cx, cy, S)


def _check_walk(keys, out):
    Xo, Yo, Zo, xs, zs, dg = out
    L = len(keys)
    xa = np.asarray(jax.jit(jacwalk.to_affine_x)(xs, zs))   # (8, S*L)
    for s in range(S):
        for i, k in enumerate(keys):
            want = ecc.pubkey(k + s * C)[0]
            got = u256.to_int(xa[:, s * L + i])
            assert got == want, (s, k)
    # final state advanced S steps
    xf = np.asarray(jax.jit(jacwalk.to_affine_x)(Xo, Zo))
    for i, k in enumerate(keys):
        assert u256.to_int(xf[:, i]) == ecc.pubkey(k + S * C)[0]
    assert not np.asarray(dg).any()


def test_jnp_walk_matches_oracle():
    keys = [7, 123456, 3 << 60, ecc.N - 5]
    out = jax.jit(lambda X, Y, Z: jacwalk.giant_scan_jnp(
        X, Y, Z, *ecc.pubkey(C), S))(*_seed(keys))
    _check_walk(keys, out)


def test_pallas_interpret_matches_jnp():
    keys = list(range(1, 129))          # L = 128 (one lane row)
    ref = jax.jit(lambda X, Y, Z: jacwalk.giant_scan_jnp(
        X, Y, Z, *ecc.pubkey(C), S))(*_seed(keys))
    got = jacwalk.giant_scan_pallas(
        *map(np.asarray, _seed(keys)), *ecc.pubkey(C), S, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_degenerate_lanes_flagged_and_survive():
    # lane 0: P == C  (x-equal, doubling case)
    # lane 1: P == -C (x-equal, infinity case)
    # lane 2: ordinary
    keys = [C, ecc.N - C, 42]
    out = jax.jit(lambda X, Y, Z: jacwalk.giant_scan_jnp(
        X, Y, Z, *ecc.pubkey(C), S))(*_seed(keys))
    Xo, Yo, Zo, xs, zs, dg = out
    L = len(keys)
    dg = np.asarray(dg)
    assert dg[0, 0] and dg[0, 1]        # both flagged at step 0
    assert not dg[:, 2].any()           # ordinary lane never flagged
    # restarted lanes walk G + s*C afterwards; no Z hits zero
    xa = np.asarray(jax.jit(jacwalk.to_affine_x)(xs, zs))
    for s in range(1, S):
        assert u256.to_int(xa[:, s * L + 0]) == ecc.pubkey(1 + (s - 1) * C)[0]
        assert u256.to_int(xa[:, s * L + 2]) == ecc.pubkey(42 + s * C)[0]
    zs = np.asarray(zs)
    for s in range(S):
        for i in range(L):
            assert u256.to_int(zs[:, s * L + i]) % ecc.P != 0
