"""Pallas modmul kernel vs the jnp field path and Python ints.

Runs the kernel in interpreter mode (XLA:CPU has no Mosaic); on real TPU
hardware the same kernel compiles natively — the bench exercises that.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from keyhunt_tpu.ops import field, u256
from keyhunt_tpu.ops import pallas_field as pf

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

P = field.P_INT
B = 256


@pytest.fixture(scope="module")
def vectors():
    rng = random.Random(42)
    avals = [rng.randrange(1 << 256) for _ in range(B)]
    bvals = [rng.randrange(1 << 256) for _ in range(B)]
    # edges: 0, 1, p-1, p, 2^256-1 in both operands
    edges = [0, 1, P - 1, P, (1 << 256) - 1]
    avals[:len(edges)] = edges
    bvals[:len(edges)] = edges[::-1]
    a = jnp.asarray(u256.from_ints(avals))
    b = jnp.asarray(u256.from_ints(bvals))
    return avals, bvals, a, b


def test_core_matches_ints(vectors):
    avals, bvals, a, b = vectors
    got = u256.to_ints(jax.jit(pf._mul_mod_p)(a, b))
    for x, y, g in zip(avals, bvals, got):
        assert g % P == (x * y) % P
        assert g < (1 << 256)


def test_pallas_call_grid(vectors):
    avals, bvals, a, b = vectors
    out = pf.mul(a, b, interpret=True)            # B=256 -> 2x128-lane rows
    got = u256.to_ints(out)
    for x, y, g in zip(avals, bvals, got):
        assert g % P == (x * y) % P


def test_sqr(vectors):
    avals, _, a, _ = vectors
    got = u256.to_ints(pf.sqr(a, interpret=True))
    for x, g in zip(avals, got):
        assert g % P == (x * x) % P


def test_matches_field_mul_mod_p(vectors):
    """Kernel and jnp path agree mod p on identical inputs (both lazy)."""
    avals, bvals, a, b = vectors
    jn = u256.to_ints(jax.jit(
        lambda x, y: field._reduce_512(u256.mul_512_halves(x, y)))(a, b))
    ker = u256.to_ints(pf.mul(a, b, interpret=True))
    assert [v % P for v in jn] == [v % P for v in ker]


def test_broadcast_and_rank3(vectors):
    _, _, a, b = vectors
    a3 = a.reshape(8, 2, 128)
    out = pf.mul(a3, b.reshape(8, 2, 128), interpret=True)
    assert out.shape == (8, 2, 128)


def test_batch_inv_fused(vectors):
    """Two-launch fused inversion vs python pow; odd B exercises the
    ones-padding, tile=128 exercises multi-tile + the global phase."""
    avals, _, a, _ = vectors
    vals = [v % P or 7 for v in avals[:300 // 2] * 2][:300]
    x = jnp.asarray(u256.from_ints(vals))
    out = pf.batch_inv(x, tile=128, interpret=True)
    got = u256.to_ints(field.norm(out))
    for v, g in zip(vals, got):
        assert g == pow(v, P - 2, P)
