"""Field-layer parity: device limb arithmetic vs Python ints (the oracle
strategy of SURVEY.md §7 step 1). Everything runs under jit — eager mode
dispatches thousands of tiny ops and is not a supported path."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from keyhunt_tpu.ops import u256, field
from keyhunt_tpu.ops.field import P_INT
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

random.seed(1234)

EDGE = [0, 1, 2, 976, 977, 2**32 - 1, 2**32, 2**128, P_INT - 1, P_INT, P_INT + 1,
        2**256 - 1, 2**256 - 2**32 - 978, field.D_INT, field.BETA_INT]

j_add256 = jax.jit(u256.add256)
j_sub256 = jax.jit(u256.sub256)
j_addm = jax.jit(lambda a, b: field.norm(field.add(a, b)))
j_subm = jax.jit(lambda a, b: field.norm(field.sub(a, b)))
j_mulm = jax.jit(lambda a, b: field.norm(field.mul(a, b)))
j_sqrm = jax.jit(lambda a: field.norm(field.sqr(a)))
j_inv = jax.jit(lambda a: field.norm(field.inv(a)))
j_sqrt = jax.jit(lambda a: field.norm(field.sqrt(a)))
j_binv = jax.jit(lambda a: field.norm(field.batch_inv(a)))
j_norm = jax.jit(field.norm)


def rand256(n):
    return [random.getrandbits(256) for _ in range(n)]


def pairs(n=64):
    vals_a = EDGE + rand256(n - len(EDGE))
    vals_b = list(reversed(EDGE)) + rand256(n - len(EDGE))
    return vals_a, vals_b


def test_roundtrip():
    vals = EDGE + rand256(10)
    arr = u256.from_ints(vals)
    assert u256.to_ints(arr) == [v % 2**256 for v in vals]


def test_add256_sub256():
    va, vb = pairs()
    a, b = jnp.asarray(u256.from_ints(va)), jnp.asarray(u256.from_ints(vb))
    s, c = j_add256(a, b)
    got = u256.to_ints(s)
    for i, (x, y) in enumerate(zip(va, vb)):
        tot = x + y
        assert got[i] == tot % 2**256
        assert int(np.asarray(c)[i]) == tot >> 256
    d, bo = j_sub256(a, b)
    got = u256.to_ints(d)
    for i, (x, y) in enumerate(zip(va, vb)):
        assert got[i] == (x - y) % 2**256
        assert int(np.asarray(bo)[i]) == int(x < y)


def test_mod_add_sub():
    va, vb = pairs()
    a, b = jnp.asarray(u256.from_ints(va)), jnp.asarray(u256.from_ints(vb))
    got = u256.to_ints(j_addm(a, b))
    for i, (x, y) in enumerate(zip(va, vb)):
        assert got[i] == (x + y) % P_INT, f"add idx {i}"
    got = u256.to_ints(j_subm(a, b))
    for i, (x, y) in enumerate(zip(va, vb)):
        assert got[i] == (x - y) % P_INT, f"sub idx {i}"


def test_mod_mul_sqr():
    va, vb = pairs(128)
    a, b = jnp.asarray(u256.from_ints(va)), jnp.asarray(u256.from_ints(vb))
    got = u256.to_ints(j_mulm(a, b))
    for i, (x, y) in enumerate(zip(va, vb)):
        assert got[i] == (x * y) % P_INT, f"mul idx {i}"
    got = u256.to_ints(j_sqrm(a))
    for i, x in enumerate(va):
        assert got[i] == (x * x) % P_INT, f"sqr idx {i}"


def test_mul_small():
    va, _ = pairs()
    a = jnp.asarray(u256.from_ints(va))
    for k in (1, 2, 3, 7, 977, 0xFFFF):
        f = jax.jit(lambda x, kk=k: field.norm(field.mul_small(x, kk)))
        got = u256.to_ints(f(a))
        for i, x in enumerate(va):
            assert got[i] == (x * k) % P_INT, f"mul_small k={k} idx {i}"


def test_inv_sqrt():
    vals = [1, 2, P_INT - 1, field.BETA_INT] + rand256(4)
    a = jnp.asarray(u256.from_ints(vals))
    got = u256.to_ints(j_inv(a))
    for i, x in enumerate(vals):
        assert got[i] == pow(x, P_INT - 2, P_INT)
    sq = [(v * v) % P_INT for v in vals]
    got = u256.to_ints(j_sqrt(jnp.asarray(u256.from_ints(sq))))
    for i, x in enumerate(vals):
        r = got[i]
        assert r == x % P_INT or r == (P_INT - x) % P_INT


def test_inv_chain_exponent():
    """The unrolled addition chain computes exactly x^(p-2): replicate the
    chain over exponents with integer arithmetic (sqr doubles, mul adds).
    Together with mul/sqr parity this proves the chain form correct without
    compiling its 43K-op graph on CPU."""
    def sqr_n(e, n):
        return e << n
    x1 = 1
    x2 = sqr_n(x1, 1) + x1
    x3 = sqr_n(x2, 1) + x1
    x6 = sqr_n(x3, 3) + x3
    x9 = sqr_n(x6, 3) + x3
    x11 = sqr_n(x9, 2) + x2
    x22 = sqr_n(x11, 11) + x11
    x44 = sqr_n(x22, 22) + x22
    x88 = sqr_n(x44, 44) + x44
    x176 = sqr_n(x88, 88) + x88
    x220 = sqr_n(x176, 44) + x44
    x223 = sqr_n(x220, 3) + x3
    t = sqr_n(x223, 23) + x22
    t = sqr_n(t, 5) + x1
    t = sqr_n(t, 3) + x2
    t = sqr_n(t, 2) + x1
    assert t == P_INT - 2


def test_batch_inv():
    vals = [1, 2, P_INT - 1] + rand256(61)
    a = jnp.asarray(u256.from_ints(vals))
    got = u256.to_ints(j_binv(a))
    for i, x in enumerate(vals):
        assert got[i] == pow(x, P_INT - 2, P_INT), f"batch_inv idx {i}"


def test_batch_inv_2d():
    vals = rand256(24)
    a = jnp.asarray(u256.from_ints(vals, shape=(4, 6)))
    f = jax.jit(lambda x: field.norm(field.batch_inv(x.reshape(8, -1))))
    got = u256.to_ints(f(a))
    for i, x in enumerate(vals):
        assert got[i] == pow(x, P_INT - 2, P_INT)


def test_beta_constants():
    from keyhunt_tpu.ref import ecc
    assert field.BETA_INT == ecc.BETA
    assert field.BETA2_INT == pow(ecc.BETA, 2, P_INT)
    assert pow(ecc.BETA, 3, P_INT) == 1
    # lambda^3 == 1 mod n
    assert pow(ecc.LAMBDA, 3, ecc.N) == 1


def test_norm_and_geq():
    vals = [0, 1, P_INT - 1, P_INT, P_INT + 5, 2**256 - 1]
    a = jnp.asarray(u256.from_ints(vals))
    got = u256.to_ints(j_norm(a))
    for i, x in enumerate(vals):
        assert got[i] == x % P_INT
    ge = np.asarray(jax.jit(u256.geq)(a, jnp.asarray(u256.from_ints([1] * len(vals)))))
    assert list(ge) == [v >= 1 for v in vals]
