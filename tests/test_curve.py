"""Curve-layer parity vs the host oracle and reference fixtures
(SURVEY.md §7 step 2)."""

import os

import jax
import jax.numpy as jnp
import pytest

from keyhunt_tpu.ops import u256, field, curve
from keyhunt_tpu.ref import ecc
from conftest import reference_fixture

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def as_points(keys):
    x, y = curve.points_for_keys(keys)
    return jnp.asarray(x), jnp.asarray(y)


def test_add_batch_vs_oracle():
    ka = [1, 2, 5, 1000, 123456789, 2**200 + 7]
    kb = [3, 9, 77, 31337, 2**100, 2**13]
    px, py = as_points(ka)
    qx, qy = as_points(kb)
    f = jax.jit(lambda a, b, c, d: jax.tree.map(field.norm, curve.add_batch(a, b, c, d)))
    x3, y3 = f(px, py, qx, qy)
    gx, gy = u256.to_ints(x3), u256.to_ints(y3)
    for i, (a, b) in enumerate(zip(ka, kb)):
        want = ecc.pubkey(a + b)
        assert (gx[i], gy[i]) == want, f"add idx {i}"


def test_add_x_only():
    ka = [10, 20, 30]
    kb = [1, 2, 3]
    px, py = as_points(ka)
    qx, qy = as_points(kb)
    f = jax.jit(lambda a, b, c, d: field.norm(curve.add_batch(a, b, c, d, want_y=False)))
    x3 = f(px, py, qx, qy)
    for i, (a, b) in enumerate(zip(ka, kb)):
        assert u256.to_ints(x3)[i] == ecc.pubkey(a + b)[0]


def test_double_batch():
    ks = [1, 7, 2**50 + 3]
    px, py = as_points(ks)
    f = jax.jit(lambda a, b: jax.tree.map(field.norm, curve.double_batch(a, b)))
    x3, y3 = f(px, py)
    for i, k in enumerate(ks):
        want = ecc.pubkey(2 * k)
        assert (u256.to_ints(x3)[i], u256.to_ints(y3)[i]) == want


def test_endomorphism():
    ks = [1, 5, 99991]
    px, _ = as_points(ks)
    f = jax.jit(lambda x: tuple(field.norm(v) for v in curve.endo_x(x)))
    bx, b2x = f(px)
    for i, k in enumerate(ks):
        assert u256.to_ints(bx)[i] == ecc.pubkey(k * ecc.LAMBDA % ecc.N)[0]
        assert u256.to_ints(b2x)[i] == ecc.pubkey(k * ecc.LAMBDA * ecc.LAMBDA % ecc.N)[0]


def test_offset_table():
    xs, ys = curve.offset_table(16)
    for j in range(1, 17):
        want = ecc.pubkey(j)
        assert u256.to_ints(xs)[j - 1] == want[0]
        assert u256.to_ints(ys)[j - 1] == want[1]


def test_reference_pubkey_fixture():
    """Parity with the upstream fixture tests/1to63_65.txt: compressed
    pubkeys of puzzle keys (README:785-788) — our oracle and device tables
    must reproduce the X coordinates bit-exactly."""
    path = reference_fixture("1to63_65.txt")
    if path is None:
        pytest.skip("reference fixtures not available")
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    pts = [ecc.parse_pubkey_hex(ln) for ln in lines]
    # puzzle n has key in [2^(n-1), 2^n): verify each parsed point is on the
    # curve and matches a lift of its own X (sanity), and that the first
    # point is G-scaled consistently via the oracle where keys are known.
    for pt in pts:
        assert (pt[1] * pt[1] - pt[0] ** 3 - 7) % ecc.P == 0
    # puzzle #1 key is 1, #2 is 3, #3 is 7, #4 is 8, #5 is 21 (public data)
    known = {0: 1, 1: 3, 2: 7, 3: 8, 4: 21}
    for idx, k in known.items():
        assert pts[idx][0] == ecc.pubkey(k)[0], f"puzzle {idx+1}"
