"""Batched secp256k1 elliptic-curve point operations.

Points are pairs of limb-major ``(8, *batch)`` uint32 field elements
(affine X, Y). The workhorse is `add_mixed_with_inv`: an affine addition
whose slope denominators were inverted *as one batch* — the TPU mapping of
the reference's group trick (one `IntGroup::ModInv` shared by 1024 point
adds, `keyhunt.cpp:3355-3473`). Scalar multiplications are O(setup), not
O(keys), and run on the host oracle (`ref.ecc`).

Generator tables (i*G) mirror `init_generator` (`keyhunt.cpp:5266-5279`)
and the GSn giant-step tables (`keyhunt.cpp:1801-1816`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from . import field
from ..ref import ecc


def add_with_inv(px, py, qx, qy, inv_dx, want_y: bool = True):
    """Affine P + Q given inv_dx = (qx - px)^-1 already computed.

    lambda = (qy - py) * inv_dx;  x3 = lambda^2 - px - qx;
    y3 = lambda * (px - x3) - py.
    Costs 2 muls + 1 sqr per point (1 mul + 1 sqr with want_y=False — the
    compressed / xpoint search path never needs result Y, matching the
    reference's X-only group walk, `keyhunt.cpp:3363-3473`).
    """
    lam = field.mul(field.sub(qy, py), inv_dx)
    x3 = field.sub(field.sub(field.sqr(lam), px), qx)
    if not want_y:
        return x3
    y3 = field.sub(field.mul(lam, field.sub(px, x3)), py)
    return x3, y3


def add_batch(px, py, qx, qy, want_y: bool = True):
    """Affine P + Q over a batch (distinct points; the caller guarantees
    no P = ±Q pairs — see walker key-range constraints). One batched
    inversion over the whole trailing batch."""
    dx = field.sub(qx, px)
    flat = dx.reshape(8, -1)
    inv_flat = field.batch_inv(flat)
    inv_dx = inv_flat.reshape(dx.shape)
    return add_with_inv(px, py, qx, qy, inv_dx, want_y=want_y)


def double_batch(px, py):
    """Affine 2P over a batch: lambda = 3x^2 / (2y)."""
    three_x2 = field.mul_small(field.sqr(px), 3)
    two_y = field.add(py, py)
    inv = field.batch_inv(two_y.reshape(8, -1)).reshape(py.shape)
    lam = field.mul(three_x2, inv)
    x3 = field.sub(field.sub(field.sqr(lam), px), px)
    y3 = field.sub(field.mul(lam, field.sub(px, x3)), py)
    return x3, y3


def endo_x(x):
    """GLV endomorphism X-maps: (beta*x, beta^2*x) — the points of keys
    lambda*k and lambda^2*k. Reference: the beta/beta2 X multiplications at
    `keyhunt.cpp:3408-3440` (x6 speedup in address mode)."""
    ndim = x.ndim
    beta = field.const(field.BETA_INT, ndim)
    beta2 = field.const(field.BETA2_INT, ndim)
    return field.mul(jnp.broadcast_to(beta, x.shape), x), \
        field.mul(jnp.broadcast_to(beta2, x.shape), x)


def neg_y(py):
    """Y -> p - Y (point negation)."""
    pc = field.const(field.P_INT, py.ndim)
    return field.sub(jnp.broadcast_to(pc, py.shape).astype(py.dtype), py)


# ---------------------------------------------------------------------------
# Host-built device tables (setup-time; O(table), not O(keys)).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def offset_table(w: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) arrays of shape (8, w) for points j*G, j = 1..w.

    The TPU analog of the Gn[] table (`init_generator`, keyhunt.cpp:5266).
    """
    pts = ecc.small_multiples(w)
    from . import u256
    xs = u256.from_ints([p[0] for p in pts])
    ys = u256.from_ints([p[1] for p in pts])
    return xs, ys


@functools.lru_cache(maxsize=None)
def offset_table_strided(w: int, stride: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) of j*(stride*G) for j = 1..w — the offset table for strided
    walks (-I flag semantics of the reference)."""
    if stride == 1:
        return offset_table(w)
    from . import u256
    step = ecc.ec_mul(stride)
    pts = [step]
    for _ in range(w - 1):
        pts.append(ecc.ec_add(pts[-1], step))
    return (u256.from_ints([p[0] for p in pts]),
            u256.from_ints([p[1] for p in pts]))


@functools.lru_cache(maxsize=None)
def point_const(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) of k*G as (8, 1) arrays for broadcasting."""
    from . import u256
    pt = ecc.ec_mul(k)
    return u256.from_ints([pt[0]]), u256.from_ints([pt[1]])


def points_for_keys(keys) -> tuple[np.ndarray, np.ndarray]:
    """Host: (8, len(keys)) X/Y arrays of [k*G for k in keys]."""
    from . import u256
    pts = [ecc.pubkey(k) for k in keys]
    return u256.from_ints([p[0] for p in pts]), u256.from_ints([p[1] for p in pts])
