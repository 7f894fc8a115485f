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
import jax
import jax.numpy as jnp

from . import field, u256
from ..ref import ecc

U32 = jnp.uint32


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
# Jacobian coordinates: inversion-free point arithmetic for batched scalar
# multiplication (the reference's ScalarMultiplication/ComputePublicKey,
# SECP256K1.cpp:197-296, redesigned branch-free for lanes).
# ---------------------------------------------------------------------------

def jac_double(X, Y, Z):
    """2P in Jacobian coords (a=0 curve). ~5 sqr + 2 mul + small muls.
    Handles infinity transparently (Z=0 stays 0)."""
    A = field.sqr(X)
    B = field.sqr(Y)
    C = field.sqr(B)
    t = field.sqr(field.add(X, B))
    D = field.add(field.sub(field.sub(t, A), C), field.sub(field.sub(t, A), C))
    E = field.mul_small(A, 3)
    F = field.sqr(E)
    X3 = field.sub(F, field.add(D, D))
    Y3 = field.sub(field.mul(E, field.sub(D, X3)), field.mul_small(C, 8))
    Z3 = field.add(field.mul(Y, Z), field.mul(Y, Z))
    return X3, Y3, Z3


def jac_add_mixed(X1, Y1, Z1, x2, y2):
    """P + Q with Q affine (z=1), Jacobian result. ~8 mul + 3 sqr.

    Branch-free infinity handling: if P is infinity (Z1 == 0) the result is
    Q. The doubling case (P == Q) is NOT handled — callers (scalar mult
    over hashed scalars) hit it with probability ~2^-250; `jac_double` is
    selected separately where it can occur deterministically.
    """
    z1z1 = field.sqr(Z1)
    u2 = field.mul(x2, z1z1)
    s2 = field.mul(field.mul(y2, Z1), z1z1)
    h = field.sub(u2, X1)
    hh = field.sqr(h)
    i = field.mul_small(hh, 4)
    j = field.mul(h, i)
    r = field.add(field.sub(s2, Y1), field.sub(s2, Y1))
    v = field.mul(X1, i)
    X3 = field.sub(field.sub(field.sqr(r), j), field.add(v, v))
    y1j = field.mul(Y1, j)
    Y3 = field.sub(field.mul(r, field.sub(v, X3)), field.add(y1j, y1j))
    Z3 = field.sub(field.sub(field.sqr(field.add(Z1, h)), z1z1), hh)
    p_inf = u256.is_zero(field.norm(Z1))[None]
    one = jnp.broadcast_to(field.const(1, X1.ndim), X1.shape).astype(X1.dtype)
    X3 = jnp.where(p_inf, jnp.broadcast_to(x2, X3.shape), X3)
    Y3 = jnp.where(p_inf, jnp.broadcast_to(y2, Y3.shape), Y3)
    Z3 = jnp.where(p_inf, one, Z3)
    return X3, Y3, Z3


def jac_to_affine(X, Y, Z):
    """Batch-convert Jacobian -> affine: one batched inversion of Z.
    Infinity lanes (Z=0) poison the shared inverse — callers must mask
    them out beforehand (scalar 0 mod N never occurs for hashed keys)."""
    zinv = field.batch_inv(Z.reshape(8, -1)).reshape(Z.shape)
    zinv2 = field.sqr(zinv)
    x = field.mul(X, zinv2)
    y = field.mul(Y, field.mul(zinv2, zinv))
    return x, y


def scalar_mult_base(k_limbs, steps_unroll: int = 2):
    """Batched k*G via MSB-first double-and-add over 256 bits.

    k_limbs: (8, B) scalars (little-endian limbs). Returns affine (x, y).
    ~256 doubles + 256 conditional mixed adds per lane — the O(1)-per-key
    setup path (minikeys), NOT the range walker (which pays ~3 muls/key).
    """
    B = k_limbs.shape[1]
    bits = []
    for t in range(256):          # MSB first
        limb = 7 - t // 32
        shift = 31 - (t % 32)
        bits.append((k_limbs[limb] >> np.uint32(shift)) & np.uint32(1))
    bits_arr = jnp.stack(bits)    # (256, B)
    gx = jnp.broadcast_to(jnp.asarray(u256.from_int(ecc.GX, (1,))), (8, B)).astype(U32)
    gy = jnp.broadcast_to(jnp.asarray(u256.from_int(ecc.GY, (1,))), (8, B)).astype(U32)
    zero = jnp.zeros((8, B), U32)

    def step(carry, bit):
        X, Y, Z = carry
        X, Y, Z = jac_double(X, Y, Z)
        Xa, Ya, Za = jac_add_mixed(X, Y, Z, gx, gy)
        sel = (bit != 0)[None]
        X = jnp.where(sel, Xa, X)
        Y = jnp.where(sel, Ya, Y)
        Z = jnp.where(sel, Za, Z)
        return (X, Y, Z), None

    (X, Y, Z), _ = jax.lax.scan(step, (zero, zero, zero), bits_arr,
                                unroll=steps_unroll)
    return jac_to_affine(X, Y, Z)

@functools.lru_cache(maxsize=None)
def offset_table(w: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) arrays of shape (8, w) for points j*G, j = 1..w.

    The TPU analog of the Gn[] table (`init_generator`, keyhunt.cpp:5266).
    """
    return offset_table_strided(w, 1)


@functools.lru_cache(maxsize=None)
def offset_table_strided(w: int, stride: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) of j*(stride*G) for j = 1..w — the offset table for strided
    walks (-I flag semantics of the reference)."""
    return points_for_keys([j * stride for j in range(1, w + 1)])


@functools.lru_cache(maxsize=None)
def point_const(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) of k*G as (8, 1) arrays for broadcasting."""
    from . import u256
    pt = ecc.ec_mul(k)
    return u256.from_ints([pt[0]]), u256.from_ints([pt[1]])


def points_for_keys(keys) -> tuple[np.ndarray, np.ndarray]:
    """Host: (8, len(keys)) X/Y arrays of [k*G for k in keys].

    Dispatches to the native host runtime when built (window-8 comb + one
    batched inversion, keyhunt_native.cpp) and falls back to the Python
    oracle otherwise. Keys must be nonzero mod n.
    """
    from . import u256
    from .. import native
    if native.available():
        pts = native.pubkey_batch(list(keys))
    else:
        pts = [ecc.pubkey(k) for k in keys]
    assert all(p is not None for p in pts), "zero key has no point"
    return u256.from_ints([p[0] for p in pts]), u256.from_ints([p[1] for p in pts])
