"""Fused Jacobian giant-walk kernel for BSGS.

The r2 giant step advanced lanes AFFINELY: one shared-slope addition per
step, each step paying a batched inversion (two kernel launches) plus a
dozen XLA fusions — on the tunneled TPU runtime the walk measured only
~19 M giant points/s, launch-bound, not FLOP-bound.

Redesign: lanes walk in JACOBIAN coordinates (X, Y, Z), where adding the
constant advance point C needs NO inversion (mixed add, 8 mul + 3 sqr).
The whole S-step scan fuses into ONE Pallas kernel invocation: state
stays in VMEM, each step emits its (X, Z) pair, and affine conversion is
DEFERRED — one `field.batch_inv` over all S*L Z values per call, then
x = X * Zinv^2 feeds the fragment probe. Per call: 1 scan kernel + the
two batch-inv launches + a handful of epilogue fusions, independent of S.

Math (standard a=0 mixed add, C=(cx,cy) affine):
    Z2 = Z^2; Z3 = Z2*Z; U2 = cx*Z2; S2 = cy*Z3
    H = U2 - X; R = S2 - Y
    HH = H^2; HHH = H*HH; T = X*HH
    X' = R^2 - HHH - 2T
    Y' = R*(T - X') - Y*HHH
    Z' = Z*H

Degenerate lanes (H == 0: the lane's point x-equals C — the walked key
IS the answer, c ± span, resolved analytically by the host exactly as in
the affine walk) are FLAGGED via a per-step mask and their state replaced
by a restart point (C itself, Z=1), keeping Z != 0 so the deferred shared
inversion is never poisoned. Reference equivalents: the giant-step loop
`thread_process_bsgs` (keyhunt.cpp:4646-4716) and its ±point special
cases (keyhunt.cpp:5232-5244).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field, u256
from .pallas_field import _mul_mod_p, _sqr_mod_p
from ..ref import ecc

U32 = jnp.uint32

#: lanes per grid block (rows of 128). The binding constraint is VMEM:
#: the two emission blocks hold S*R*8*128*4 bytes EACH; past ~S*R = 256
#: the kernel spills and collapses ~50x (measured 1.8 s/call vs 37 ms at
#: S=16, R=32). Bigger R amortizes VPU op-issue latency over more lanes
#: (every mul row-op inside the kernel works on R*128 elements), so the
#: default scales R to the S budget. KEYHUNT_TPU_JACROWS overrides; read
#: per call, so geometry sweeps can vary it in-process.
import os as _os


def _rows_for(steps: int) -> int:
    env = _os.environ.get("KEYHUNT_TPU_JACROWS")
    if env:
        # clamp: 0 would zero the grid divisor, negatives are garbage
        return max(int(env), 1)
    return max(min(128 // max(steps, 1), 64), 1)


def _kconst(v: int, batch):
    """Field constant built from SCALAR literals only — Pallas kernels may
    not capture array constants (they must be inputs), but scalar splats
    are fine."""
    rows = [jnp.full((1,) + tuple(batch),
                     np.uint32((v >> (32 * i)) & 0xFFFFFFFF), U32)
            for i in range(8)]
    return jnp.concatenate(rows)


def _norm_k(a):
    """Kernel-safe field.norm (no captured (8,1,1) constant)."""
    pc = _kconst(field.P_INT, a.shape[1:])
    d, borrow = u256.sub256(a, pc)
    keep = (borrow != 0)[None]
    return jnp.where(keep, a, d)


def _madd_const(X, Y, Z, cx, cy, gx, gy):
    """One Jacobian += affine-C step on (8, *b) values. Returns the new
    state plus the degeneracy mask (H == 0). Degenerate lanes restart at
    G (never x-equal to the huge advance point C), so they cannot consume
    a flag slot on every subsequent step. Value-level: usable both inside
    the Pallas kernel (via pallas_field's `_mul_mod_p`) and in the jnp
    reference path."""
    mul, sqr = _mul_mod_p, _sqr_mod_p
    z2 = sqr(Z)
    z3 = mul(z2, Z)
    u2 = mul(cx, z2)
    s2 = mul(cy, z3)
    h = field.sub(u2, X)
    r = field.sub(s2, Y)
    degen = u256.is_zero(_norm_k(h))
    hh = sqr(h)
    hhh = mul(h, hh)
    t = mul(X, hh)
    x3 = field.sub(field.sub(sqr(r), hhh), field.add(t, t))
    y3 = field.sub(mul(r, field.sub(t, x3)), mul(Y, hhh))
    z3n = mul(Z, h)
    batch = X.shape[1:]
    one = jnp.concatenate([jnp.ones((1,) + batch, U32),
                           jnp.zeros((7,) + batch, U32)])
    dm = degen[None]
    X3 = jnp.where(dm, jnp.broadcast_to(gx, x3.shape), x3)
    Y3 = jnp.where(dm, jnp.broadcast_to(gy, y3.shape), y3)
    Z3 = jnp.where(dm, one, z3n)
    return X3, Y3, Z3, degen


def _const_rows(v: int):
    """(8, 128) uint32: limb rows of a field constant, lane-replicated."""
    limbs = np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)],
                     np.uint32)
    return np.repeat(limbs[:, None], 128, axis=1)


def _scan_kernel_body(steps: int):
    def kernel(cx_ref, cy_ref, gx_ref, gy_ref, x_ref, y_ref, z_ref,
               xo_ref, yo_ref, zo_ref, xs_ref, zs_ref, dg_ref):
        # state blocks: (8, R, 128); constant points ride as (8, 128)
        # inputs (Pallas kernels may not capture array constants)
        R = x_ref.shape[1]
        bc = lambda ref: jnp.broadcast_to(               # noqa: E731
            ref[:][:, None, :], (8, R, 128))
        cx, cy, gx, gy = bc(cx_ref), bc(cy_ref), bc(gx_ref), bc(gy_ref)

        def body(s, carry):
            X, Y, Z = carry
            xs_ref[:, s] = X                   # emit BEFORE the advance
            zs_ref[:, s] = Z
            X3, Y3, Z3, degen = _madd_const(X, Y, Z, cx, cy, gx, gy)
            dg_ref[s] = degen.astype(jnp.uint32)
            return (X3, Y3, Z3)

        X, Y, Z = jax.lax.fori_loop(
            0, steps, body, (x_ref[:], y_ref[:], z_ref[:]))
        xo_ref[:] = X
        yo_ref[:] = Y
        zo_ref[:] = Z
    return kernel


@functools.lru_cache(maxsize=None)
def _scan_call(total: int, steps: int, interpret: bool, rows: int):
    # the grid must cover total//128 lane rows EXACTLY: a non-dividing
    # `rows` would truncate the grid and silently never walk the trailing
    # lane blocks — shrink to the largest divisor of total//128 instead
    n_rows = total // 128
    rows = min(rows, n_rows)
    while n_rows % rows:
        rows -= 1
    grid = n_rows // rows
    st = pl.BlockSpec((8, rows, 128), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
    # emissions are (8, S, rows, 128): step-major within each lane row so
    # the flat (8, S*L) view downstream needs NO transpose
    em = pl.BlockSpec((8, steps, rows, 128), lambda i: (0, 0, i, 0),
                      memory_space=pltpu.VMEM)
    dg = pl.BlockSpec((steps, rows, 128), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    n3 = total // 128
    return pl.pallas_call(
        _scan_kernel_body(steps),
        out_shape=(jax.ShapeDtypeStruct((8, n3, 128), U32),
                   jax.ShapeDtypeStruct((8, n3, 128), U32),
                   jax.ShapeDtypeStruct((8, n3, 128), U32),
                   jax.ShapeDtypeStruct((8, steps, n3, 128), U32),
                   jax.ShapeDtypeStruct((8, steps, n3, 128), U32),
                   jax.ShapeDtypeStruct((steps, n3, 128), U32)),
        grid=(grid,),
        in_specs=[cs, cs, cs, cs, st, st, st],
        out_specs=(st, st, st, em, em, dg),
        interpret=interpret,
    )


def giant_scan_pallas(X, Y, Z, cx_int: int, cy_int: int, steps: int,
                      interpret: bool = False):
    """(8, L) Jacobian state -> S-step fused walk. Returns
    (X', Y', Z', Xs, Zs, degen) with Xs/Zs shaped (8, S*L) STEP-MAJOR
    (flat query index = s*L + l, no transpose needed downstream) and
    degen a (S, L) uint32 mask. L must be a multiple of 128."""
    L = X.shape[1]
    assert L % 128 == 0, "lane count must be a multiple of 128"
    call = _scan_call(L, steps, interpret, _rows_for(steps))
    cx = jnp.asarray(_const_rows(cx_int))
    cy = jnp.asarray(_const_rows(cy_int))
    gx = jnp.asarray(_const_rows(ecc.G[0]))
    gy = jnp.asarray(_const_rows(ecc.G[1]))
    r3 = lambda a: a.reshape(8, L // 128, 128)          # noqa: E731
    xo, yo, zo, xs, zs, dg = call(cx, cy, gx, gy, r3(X), r3(Y), r3(Z))
    return (xo.reshape(8, L), yo.reshape(8, L), zo.reshape(8, L),
            xs.reshape(8, steps * L), zs.reshape(8, steps * L),
            dg.reshape(steps, L))


def giant_scan_jnp(X, Y, Z, cx_int: int, cy_int: int, steps: int):
    """Reference/CPU path: same walk as `giant_scan_pallas`, value-level
    with ops.field routing (used under `platform_dependent` on CPU meshes
    and as the parity oracle for the kernel)."""
    L = X.shape[1]
    cx = jnp.broadcast_to(jnp.asarray(u256.from_int(cx_int, (1,))),
                          (8, L)).astype(U32)
    cy = jnp.broadcast_to(jnp.asarray(u256.from_int(cy_int, (1,))),
                          (8, L)).astype(U32)
    gx = jnp.broadcast_to(jnp.asarray(u256.from_int(ecc.G[0], (1,))),
                          (8, L)).astype(U32)
    gy = jnp.broadcast_to(jnp.asarray(u256.from_int(ecc.G[1], (1,))),
                          (8, L)).astype(U32)
    one = jnp.zeros((8, L), U32).at[0].set(1)

    def one_step(carry, _):
        Xc, Yc, Zc = carry
        emit = (Xc, Zc)
        z2 = field.sqr(Zc)
        z3 = field.mul(z2, Zc)
        u2 = field.mul(cx, z2)
        s2 = field.mul(cy, z3)
        h = field.sub(u2, Xc)
        degen = u256.is_zero(field.norm(h))
        r = field.sub(s2, Yc)
        hh = field.sqr(h)
        hhh = field.mul(h, hh)
        t = field.mul(Xc, hh)
        x3 = field.sub(field.sub(field.sqr(r), hhh), field.add(t, t))
        y3 = field.sub(field.mul(r, field.sub(t, x3)), field.mul(Yc, hhh))
        z3n = field.mul(Zc, h)
        dm = degen[None]
        X3 = jnp.where(dm, gx, x3)
        Y3 = jnp.where(dm, gy, y3)
        Z3 = jnp.where(dm, one, z3n)
        return (X3, Y3, Z3), (emit[0], emit[1], degen.astype(U32))

    (Xo, Yo, Zo), (xs, zs, dg) = jax.lax.scan(
        one_step, (X, Y, Z), None, length=steps)
    # match the kernel's step-major flat emission layout
    xs = jnp.moveaxis(xs, 1, 0).reshape(8, steps * L)
    zs = jnp.moveaxis(zs, 1, 0).reshape(8, steps * L)
    return Xo, Yo, Zo, xs, zs, dg


def giant_scan(X, Y, Z, cx_int: int, cy_int: int, steps: int):
    """Backend router: fused Pallas kernel on accelerators, jnp scan on
    CPU lowerings (same `platform_dependent` pattern as ops.field)."""
    if X.shape[1] % 128 != 0 or jax.default_backend() == "cpu":
        return giant_scan_jnp(X, Y, Z, cx_int, cy_int, steps)
    return jax.lax.platform_dependent(
        X, Y, Z,
        cpu=functools.partial(giant_scan_jnp, cx_int=cx_int, cy_int=cy_int,
                              steps=steps),
        default=functools.partial(giant_scan_pallas, cx_int=cx_int,
                                  cy_int=cy_int, steps=steps))


def to_affine_x(Xs, Zs):
    """(8, B) emitted Jacobian pairs -> canonical affine X, via ONE
    shared batched inversion (the deferral that pays for the whole
    redesign)."""
    zi = field.batch_inv(Zs)
    return field.norm(field.mul(Xs, field.sqr(zi)))
