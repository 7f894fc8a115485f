"""256-bit unsigned integer arithmetic on limb-major uint32 arrays.

Layout: a batch of 256-bit integers is a uint32 array of shape ``(8, ...)``
— eight little-endian 32-bit limbs along axis 0, arbitrary batch axes
behind. Limb-major keeps the *batch* on the TPU lane dimension (last dims),
so every limb operation is a full-width VPU op; a batch-major ``(B, 8)``
layout would waste 120 of 128 lanes per tile.

The reference stores one scalar as 5x64-bit limbs with x86 carry intrinsics
(`secp256k1/Int.h:27-38,198-331`). TPUs have no 64-bit scalar datapath or
add-with-carry, so this module re-derives carries from uint32 compares and
multiplies via 16-bit half-limbs (products of 16-bit values fit uint32
exactly).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

NLIMBS = 8
NHALF = 16
U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers.
# ---------------------------------------------------------------------------

def from_int(v: int, shape: tuple = ()) -> np.ndarray:
    """Python int -> (8, *shape) uint32 limb array (numpy, host-side)."""
    v = int(v) & (2**256 - 1)
    limbs = np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(NLIMBS)], dtype=np.uint32)
    arr = limbs.reshape((NLIMBS,) + (1,) * len(shape))
    return np.ascontiguousarray(np.broadcast_to(arr, (NLIMBS,) + tuple(shape)))


def from_ints(vals, shape: tuple | None = None) -> np.ndarray:
    """Iterable of ints -> (8, len(vals)) uint32 (or reshaped to (8, *shape))."""
    vals = [int(v) & (2**256 - 1) for v in vals]
    out = np.zeros((NLIMBS, len(vals)), dtype=np.uint32)
    for col, v in enumerate(vals):
        for i in range(NLIMBS):
            out[i, col] = (v >> (32 * i)) & 0xFFFFFFFF
    if shape is not None:
        out = out.reshape((NLIMBS,) + tuple(shape))
    return out


def to_ints(a) -> list[int]:
    """(8, ...) limb array -> flat list of Python ints (host-side)."""
    a = np.asarray(a).reshape(NLIMBS, -1)
    shifts = [32 * i for i in range(NLIMBS)]
    return [sum(int(a[i, c]) << shifts[i] for i in range(NLIMBS)) for c in range(a.shape[1])]


def to_int(a) -> int:
    (v,) = to_ints(a)
    return v


def bcast_const(v: int, ndim: int) -> np.ndarray:
    """Constant as (8, 1, 1, ...) for broadcasting against (8, *batch)."""
    return from_int(v).reshape((NLIMBS,) + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# Add / subtract with carry chains.
# ---------------------------------------------------------------------------

def add256(a, b):
    """(a + b) mod 2^256 and the carry-out bit (uint32 0/1)."""
    outs = []
    carry = None
    for i in range(NLIMBS):
        s = a[i] + b[i]
        c1 = (s < a[i]).astype(U32)
        if carry is None:
            outs.append(s)
            carry = c1
        else:
            s2 = s + carry
            c2 = (s2 < s).astype(U32)
            outs.append(s2)
            carry = c1 | c2
    return jnp.stack(outs), carry


def sub256(a, b):
    """(a - b) mod 2^256 and the borrow-out bit (uint32 0/1)."""
    outs = []
    borrow = None
    for i in range(NLIMBS):
        d = a[i] - b[i]
        b1 = (a[i] < b[i]).astype(U32)
        if borrow is None:
            outs.append(d)
            borrow = b1
        else:
            d2 = d - borrow
            b2 = (d < borrow).astype(U32)
            outs.append(d2)
            borrow = b1 | b2
    return jnp.stack(outs), borrow


def geq(a, b):
    """a >= b, elementwise over the batch; returns bool array of batch shape."""
    _, borrow = sub256(a, b)
    return borrow == 0


def eq(a, b):
    """a == b elementwise over the batch (limbwise compare)."""
    acc = a[0] == b[0]
    for i in range(1, NLIMBS):
        acc = acc & (a[i] == b[i])
    return acc


def is_zero(a):
    acc = a[0] == 0
    for i in range(1, NLIMBS):
        acc = acc & (a[i] == 0)
    return acc


# ---------------------------------------------------------------------------
# Half-limb (16-bit) expansion for multiplication.
# ---------------------------------------------------------------------------

def to_halves(a):
    """(8, ...) 32-bit limbs -> (16, ...) 16-bit half-limbs (values < 2^16).

    Vectorised interleave: [l0.lo, l0.hi, l1.lo, l1.hi, ...]."""
    lo = a & MASK16
    hi = a >> 16
    return jnp.stack([lo, hi], axis=1).reshape((NHALF,) + a.shape[1:])


def from_halves(h):
    """(16, ...) canonical halves (< 2^16) -> (8, ...) limb array."""
    if isinstance(h, (list, tuple)):
        h = jnp.stack(h)
    return h[0::2] | (h[1::2] << 16)


@functools.lru_cache(maxsize=None)
def _diag_masks(ndim: int):
    """Masks selecting the two interleaved anti-diagonal families after the
    (16,17)->(17,16) reshape (see `_diag_sums`)."""
    q = np.arange(17)[:, None]
    r = np.arange(16)[None, :]
    shape = (17, 16) + (1,) * (ndim - 2)
    low = (q <= r).astype(np.uint32).reshape(shape)
    high = (q >= r + 2).astype(np.uint32).reshape(shape)
    return low, high


def _diag_sums(grid):
    """Anti-diagonal sums of a (16, 16, *batch) grid -> (32, *batch).

    out[k] = sum_{i+j=k} grid[i, j]. Pad each row to width 17 and reshape
    to (17, 16): flat index 17*i + j = 16*i + (i+j), so anti-diagonal k
    lands in column k mod 16, split between two disjoint row bands (rows
    <= r hold diagonal r; rows >= r+2 hold diagonal r+16). Two masked
    column sums recover all 31 diagonals in O(1) ops instead of 256
    unrolled adds.
    """
    batch = grid.shape[2:]
    padded = jnp.pad(grid, ((0, 0), (0, 1)) + ((0, 0),) * len(batch))
    resh = padded.reshape((17, 16) + batch)
    mask_low, mask_high = _diag_masks(resh.ndim)
    low = (resh * mask_low).sum(axis=0, dtype=U32)    # diagonals 0..15
    high = (resh * mask_high).sum(axis=0, dtype=U32)  # diagonals 16..31
    return jnp.concatenate([low, high], axis=0)


def mul_512_halves(a, b):
    """Full 256x256 -> 512-bit product as 32 canonical 16-bit halves.

    Schoolbook over 16-bit half-limbs as a single (16,16,B) outer product:
    each 16x16 product fits uint32; lo/hi 16-bit parts are summed per
    column via `_diag_sums`. Column accumulators stay < 2^21 (<= 32 terms
    of < 2^16), so one final sequential carry sweep canonicalises.
    Replaces the `imm_umul`/__umulh carry chains of the reference
    (`secp256k1/IntMod.cpp:855-915`) with branch-free lane arithmetic.
    """
    ah = to_halves(a)
    bh = to_halves(b)
    p = ah[:, None] * bh[None, :]          # (16, 16, *batch)
    lo = p & MASK16
    hi = p >> 16
    acc = _diag_sums(lo)                    # contributes at column k
    acc_hi = _diag_sums(hi)                 # contributes at column k+1
    zeros = jnp.zeros((1,) + acc.shape[1:], U32)
    acc = acc + jnp.concatenate([zeros, acc_hi[:31]], axis=0)
    out, _ = carry_sweep(acc, 32)
    return out


def sqr_512_halves(a):
    """Squaring: currently delegates to the generic product (the vectorised
    outer product already costs a single multiply op; triangle savings come
    later with a Pallas kernel)."""
    return mul_512_halves(a, a)


def carry_sweep(acc, n: int):
    """Sequential carry propagation over n columns -> (canonical halves
    stacked (n, *batch), final carry-out array)."""
    out = []
    c = None
    for k in range(n):
        v = acc[k] if c is None else acc[k] + c
        out.append(v & MASK16)
        c = v >> 16
    return jnp.stack(out), c
