"""Pallas TPU kernels for secp256k1 field multiplication.

Why a kernel: the jnp modmul (`ops.field.mul`) expands to ~10^3 elementwise
uint32 ops whose intermediates XLA only partially fuses — at walker batch
sizes every unfused op round-trips (8, B) uint32 arrays through HBM, and
the walk becomes bandwidth-bound at a few Mkeys/s. This kernel computes
the whole 256x256->512 product and the mod-p fold inside VMEM, so one
multiply moves 96 bytes per element (two reads, one write) instead of
kilobytes.

Algorithm (same math as ops.field.mul / ops.u256.mul_512_halves, laid out
Mosaic-friendly):
  - operands split limbwise into lo/hi 16-bit halves: alo/ahi (8, T)
  - schoolbook over half-products accumulated into EVEN/ODD half-column
    accumulators via static-slice adds (convolution c[k] = sum a_i b_j,
    i+j=k, k = 2e | 2o+1); every term <= 2^16 after lo/hi split, <= 32
    terms per column -> columns < 2^21, no wrap
  - three mod-p folds (2^256 = D = 2^32 + 977): H*D contributes
    977*h[t] at t and h[t] at t+2; bounds tracked in comments
  - one sequential 16-row carry ripple + final-carry fold + pack to
    (8, T) uint32 limbs (lazy representation, < 2^256 — same contract as
    ops.field).

The reference's equivalent is the x86 carry-chain `ModMulK1`
(`secp256k1/IntMod.cpp:855-915`); here the carry machinery is re-derived
for 8x128 uint32 lanes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
M16 = np.uint32(0xFFFF)
C977 = np.uint32(977)

#: batch elements per grid block (rows = TILE/128 sublanes x 128 lanes);
#: VMEM footprint ~ TILE * 250 bytes (inputs + output + conv scratch)
TILE = 8192


def _conv_terms(a, b, i: int):
    """Half-products of limb i of `a` against all of `b`, pre-split into
    the four accumulation groups (see `_conv_halves`). Each term < 2^16."""
    alo_i, ahi_i = a[i] & M16, a[i] >> 16
    blo, bhi = b & M16, b >> 16
    p_ll = alo_i * blo                 # weight 2i + 2j
    p_lh = alo_i * bhi                 # weight 2i + 2j + 1
    p_hl = ahi_i * blo                 # weight 2i + 2j + 1
    p_hh = ahi_i * bhi                 # weight 2i + 2j + 2
    even_at_i = p_ll & M16
    odd_at_i = (p_ll >> 16) + (p_lh & M16) + (p_hl & M16)
    even_at_i1 = (p_lh >> 16) + (p_hl >> 16) + (p_hh & M16)
    odd_at_i1 = p_hh >> 16
    return even_at_i, odd_at_i, even_at_i1, odd_at_i1


def _conv_halves(a, b):
    """(8, T) u32 limbs x2 -> (even, odd) half-column accumulators.

    even: (17, T), even[e] accumulates half-columns k = 2e (e = 0..16);
    odd: (16, T), odd[o] accumulates k = 2o+1. All entries < 2^21.

    Pure-jnp variant (tests / XLA path): accumulates via zero-padded adds.
    The Pallas kernel uses VMEM scratch refs instead (`_mul_kernel`) —
    Mosaic supports slice stores on refs but not value-level slice updates.
    """
    batch = a.shape[1:]
    even = jnp.zeros((17,) + batch, U32)
    odd = jnp.zeros((16,) + batch, U32)
    zrow = jnp.zeros((1,) + batch, U32)

    def pad_to(p, lead, total):
        segs = []
        if lead:
            segs.append(jnp.broadcast_to(zrow, (lead,) + batch))
        segs.append(p)
        tail = total - lead - p.shape[0]
        if tail:
            segs.append(jnp.broadcast_to(zrow, (tail,) + batch))
        return jnp.concatenate(segs, axis=0)

    for i in range(8):
        e_i, o_i, e_i1, o_i1 = _conv_terms(a, b, i)
        even = even + pad_to(e_i, i, 17) + pad_to(e_i1, i + 1, 17)
        odd = odd + pad_to(o_i, i, 16) + pad_to(o_i1, i + 1, 16)
    return even, odd


def _conv_halves_sqr(a):
    """Value-level squaring convolution (for code embedded in OTHER
    kernels, e.g. the fused Jacobian giant walk, where scratch refs are
    not available): pairs (i, j) and (j, i) contribute identically, so
    only j >= i is computed and the off-diagonal tail doubled — 144
    half-multiplies instead of 256 (same trick as
    `_accumulate_conv_sqr`, accumulate-by-padding like `_conv_halves`)."""
    batch = a.shape[1:]
    even = jnp.zeros((17,) + batch, U32)
    odd = jnp.zeros((16,) + batch, U32)
    zrow = jnp.zeros((1,) + batch, U32)

    def pad_to(p, lead, total):
        segs = []
        if lead:
            segs.append(jnp.broadcast_to(zrow, (lead,) + batch))
        segs.append(p)
        tail = total - lead - p.shape[0]
        if tail:
            segs.append(jnp.broadcast_to(zrow, (tail,) + batch))
        return jnp.concatenate(segs, axis=0)

    for i in range(8):
        tail = a[i:]
        alo_i, ahi_i = a[i] & M16, a[i] >> 16
        blo, bhi = tail & M16, tail >> 16
        p_ll = alo_i * blo
        p_lh = alo_i * bhi
        p_hl = ahi_i * blo
        p_hh = ahi_i * bhi
        e_i = p_ll & M16
        o_i = (p_ll >> 16) + (p_lh & M16) + (p_hl & M16)
        e_i1 = (p_lh >> 16) + (p_hl >> 16) + (p_hh & M16)
        o_i1 = p_hh >> 16
        if i < 7:
            dbl = jnp.concatenate(
                [jnp.zeros((1,) + e_i.shape[1:], U32),
                 jnp.ones((8 - i - 1,) + e_i.shape[1:], U32)])
            e_i = e_i + e_i * dbl
            o_i = o_i + o_i * dbl
            e_i1 = e_i1 + e_i1 * dbl
            o_i1 = o_i1 + o_i1 * dbl
        k = 2 * i                 # column of the (i, i) term is i + j = 2i
        even = even + pad_to(e_i, k, 17) + pad_to(e_i1, k + 1, 17)
        odd = odd + pad_to(o_i, k, 16) + pad_to(o_i1, k + 1, 16)
    return even, odd


def _finish(even, odd):
    """Fold the 33 half-columns mod p and pack to (8, T) uint32 limbs.
    Rows are kept (1, T)-shaped throughout (Mosaic-friendly 2-D ops)."""
    # rows[k] for k = 0..32; each < 2^21
    rows = []
    for k in range(33):
        e = k // 2
        rows.append(even[e:e + 1] if k % 2 == 0 else odd[e:e + 1])

    # ---- fold 1: L[0..15] += H*D, H = rows 16..32 (17 rows, < 2^21) ------
    # D = 2^32 + 977 -> half-pattern [977 @ +0, 1 @ +2]
    l2 = list(rows[:16]) + [jnp.zeros_like(rows[0]) for _ in range(3)]
    for t in range(17):
        l2[t] = l2[t] + rows[16 + t] * C977
        l2[t + 2] = l2[t + 2] + rows[16 + t]
    # bounds: 2^21 + 977*2^21 + 2^21 < 2^31.01 — fits u32

    # ---- compact: split lo/hi so rows drop below 2^17 --------------------
    l3 = [l2[k] & M16 for k in range(19)] + [jnp.zeros_like(rows[0])]
    for k in range(19):
        l3[k + 1] = l3[k + 1] + (l2[k] >> 16)
    # rows < 2^16 + 2^16 = 2^17; rows 16..19 are the new overflow T2

    # ---- fold 2: T2 = rows 16..19 (< 2^17) -------------------------------
    for t in range(4):
        l3[t] = l3[t] + l3[16 + t] * C977
        l3[t + 2] = l3[t + 2] + l3[16 + t]
    l4 = l3[:16]
    # rows < 2^17 + 977*2^17 + 2^17 < 2^27.3

    # ---- compact again ----------------------------------------------------
    l5 = [l4[k] & M16 for k in range(16)]
    hi_out = l4[15] >> 16                      # row16 overflow, < 2^12
    for k in range(15):
        l5[k + 1] = l5[k + 1] + (l4[k] >> 16)
    # rows < 2^16 + 2^12

    # ---- fold 3: the < 2^12 overflow row ----------------------------------
    l5[0] = l5[0] + hi_out * C977              # < 2^16 + 2^12 + 2^22
    l5[2] = l5[2] + hi_out

    # ---- ripple 1: sequential carry to canonical halves -------------------
    carry = jnp.zeros_like(l5[0])
    out_rows = []
    for k in range(16):
        v = l5[k] + carry
        out_rows.append(v & M16)
        carry = v >> 16
    # total value < 2^256 + eps => carry out <= 1; fold it (D = [977, _, 1])
    out_rows[0] = out_rows[0] + carry * C977
    out_rows[2] = out_rows[2] + carry
    # ---- ripple 2: settle the tiny tail ------------------------------------
    carry = jnp.zeros_like(carry)
    final = []
    for k in range(16):
        v = out_rows[k] + carry
        final.append(v & M16)
        carry = v >> 16
    # carry here is 0: value after fold < 2^256 (it was <= D*1 + tiny)

    # ---- pack halves to u32 limbs ------------------------------------------
    return jnp.concatenate([final[2 * i] | (final[2 * i + 1] << 16)
                            for i in range(8)], axis=0)


def _mul_mod_p(a, b):
    """Pure-jnp core: (8, T) x (8, T) -> (8, T), mod p, lazy (< 2^256).
    The XLA/test path; the kernel uses scratch refs for the conv stage."""
    even, odd = _conv_halves(a, b)
    return _finish(even, odd)


def _sqr_mod_p(a):
    """Value-level squaring core: 144 half-products instead of 256 (for
    embedding in other kernels — the fused giant walk squares 3 of its
    11 modmuls per step)."""
    even, odd = _conv_halves_sqr(a)
    return _finish(even, odd)


def _accumulate_conv(a, b, ev_ref, od_ref):
    """Kernel-side convolution: accumulate half-products into VMEM scratch
    refs via static-slice stores (Mosaic supports ref slice updates; it has
    no value-level scatter/DUS)."""
    ev_ref[:] = jnp.zeros(ev_ref.shape, U32)
    od_ref[:] = jnp.zeros(od_ref.shape, U32)
    for i in range(8):
        e_i, o_i, e_i1, o_i1 = _conv_terms(a, b, i)
        ev_ref[i:i + 8] = ev_ref[i:i + 8] + e_i
        ev_ref[i + 1:i + 9] = ev_ref[i + 1:i + 9] + e_i1
        od_ref[i:i + 8] = od_ref[i:i + 8] + o_i
        od_ref[i + 1:i + 9] = od_ref[i + 1:i + 9] + o_i1


def _accumulate_conv_sqr(a, ev_ref, od_ref):
    """Squaring convolution: limb pairs (i, j) and (j, i) contribute the
    same four half-products to the same columns (the odd accumulator is
    symmetric in its lh/hl terms), so only pairs j >= i are computed and
    the j > i tail is doubled — 144 half-multiplies instead of 256.
    Column bounds are unchanged (the doubled sums equal the full sums)."""
    ev_ref[:] = jnp.zeros(ev_ref.shape, U32)
    od_ref[:] = jnp.zeros(od_ref.shape, U32)
    for i in range(8):
        # products of limb i against limbs j = i..7 only
        tail = a[i:]
        alo_i, ahi_i = a[i] & M16, a[i] >> 16
        blo, bhi = tail & M16, tail >> 16
        p_ll = alo_i * blo
        p_lh = alo_i * bhi
        p_hl = ahi_i * blo
        p_hh = ahi_i * bhi
        e_i = p_ll & M16
        o_i = (p_ll >> 16) + (p_lh & M16) + (p_hl & M16)
        e_i1 = (p_lh >> 16) + (p_hl >> 16) + (p_hh & M16)
        o_i1 = p_hh >> 16
        # double the j > i rows (row 0 of each term is the diagonal j == i)
        if i < 7:
            dbl = jnp.concatenate([jnp.zeros((1,) + e_i.shape[1:], U32),
                                   jnp.ones((8 - i - 1,) + e_i.shape[1:], U32)])
            e_i = e_i + e_i * dbl
            o_i = o_i + o_i * dbl
            e_i1 = e_i1 + e_i1 * dbl
            o_i1 = o_i1 + o_i1 * dbl
        k = 2 * i            # column of the (i, i) term is i + j = 2i
        ev_ref[k:k + (8 - i)] = ev_ref[k:k + (8 - i)] + e_i
        ev_ref[k + 1:k + 1 + (8 - i)] = ev_ref[k + 1:k + 1 + (8 - i)] + e_i1
        od_ref[k:k + (8 - i)] = od_ref[k:k + (8 - i)] + o_i
        od_ref[k + 1:k + 1 + (8 - i)] = od_ref[k + 1:k + 1 + (8 - i)] + o_i1


def _mul_kernel(a_ref, b_ref, o_ref, ev_ref, od_ref):
    _accumulate_conv(a_ref[:], b_ref[:], ev_ref, od_ref)
    o_ref[:] = _finish(ev_ref[:], od_ref[:])


def _sqr_kernel(a_ref, o_ref, ev_ref, od_ref):
    _accumulate_conv_sqr(a_ref[:], ev_ref, od_ref)
    o_ref[:] = _finish(ev_ref[:], od_ref[:])


# Blocks are rank-3 (8 limbs, R sublane-batch, 128 lanes): the batch spans
# BOTH the sublane and lane dims, so the (1, R, 128)-shaped row operations
# of `_finish` are full VPU tiles instead of 1-of-8-sublane strips. The
# (8, B) HBM array reshapes to (8, B/128, 128) for free (minor-dim split).

def _spec(rows):
    return pl.BlockSpec((8, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _scratch(rows):
    return [pltpu.VMEM((17, rows, 128), jnp.uint32),
            pltpu.VMEM((16, rows, 128), jnp.uint32)]


@functools.lru_cache(maxsize=None)
def _mul_call(total: int, tile: int, interpret: bool):
    rows = tile // 128
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((8, total // 128, 128), jnp.uint32),
        grid=(total // tile,),
        in_specs=[_spec(rows), _spec(rows)],
        out_specs=_spec(rows),
        scratch_shapes=_scratch(rows),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _sqr_call(total: int, tile: int, interpret: bool):
    rows = tile // 128
    return pl.pallas_call(
        _sqr_kernel,
        out_shape=jax.ShapeDtypeStruct((8, total // 128, 128), jnp.uint32),
        grid=(total // tile,),
        in_specs=[_spec(rows)],
        out_specs=_spec(rows),
        scratch_shapes=_scratch(rows),
        interpret=interpret,
    )


def _flatten3(a):
    return a.reshape(8, -1, 128)


def supported(shape) -> bool:
    """Kernel path supported for this operand shape? The flat batch must
    tile into (TILE/128, 128) blocks."""
    total = 1
    for d in shape[1:]:
        total *= d
    return total % TILE == 0


def mul(a, b, interpret: bool = False):
    """(a * b) mod p over (8, *batch) uint32 arrays — Pallas kernel path.

    Operands are broadcast against each other on the batch dims first
    (the kernel wants equal shapes); result is lazy (< 2^256), same
    contract as ops.field.mul.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    total = int(np.prod(shape[1:]))
    tile = min(TILE, total)
    out = _mul_call(total, tile, interpret)(_flatten3(a), _flatten3(b))
    return out.reshape(shape)


def sqr(a, interpret: bool = False):
    shape = a.shape
    total = int(np.prod(shape[1:]))
    tile = min(TILE, total)
    out = _sqr_call(total, tile, interpret)(_flatten3(a))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Fused batch inversion (Montgomery's trick) in TWO kernel launches.
#
# Why: on this runtime every executed fusion costs ~0.4 ms regardless of
# size, and the jnp product tree + Fermat chain executes ~100 fusions —
# 46 ms for one batch inversion (measured, B = 2^18). Folding the whole
# tree into kernels pays the launch cost twice:
#   K1  per tile: in-VMEM product tree over the tile's sublane rows ->
#       one (8, rr, 128) "mini-root" block per tile (lane columns stay
#       independent subtrees throughout), PLUS the intermediate level
#       products parked in HBM for K2 (so K2 never re-multiplies the tree).
#   K2  grid step 0: tree-reduce all mini-roots, ONE Fermat inversion
#       (secp256k1 addition chain, 255 sqr + 15 mul in-VMEM), down-sweep
#       to per-tile root inverses kept in VMEM scratch (scratch persists
#       across the sequential grid). Every step: reload its tile's stored
#       levels and down-sweep from its root inverse.
# Total: ~3 mul-equivalents of VMEM compute + 2 launches, vs 3 muls +
# ~100 launches for the value-level tree.
#
# The reference's equivalent is IntGroup::ModInv (one DRS62 xgcd + 3(n-1)
# muls, secp256k1/IntGroup.cpp:36-57); Fermat replaces the xgcd because a
# data-dependent loop has no place on the VPU.
# ---------------------------------------------------------------------------

P_INT = 2**256 - 2**32 - 977


def _inv_chain(x):
    """x^(p-2) via the standard secp256k1 addition chain: 255 squarings +
    15 multiplies (the reference's Fermat path uses the same block
    structure, IntMod.cpp ModInv comments) — vs 510 sequential muls for
    bitwise square-and-multiply. The root inversion runs on one tiny
    (8, 1, 128) block where every op is pure latency, so halving the
    sequential op count halves its wall-clock. Squaring runs stay
    fori_loops to keep Mosaic compile time bounded."""
    def sqr_n(v, n):
        if n == 1:
            return _mul_mod_p(v, v)
        return jax.lax.fori_loop(0, n, lambda i, a: _mul_mod_p(a, a), v)

    m = _mul_mod_p
    x2 = m(sqr_n(x, 1), x)
    x3 = m(sqr_n(x2, 1), x)
    x6 = m(sqr_n(x3, 3), x3)
    x9 = m(sqr_n(x6, 3), x3)
    x11 = m(sqr_n(x9, 2), x2)
    x22 = m(sqr_n(x11, 11), x11)
    x44 = m(sqr_n(x22, 22), x22)
    x88 = m(sqr_n(x44, 44), x44)
    x176 = m(sqr_n(x88, 88), x88)
    x220 = m(sqr_n(x176, 44), x44)
    x223 = m(sqr_n(x220, 3), x3)
    t = m(sqr_n(x223, 23), x22)
    t = m(sqr_n(t, 5), x)
    t = m(sqr_n(t, 3), x2)
    return m(sqr_n(t, 2), x)


#: tree leaves per mini-root row block: Mosaic requires block sublane dims
#: divisible by 8, so per-tile trees stop at 8 sublane rows (8x128 lanes)
_ROOT_ROWS = 8


def _tree_up(lvl, stop_rows: int = 1):
    """In-kernel product tree along the sublane axis: (8, r, 128) halved
    down to (8, stop_rows, 128). Lane columns are independent subtrees."""
    levels = []
    while lvl.shape[1] > stop_rows:
        h = lvl.shape[1] // 2
        a, b = lvl[:, :h], lvl[:, h:]
        levels.append((a, b))
        lvl = _mul_mod_p(a, b)
    return levels, lvl


def _tree_down(inv, levels):
    for a, b in reversed(levels):
        ia = _mul_mod_p(inv, b)
        ib = _mul_mod_p(inv, a)
        inv = jnp.concatenate([ia, ib], axis=1)
    return inv


#: max tiles per fused call — bounds the global-phase VMEM footprint
#: (roots + level scratch + conv temps at ntiles*8 sublane rows)
_MAX_NTILES = 32


@functools.lru_cache(maxsize=None)
def _binv_calls(nchunks: int, ntiles: int, tile: int, interpret: bool):
    rows = tile // 128
    rr = min(_ROOT_ROWS, rows)
    gr = ntiles * rr               # root rows per chunk
    #: per-tile level products parked for the down sweep: inputs of levels
    #: 1..deepest are rows/2 + rows/4 + ... + 2*rr = rows - 2*rr sublane
    #: rows (the deepest product is the emitted mini-root). Persisting them
    #: costs one extra HBM write+read of < the input size; it saves the
    #: down kernel a FULL tile-tree rebuild — 1 of the 4 mul-equivalents
    #: per element the fused inversion used to pay.
    lvl_rows = rows - 2 * rr if rows > rr else 0

    def up_kernel(x_ref, root_ref, *lvl_out):
        levels, root = _tree_up(x_ref[:], rr)
        root_ref[:] = root
        if lvl_rows:
            off = 0
            for a, b in levels[1:]:
                h = a.shape[1]
                lvl_out[0][:, off:off + h, :] = a
                lvl_out[0][:, off + h:off + 2 * h, :] = b
                off += 2 * h

    def down_kernel(x_ref, roots_ref, *rest):
        if lvl_rows:
            lvlin_ref, out_ref, rinv_ref, lvl_ref = rest
        else:
            (out_ref, rinv_ref, lvl_ref), lvlin_ref = rest, None
        # grid is (chunk, tile): each chunk is an independent inversion
        # batch with its own Fermat; its global phase runs at tile 0 and
        # parks per-tile root inverses in scratch for the chunk's tiles
        @pl.when(pl.program_id(1) == 0)
        def _():
            # up-sweep over all mini-roots; level products are parked in
            # scratch (not retained as values) to keep peak VMEM at one
            # mul's conv temps instead of the whole tree
            offs, r, src_off = [], gr, -1
            off = 0
            while r > 1:
                h = r // 2
                src = roots_ref[:] if src_off < 0 else \
                    lvl_ref[:, pl.ds(src_off, r), :]
                prod = _mul_mod_p(src[:, :h], src[:, h:])
                lvl_ref[:, pl.ds(off, h), :] = prod
                offs.append((src_off, off, r))
                src_off, off, r = off, off + h, h

            inv = _inv_chain(lvl_ref[:, pl.ds(src_off, 1), :])
            for s_off, _, r in reversed(offs):
                h = r // 2
                src = roots_ref[:] if s_off < 0 else \
                    lvl_ref[:, pl.ds(s_off, r), :]
                ia = _mul_mod_p(inv, src[:, h:])
                ib = _mul_mod_p(inv, src[:, :h])
                inv = jnp.concatenate([ia, ib], axis=1)
            rinv_ref[:] = inv

        j = pl.program_id(1)
        inv = rinv_ref[:, pl.ds(j * rr, rr), :]
        if lvl_rows:
            # reconstruct the tile's tree from the UP kernel's stored level
            # products instead of re-multiplying it
            x = x_ref[:]
            levels = [(x[:, : rows // 2], x[:, rows // 2:])]
            r, off = rows // 2, 0
            while r > rr:
                h = r // 2
                seg = lvlin_ref[:, off:off + r, :]
                levels.append((seg[:, :h], seg[:, h:]))
                off += r
                r = h
        else:
            levels, _ = _tree_up(x_ref[:], rr)
        out_ref[:] = _tree_down(inv, levels)

    x_spec2 = pl.BlockSpec((8, rows, 128), lambda i, j: (0, i * ntiles + j, 0),
                           memory_space=pltpu.VMEM)
    lvl_spec1 = pl.BlockSpec((8, lvl_rows, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    lvl_spec2 = pl.BlockSpec((8, lvl_rows, 128),
                             lambda i, j: (0, i * ntiles + j, 0),
                             memory_space=pltpu.VMEM)
    up_out = [jax.ShapeDtypeStruct((8, nchunks * gr, 128), jnp.uint32)]
    up_out_specs = [pl.BlockSpec((8, rr, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)]
    if lvl_rows:
        up_out.append(jax.ShapeDtypeStruct(
            (8, nchunks * ntiles * lvl_rows, 128), jnp.uint32))
        up_out_specs.append(lvl_spec1)
    up = pl.pallas_call(
        up_kernel,
        out_shape=up_out,
        grid=(nchunks * ntiles,),
        in_specs=[pl.BlockSpec((8, rows, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=up_out_specs,
        interpret=interpret,
    )
    down_in = [
        x_spec2,                                          # x tile
        pl.BlockSpec((8, gr, 128), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM),            # chunk roots
    ]
    if lvl_rows:
        down_in.append(lvl_spec2)                         # stored levels
    down = pl.pallas_call(
        down_kernel,
        out_shape=jax.ShapeDtypeStruct((8, nchunks * ntiles * rows, 128),
                                       jnp.uint32),
        grid=(nchunks, ntiles),
        in_specs=down_in,
        out_specs=x_spec2,
        scratch_shapes=[pltpu.VMEM((8, gr, 128), jnp.uint32),
                        pltpu.VMEM((8, gr, 128), jnp.uint32)],
        interpret=interpret,
    )
    return up, down


#: limbs of 1 for padding (1^-1 = 1; padded lanes are exact and discarded)
_ONE_COL = np.zeros((8, 1), np.uint32)
_ONE_COL[0, 0] = 1


def batch_inv(x, tile: int | None = None, interpret: bool = False):
    """Elementwise modular inverse of (8, B) lazy values in TWO kernel
    launches. B is padded with ones to whole chunks of MAX_NTILES*tile;
    each chunk is an independent product tree with its own in-kernel
    Fermat root inversion (chunks are extra grid steps, not extra
    launches). Zero elements poison their chunk (same contract as the
    value-level tree)."""
    assert x.ndim == 2
    B = x.shape[1]
    min_tile = 128 if interpret else 128 * _ROOT_ROWS
    tile = tile or min(TILE, max(min_tile, 1 << (B - 1).bit_length()))
    assert tile % min_tile == 0
    chunk = _MAX_NTILES * tile
    nchunks = -(-B // chunk)
    if nchunks == 1:
        ntiles = 1 << (-(-B // tile) - 1).bit_length()
    else:
        ntiles = _MAX_NTILES
    total = nchunks * ntiles * tile
    if total != B:
        pad = jnp.broadcast_to(jnp.asarray(_ONE_COL), (8, total - B))
        x = jnp.concatenate([x, pad], axis=1)
    up, down = _binv_calls(nchunks, ntiles, tile, interpret)
    x3 = x.reshape(8, total // 128, 128)
    ups = up(x3)
    inv3 = down(x3, *ups)
    return inv3.reshape(8, total)[:, :B]
