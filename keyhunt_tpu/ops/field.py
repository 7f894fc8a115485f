"""Batched secp256k1 prime-field arithmetic (mod p = 2^256 - 2^32 - 977).

All values are limb-major ``(8, *batch)`` uint32 arrays (see `ops.u256`).
Representation is *lazy*: values live in [0, 2^256) and are only guaranteed
canonical (< p) after `norm`. Because 2^256 ≡ D (mod p) with
D = 0x1000003D1, every overflow/underflow is folded by adding/subtracting D
— the same fast-reduction identity the reference uses in `ModMulK1`
(`secp256k1/IntMod.cpp:855-915`), done here branch-free on uint32 lanes.

Inversion: `inv` is Fermat (fixed-exponent square-and-multiply, branch-free);
`batch_inv` is Montgomery's trick (`secp256k1/IntGroup.cpp:36-57`) mapped to
two `lax.associative_scan` product sweeps + ONE Fermat inversion, amortising
to a few muls per element at O(log B) depth.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u256
from .u256 import (
    NLIMBS, U32, MASK16,
    add256, sub256, mul_512_halves, sqr_512_halves, from_halves, bcast_const,
)

P_INT = 2**256 - 2**32 - 977
N_INT = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
D_INT = 2**32 + 977          # 2^256 mod p
D977 = np.uint32(977)

# GLV endomorphism X-map constants (SECP256K1.cpp:167-195): multiplying X by
# beta (beta^2) maps the point of key k to the point of key lambda*k
# (lambda^2*k). Used for the x6 endomorphism speedup in address/xpoint modes.
BETA_INT = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
BETA2_INT = 0x851695D49A83F8EF919BB86153CBCB16630FB68AED0A766A3EC693D68E6AFA40


def const(v: int, ndim: int = 2) -> np.ndarray:
    """Field constant broadcastable against (8, *batch) with batch rank ndim-1."""
    return bcast_const(v, ndim)


def _fold_carry(s, carry):
    """s + carry*D (mod 2^256), for carry in {0,1}; result exact (no wrap)."""
    # carry*D as limbs: limb0 = carry*977, limb1 = carry.
    zeros = jnp.zeros_like(s[0])
    dk = jnp.stack([carry * D977, carry] + [zeros] * (NLIMBS - 2))
    s2, c2 = add256(s, dk)
    # second fold: only possible when the first add wrapped, in which case
    # s2 < D and adding D again cannot wrap.
    dk2 = jnp.stack([c2 * D977, c2] + [zeros] * (NLIMBS - 2))
    s3, _ = add256(s2, dk2)
    return s3


def add(a, b):
    """(a + b) mod p, lazy (result < 2^256)."""
    s, c = add256(a, b)
    return _fold_carry(s, c)


def sub(a, b):
    """(a - b) mod p, lazy."""
    d, borrow = sub256(a, b)
    zeros = jnp.zeros_like(d[0])
    dk = jnp.stack([borrow * D977, borrow] + [zeros] * (NLIMBS - 2))
    d2, b2 = sub256(d, dk)
    dk2 = jnp.stack([b2 * D977, b2] + [zeros] * (NLIMBS - 2))
    d3, _ = sub256(d2, dk2)
    return d3


def _reduce_512(h):
    """32 canonical 16-bit halves (512-bit value, stacked (32, *batch)) ->
    lazy 256-bit mod p.

    Folds hi*D into lo three times; accumulator bounds stay < 2^19 so all
    sums fit uint32 before each sequential carry sweep.
    """
    batch = h.shape[1:]
    z1 = jnp.zeros((1,) + batch, U32)
    z2 = jnp.zeros((2,) + batch, U32)
    lo, hi = h[:16], h[16:32]

    # ---- fold 1: lo + hi*977 + (hi << 32) over 18 columns ----------------
    p = hi * D977
    plo, phi = p & MASK16, p >> 16
    acc = (jnp.concatenate([lo, z2]) + jnp.concatenate([plo, z2])
           + jnp.concatenate([z1, phi, z1]) + jnp.concatenate([z2, hi]))
    r, c = u256.carry_sweep(acc, 18)

    # ---- fold 2: r[:16] + T*D where T = r16 + r17<<16 + c<<32 ------------
    u = jnp.stack([r[16], r[17], c])        # halves of T (u[2] tiny)
    pu = u * D977
    pu_lo, pu_hi = pu & MASK16, pu >> 16
    z11 = jnp.zeros((11,) + batch, U32)
    z12 = jnp.zeros((12,) + batch, U32)
    z13 = jnp.zeros((13,) + batch, U32)
    acc2 = (r[:16] + jnp.concatenate([pu_lo, z13])
            + jnp.concatenate([z1, pu_hi, z12])
            + jnp.concatenate([z2, u, z11]))
    r2, c2 = u256.carry_sweep(acc2, 16)

    # ---- fold 3: final 1-bit overflow ------------------------------------
    acc3 = r2 + jnp.concatenate([(c2 * D977)[None], z1, c2[None], z13])
    r3, _ = u256.carry_sweep(acc3, 16)
    return from_halves(r3)


#: multiply backend: "auto" routes big batches through the Pallas kernel on
#: accelerator backends (ops.pallas_field — one fused VMEM kernel instead of
#: hundreds of HBM round-trips), everything else through the jnp path.
#: "jnp" / "pallas" force a path (tests, benchmarks).
_IMPL = "auto"


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("auto", "jnp", "pallas")
    _IMPL = name


def _use_pallas(shape) -> bool:
    if _IMPL == "jnp":
        return False
    from . import pallas_field
    if not pallas_field.supported(shape):
        return False
    if _IMPL == "pallas":
        return True
    return jax.default_backend() != "cpu"


def _mul_jnp(a, b):
    return _reduce_512(mul_512_halves(a, b))


def _sqr_jnp(a):
    return _reduce_512(sqr_512_halves(a))


def mul(a, b):
    """(a * b) mod p, lazy inputs/output."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if _use_pallas(shape):
        from . import pallas_field
        # platform_dependent: one traced graph lowers to the Pallas kernel
        # on accelerators and the jnp expansion on CPU devices — a CPU-mesh
        # shard_map inside a TPU-default process picks the right branch at
        # lowering time (Pallas has no non-interpret CPU lowering).
        return jax.lax.platform_dependent(
            a, b, cpu=_mul_jnp, default=pallas_field.mul)
    return _mul_jnp(a, b)


def sqr(a):
    """(a * a) mod p (saves ~half the half-limb products vs `mul`)."""
    if _use_pallas(a.shape):
        from . import pallas_field
        return jax.lax.platform_dependent(
            a, cpu=_sqr_jnp, default=pallas_field.sqr)
    return _sqr_jnp(a)


def mul_small(a, k: int):
    """a * k mod p for a small (< 2^16) Python-int constant."""
    assert 0 < k < 2**16
    batch = a.shape[1:]
    z1 = jnp.zeros((1,) + batch, U32)
    z13 = jnp.zeros((13,) + batch, U32)
    ah = u256.to_halves(a)
    p = ah * np.uint32(k)
    acc = jnp.concatenate([p & MASK16, z1]) + jnp.concatenate([z1, p >> 16])
    r, c = u256.carry_sweep(acc, 17)
    # fold T = r16 + c<<16 (T < 2^17 * k tiny) back in via T*D
    z12 = jnp.zeros((12,) + batch, U32)
    z14 = jnp.zeros((14,) + batch, U32)
    u = jnp.stack([r[16], c])
    pu = u * D977
    acc2 = (r[:16] + jnp.concatenate([pu & MASK16, z14])
            + jnp.concatenate([z1, pu >> 16, z13])
            + jnp.concatenate([z1, z1, u, z12]))
    r2, c2 = u256.carry_sweep(acc2, 16)
    acc3 = r2 + jnp.concatenate([(c2 * D977)[None], z1, c2[None], z13])
    r3, _ = u256.carry_sweep(acc3, 16)
    return from_halves(r3)


def norm(a):
    """Canonicalise a lazy value into [0, p). One conditional subtract
    suffices because lazy values are < 2^256 < 2p."""
    pc = const(P_INT, a.ndim)
    d, borrow = sub256(a, jnp.broadcast_to(pc, a.shape))
    keep = (borrow != 0)[None]
    return jnp.where(keep, a, d)


def pow_const(x, e: int, unroll: int = 16):
    """x^e mod p for a fixed Python-int exponent.

    MSB-first square-and-multiply as a `lax.scan` over the (static) bit
    string with partial unrolling (scan launch latency on real hardware is
    tens of microseconds per iteration — unrolling amortises it)."""
    assert e >= 1
    bits_list = [int(b) for b in bin(e)[3:]]
    if not bits_list:
        return x
    # pad (with harmless leading ... trailing zero-ops is wrong; pad the
    # FRONT with no-op is also wrong) — instead peel the remainder head
    # statically so scan length divides `unroll`.
    rem = len(bits_list) % unroll
    r = x
    for b in bits_list[:rem]:
        r = sqr(r)
        if b:
            r = mul(r, x)
    tail = bits_list[rem:]
    if not tail:
        return r
    bits = jnp.asarray(np.array(tail, dtype=np.uint32))

    def step(rr, bit):
        rr = sqr(rr)
        rm = mul(rr, x)
        rr = jnp.where(bit != 0, rm, rr)
        return rr, None

    r, _ = jax.lax.scan(step, r, bits, unroll=unroll)
    return r


def _sqr_n(x, n: int):
    for _ in range(n):
        x = sqr(x)
    return x


def inv(x, form: str | None = None):
    """Fermat inversion x^(p-2).

    form='chain': fully unrolled addition chain (~255 sqr + 15 mul, zero
    per-iteration launch overhead — the TPU hot-loop form; replaces the
    branch-heavy DRS62 xgcd of `secp256k1/IntMod.cpp:112-470`).
    form='scan': partially-unrolled lax.scan (small graph, fast compiles —
    the CPU/test form). Default picks by backend. Both verified against
    pow(x, p-2, p) in tests.
    """
    if form is None:
        # scan with large unroll: same sequential-op latency profile as the
        # fully unrolled chain, ~8x smaller graph (compile time dominates
        # on the TPU toolchain: the 43K-op chain form compiled >25 min).
        form = "scan" if jax.default_backend() == "cpu" else "scan32"
    if form == "scan":
        return pow_const(x, P_INT - 2)
    if form == "scan32":
        return pow_const(x, P_INT - 2, unroll=32)
    return _inv_chain(x)


def _inv_chain(x):
    x1 = x
    x2 = mul(sqr(x1), x1)                 # 2^2 - 1 ones
    x3 = mul(sqr(x2), x1)                 # 2^3 - 1
    x6 = mul(_sqr_n(x3, 3), x3)
    x9 = mul(_sqr_n(x6, 3), x3)
    x11 = mul(_sqr_n(x9, 2), x2)
    x22 = mul(_sqr_n(x11, 11), x11)
    x44 = mul(_sqr_n(x22, 22), x22)
    x88 = mul(_sqr_n(x44, 44), x44)
    x176 = mul(_sqr_n(x88, 88), x88)
    x220 = mul(_sqr_n(x176, 44), x44)
    x223 = mul(_sqr_n(x220, 3), x3)
    t = mul(_sqr_n(x223, 23), x22)
    t = mul(_sqr_n(t, 5), x1)
    t = mul(_sqr_n(t, 3), x2)
    t = mul(_sqr_n(t, 2), x1)
    return t


def sqrt(x):
    """Modular square root via x^((p+1)/4) (p ≡ 3 mod 4). Lift-X helper,
    mirrors Secp256K1::GetY (SECP256K1.cpp:675-689). Not hot — scan form."""
    return pow_const(x, (P_INT + 1) // 4)


def batch_inv(x, axis: int = 1):
    """Elementwise modular inverse of a batch: Montgomery's trick as a
    product *tree* + ONE Fermat inversion at the root.

    Up-sweep: pairwise products to the root (B-1 muls); down-sweep: each
    parent inverse yields both child inverses (2 muls per pair). ~3 muls
    per element at O(log B) depth — the TPU mapping of `IntGroup::ModInv`
    (`secp256k1/IntGroup.cpp:36-57`). A flat tree of strided slices
    compiles far faster than lax.associative_scan's recursive interleave
    and does one product sweep instead of two.

    Odd level sizes carry their last element through untouched. Zero
    elements poison the whole batch (as in the reference); callers arrange
    never to invert zero (see walker pivot constraints).
    """
    assert axis in (1, -1) and x.ndim == 2, "expects (8, B)"
    if _IMPL != "jnp" and jax.default_backend() != "cpu":
        # two-launch fused kernel: the value-level tree below executes
        # ~100 fusions and every fusion costs ~0.4 ms on this runtime
        # (46 ms/inversion measured at B=2^18; the kernel pair is ~2 ms).
        # platform_dependent keeps CPU-mesh lowerings on the jnp tree.
        from . import pallas_field
        return jax.lax.platform_dependent(
            x, cpu=_batch_inv_tree, default=pallas_field.batch_inv)
    return _batch_inv_tree(x)


def _batch_inv_tree(x):
    n = x.shape[1]
    # Pad to a power of two with ones (self-inverse, exact): every tree
    # level is then a clean lane-aligned halving — odd level sizes force
    # misaligned slices/concats that each relayout the whole array.
    size = 1 << (n - 1).bit_length()
    if size != n:
        pad = jnp.broadcast_to(const(1, 2), (NLIMBS, size - n)).astype(U32)
        x = jnp.concatenate([x, pad], axis=1)
    # Pairing is (i, i + n/2) — contiguous halves, not even/odd: half
    # slices and concats are free layout ops on TPU lanes, while stride-2
    # slicing and interleaving force a lane shuffle at every tree level.
    #
    # optimization_barrier per level: tree levels feed two consumers each
    # (the next level and the down-sweep); without the fence XLA's
    # producer-fusion duplicates the whole upstream elementwise chain into
    # every consumer, and the step cost explodes ~300x (measured: dx +
    # batch_inv at B=2^18 is 27 ms fused vs 0.1 ms fenced).
    x = jax.lax.optimization_barrier(x)
    stack = []
    cur = x
    while cur.shape[1] > 1:
        h = cur.shape[1] // 2
        a, b = cur[:, :h], cur[:, h:]
        stack.append((a, b))
        cur = jax.lax.optimization_barrier(mul(a, b))
    out = inv(cur)
    for a, b in reversed(stack):
        ia = mul(out, b)
        ib = mul(out, a)
        out = jax.lax.optimization_barrier(
            jnp.concatenate([ia, ib], axis=1))
    return out[:, :n]
