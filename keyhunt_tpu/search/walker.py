"""The batched key-range walker — TPU redesign of the reference's
group-of-1024 thread loop (`thread_process`, `keyhunt.cpp:3265-3861`).

Geometry: a device step materialises A*W points at once from A "pivot"
points and a W-wide offset table strided by the FULL pivot count
(D = advance_mult devices, G = D*A global pivots):

    point[g, j] = pivot_g + (j+1) * (G*stride*G1)     (G1 = generator)
    pivot_g key = k0 + (g + 1 - G)*stride
    => key[g, j] = k0 + ((j+1)*G + g + 1 - G)*stride

so one inner step covers exactly [k0+stride, k0+G*W*stride] and — the
point of the interleaved layout — the NEXT pivot (advance by G*W*stride)
is exactly the last offset column, point[g, W-1]. The pivot advance
therefore costs nothing: no extra slope denominators, no separate
lambda/x3/y3 chain, and the batched inversion is over exactly A*W
elements (a power of two — the old +A tail spilled `field.batch_inv`
past a tile-chunk boundary and padded the kernel to 2x the work).

All A*W slope denominators are inverted in ONE `field.batch_inv` (the
reference amortises one ModInv per 1024 points; here it is one Fermat
inversion per A*W points). The scan repeats S times per device call, so
one dispatch covers S*G*W keys across all devices.

Constraint inherited from the group trick: pivot keys must never coincide
with ±offset keys (slope denominator would be 0 — the reference avoids the
same case by centering groups past CPU_GRP_SIZE/2, `keyhunt.cpp:3352`).
The engine guarantees k0 > (G*W + G - 1)*stride and covers smaller keys on
host; the symmetric keyspace-top hazard is capped the same way.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field, curve, match, hash160 as h160

U32 = jnp.uint32

#: variants (candidate forms checked per computed point) per mode
MODE_VARIANTS = {
    "xpoint": ("x",),
    "compressed": ("02", "03"),
    "uncompressed": ("04",),
    "both": ("02", "03", "04"),
    "eth": ("eth",),
}

#: with endomorphism (-e): additionally check beta*X and beta^2*X — the
#: points of keys lambda*k / lambda^2*k (keyhunt.cpp:3408-3440; x6/x3
#: counting, keyhunt.cpp:2883-2891)
ENDO_VARIANTS = {
    "xpoint": ("x", "bx", "b2x"),
    "compressed": ("02", "03", "02b", "03b", "02b2", "03b2"),
}

#: lambda-power by variant (for key reconstruction on the host)
VARIANT_ENDO_POWER = {
    "x": 0, "02": 0, "03": 0, "04": 0, "eth": 0,
    "bx": 1, "02b": 1, "03b": 1,
    "b2x": 2, "02b2": 2, "03b2": 2,
}


@dataclass(frozen=True)
class WalkerConfig:
    pivots: int = 32          # A
    width: int = 1024         # W
    steps: int = 8            # inner lax.scan steps per device call
    stride: int = 1           # key stride (-I flag in the reference)
    mode: str = "compressed"
    max_hits: int = 8         # top-k hit slots per inner step
    # vanity ranges as a static tuple of (lo0, lo1, hi0, hi1) BE word pairs
    # (io.targets.ranges_to_words); when non-empty the probe is replaced by
    # hash160-in-range compares (thread_process_vanity, keyhunt.cpp:3867).
    vanity: tuple = ()
    # GLV endomorphism x6/x3 search (-e). Compressed/xpoint only (the
    # reference's incompatibility checks, keyhunt.cpp:1185-1194).
    endo: bool = False

    def __post_init__(self):
        if self.endo and self.mode not in ("compressed", "xpoint"):
            raise ValueError("endomorphism requires compressed or xpoint mode")

    @property
    def batch(self) -> int:
        return self.pivots * self.width

    @property
    def keys_per_call(self) -> int:
        return self.steps * self.batch

    @property
    def variants(self) -> tuple[str, ...]:
        if self.endo:
            return ENDO_VARIANTS[self.mode]
        return MODE_VARIANTS[self.mode]

    @property
    def keys_per_point(self) -> int:
        """Effective keys checked per computed point (the x2/x6/x3
        counting rules of `keyhunt.cpp:2883-2891`)."""
        if self.endo:
            return 6 if self.mode == "compressed" else 3
        return 2 if self.mode == "compressed" else 1


def _needs_y(mode: str) -> bool:
    return mode in ("uncompressed", "both", "eth")


@functools.lru_cache(maxsize=None)
def make_step_fn(cfg: WalkerConfig, jit: bool = True, advance_mult: int = 1,
                 shift: int | None = None):
    """Build the device step: (px, py, t0, t1) -> (px', py', hits, counts).

    hits: (S, K) int32 flat indices into the (V, A, W) candidate space of
    each inner step, -1 padded; counts: (S,) total hits (detects K
    saturation). t0/t1: probe table — runtime arguments, so the
    (expensive) compile is shared across target sets of the same padded
    size. With `shift` set (the product path) they are direct-indexed
    BUCKET SLABS (ops.match.build_buckets; bucket = w >> shift) and the
    probe is one row gather + compare. With shift=None they are the plain
    sorted arrays probed by `match.probe` — searchsorted lowers to a
    while-loop of gathers that costs ~150x more composed (832 ms vs 38 ms
    per step measured at a 32-entry table on the TPU toolchain); kept only
    for micro-tools and tests. jit=False returns the raw traceable fn (for
    shard_map composition).

    advance_mult: the device count D of the sharded walker. It scales the
    offset-table stride to G = D*A global pivots so the devices walk
    interleaved lanes — every device's pivots land exactly one global span
    (D*A*W) ahead after each inner step, keeping chained calls contiguous
    without reseeding (same convention as the sharded BSGS lanes,
    parallel/bsgs_sharded.py).
    """
    A, W, S = cfg.pivots, cfg.width, cfg.steps
    gtx, gty = curve.offset_table_strided(W, advance_mult * A * cfg.stride)
    gtx, gty = jnp.asarray(gtx), jnp.asarray(gty)
    want_y = _needs_y(cfg.mode)

    if shift is None:
        def probe(t0c, t1c, a, b):
            return match.probe(t0c, t1c, a, b)
    else:
        def probe(t0c, t1c, a, b):
            hit, _ = match.probe_buckets(t0c, t1c, a.reshape(-1),
                                         b.reshape(-1), shift)
            return hit.reshape(a.shape)

    def one_step(carry, _, t0c, t1c):
        px, py = carry                                   # (8, A)
        dx_main = field.sub(gtx[:, None, :], px[:, :, None])   # (8, A, W)
        # the engine's key bounds guarantee no pivot == ±offset, so every
        # denominator is nonzero and no doubling/infinity select is needed
        inv_main = field.batch_inv(dx_main.reshape(8, A * W)).reshape(8, A, W)

        pxb, pyb = px[:, :, None], py[:, :, None]
        qxb, qyb = gtx[:, None, :], gty[:, None, :]
        if want_y:
            x3, y3 = curve.add_with_inv(pxb, pyb, qxb, qyb, inv_main)
            yn = field.norm(y3)
        else:
            x3 = curve.add_with_inv(pxb, pyb, qxb, qyb, inv_main, want_y=False)
            yn = None
        xn = field.norm(x3)

        if cfg.vanity:
            from ..ops.sha256 import bswap32

            def vmask(h):
                hb0, hb1 = bswap32(h[0]), bswap32(h[1])
                m = jnp.zeros(hb0.shape, bool)
                for lo0, lo1, hi0, hi1 in cfg.vanity:
                    ge = (hb0 > np.uint32(lo0)) | ((hb0 == np.uint32(lo0)) & (hb1 >= np.uint32(lo1)))
                    le = (hb0 < np.uint32(hi0)) | ((hb0 == np.uint32(hi0)) & (hb1 <= np.uint32(hi1)))
                    m = m | (ge & le)
                return m

        x_variants = [xn]
        if cfg.endo:
            bx, b2x = curve.endo_x(xn)
            x_variants += [field.norm(bx), field.norm(b2x)]
        masks = []
        for xv in x_variants:
            if cfg.mode == "xpoint":
                masks.append(probe(t0c, t1c, xv[7], xv[6]))
            if cfg.mode in ("compressed", "both"):
                h02, h03 = h160.hash160_both_prefixes(xv)
                for h in (h02, h03):
                    masks.append(vmask(h) if cfg.vanity
                                 else probe(t0c, t1c, h[0], h[1]))
        if cfg.mode in ("uncompressed", "both"):
            h04 = h160.hash160_uncompressed(xn, yn)
            masks.append(vmask(h04) if cfg.vanity
                         else probe(t0c, t1c, h04[0], h04[1]))
        if cfg.mode == "eth":
            he = h160.eth_address_words(xn, yn)
            masks.append(probe(t0c, t1c, he[0], he[1]))

        mask_flat = jnp.stack(masks).reshape(-1)          # (V*A*W,)
        hits, count = match.topk_indices(mask_flat, cfg.max_hits)

        # pivot advance is FREE: pivot + G*W*stride*G1 is exactly the last
        # offset column. Its Y (not needed for the X-only modes' probes) is
        # one extra (8, A)-sized lambda reconstruction from the shared inv.
        px2 = xn[:, :, -1]
        if want_y:
            py2 = yn[:, :, -1]
        else:
            lam_l = field.mul(field.sub(gty[:, -1:], py), inv_main[:, :, -1])
            py2 = field.norm(
                field.sub(field.mul(lam_l, field.sub(px, x3[:, :, -1])), py))
        return (px2, py2), (hits, count)

    def step(px, py, t0, t1):
        body = lambda carry, x: one_step(carry, x, t0, t1)   # noqa: E731
        (px2, py2), (hits, counts) = jax.lax.scan(body, (px, py), None, length=S)
        # ONE host-bound output per call: every separate fetch costs a
        # ~14 ms tunnel round trip regardless of size (measured), so hits
        # and counts ship as a single (S, K+1) int32 array
        packed = jnp.concatenate(
            [hits, counts[:, None].astype(jnp.int32)], axis=1)
        return px2, py2, packed

    return jax.jit(step) if jit else step


def decode_hit(cfg: WalkerConfig, k0: int, step_idx: int, flat_idx: int):
    """Map a device hit back to (variant, key). Inverse of the walker's
    (V, A, W) flattening; key = k0 + (s*A*W + (j+1)*A + a + 1 - A)*stride
    (interleaved geometry — see module docstring)."""
    aw = cfg.batch
    A, W = cfg.pivots, cfg.width
    v = flat_idx // aw
    r = flat_idx % aw
    a, j = divmod(r, W)
    key = k0 + (step_idx * aw + (j + 1) * A + a + 1 - A) * cfg.stride
    return cfg.variants[v], key


def seed_pivots(cfg: WalkerConfig, k0: int):
    """Host: pivot points for base key k0 — pivot_a key =
    k0 + (a + 1 - A)*stride (the A keys immediately at/below k0)."""
    A = cfg.pivots
    keys = [k0 + (a + 1 - A) * cfg.stride for a in range(A)]
    x, y = curve.points_for_keys(keys)
    return jnp.asarray(x), jnp.asarray(y)
