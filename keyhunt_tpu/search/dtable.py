"""Device-resident baby table: built ON the chip, never transferred.

The host-built table (`build_baby_table` + packed slabs) is the density
champion (4 B/slot + host-side perm), but loading it from disk pays a
multi-GB host->device transfer — on the tunneled dev runtime that is
~30 MB/s (~3 min for m=2^30), and even on production hosts it is a cold-
start cost the reference also pays (its 4m11s puzzle-63 run REQUIRES -S
cached .blm/.tbl files, README.md:1160-1191). This module removes the
cost instead of optimizing it: the baby table is built entirely in HBM
by the same batched EC walk that powers the search, with NO sort over m
and NO host arrays.

Layout: two uint32 slabs, direct-indexed by bucket (= w0 >> shift,
exactly like ops.match.build_buckets_packed):
- res_slab: the 32-bit fragment residual (bucket-implied bits dropped);
- j_slab: the baby index j-1 for that slot (0xFFFFFFFF = empty).

The slabs are BUILT flat (nb*maxlen,): XLA's 2-D scatter lowering
inserts a full flattening reshape of the operand — a slab-sized relayout
temp that OOMs a 16 GB chip at m=2^30, seen in the allocation report —
while 1-D scatters update in place. After the build, res_slab is
reshaped ONCE to (nb, maxlen): maxlen is lane-aligned (a multiple of
128), so the split is a layout-preserving bitcast, and every search
probe then uses the fast 2-D row gather (`match.probe_buckets_packed`)
instead of the windowed flat gather, which measured ~30x slower on the
chip (MARQUEE r4 (f)). j_slab stays flat — it is only ever indexed by
single padded positions on hits.

A hit's padded position is decoded by ONE device gather of j_slab (no
host permutation). The j slab doubles the per-slot bytes vs the
host-packed layout (8 B/slot -> m=2^30 in ~13 GiB), the price of
sort-free construction and instant position decode.

Construction per batch (one jitted, donated step — `_build_step`):
1. walk A*W*S points with the shared-inverse group trick
   (`search.bsgs._builder_step` geometry; thread_bPload's role,
   keyhunt.cpp:5284-5472);
2. bucket each fragment; stable-sort the BATCH by bucket (524k elements,
   device-local — no global sort anywhere);
3. within-batch rank via run-start cummax over the sorted buckets;
   slot = fill[bucket] + rank;
4. scatter residuals and j into the slabs (chunked: XLA:TPU scatter
   compile time scales with update count — 64Ki-update scatters compile
   in seconds; a single 512Ki-update scatter took >20 min to compile,
   and an indices_are_sorted variant with a windowed row-count gather
   never finished compiling in 40 min — measured; keep the plain form);
5. fill += per-bucket counts (chunked scatter-add).

maxlen is NOT measured (that would cost a second walk): bucket loads are
Poisson(avg), so maxlen = avg + 8*sqrt(avg), rounded up to a lane
multiple (the flat view is then layout-free), overflows with probability
~1e-9 per table; overflow is COUNTED on device and surfaced — never
silent (VERDICT r3 "no silent caps").
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field, curve, match
from ..ref import ecc                                    # noqa: F401

U32 = jnp.uint32
SENTINEL = np.uint32(0xFFFFFFFF)
#: scatter chunk: compile-friendly update count (see module docstring)
_SCATTER_CHUNK = 65536


def geometry(m: int, avg: int = 256) -> tuple[int, int, int]:
    """(nb, shift, maxlen_padded) for a device table of m entries."""
    nb = 1 << max((m // max(avg, 1)).bit_length() - 1, 1)
    shift = 32 - (nb.bit_length() - 1)
    mean = m / nb
    # 8-sigma Poisson slack, then lane-align (free flat view). The 8.0
    # multiplier doubles as the alignment slack: mean 256 -> exactly 384,
    # not 512 (P(bucket > mean + 8*sqrt(mean)) ~ 1e-14 per bucket; any
    # overflow is still counted and surfaced, never silent).
    maxlen = int(mean + 8.0 * max(mean, 1.0) ** 0.5)
    maxlen = -(-maxlen // 128) * 128
    assert nb * maxlen < (1 << 31), "flat slot index must fit int32"
    return nb, shift, maxlen


class DeviceTable:
    """Duck-types the BabyTable surface BsgsEngine needs: .m, .depth,
    .device_packed(), .pos_to_j(). t0/t1/perm are None (no host arrays
    exist — that is the point)."""

    t0 = t1 = perm = None
    depth = 0

    def __init__(self, m: int, res_slab, j_slab, shift: int, maxlen: int,
                 overflow: int = 0):
        self.m = m
        # device uint32 residuals: (nb, maxlen) after the post-build
        # reshape (fast row-gather probe), or FLAT (nb*maxlen,) if the
        # caller kept the build layout (rows2d=False)
        self.res_slab = res_slab
        self.j_slab = j_slab              # device FLAT (nb*maxlen,) uint32
        self.shift = shift
        self.maxlen = maxlen
        self.overflow = overflow

    @property
    def flat_maxlen(self) -> int | None:
        """maxlen when the slab still needs the windowed FLAT probe
        (`match.probe_buckets_packed_flat`); None once 2-D (the fast
        row-gather probe applies). BsgsEngine keys the probe choice on
        this."""
        return self.maxlen if self.res_slab.ndim == 1 else None

    def device_packed(self, avg: int | None = None):
        return self.res_slab, None, self.shift

    def packed(self, avg: int | None = None):
        return self.res_slab, None, self.shift

    def pos_to_j(self, pos: int) -> int | None:
        """Padded position -> baby j via ONE tiny device gather (rare:
        only called for actual probe hits)."""
        j = int(np.asarray(self.j_slab[int(pos)]))
        return None if j == 0xFFFFFFFF else j + 1


@functools.lru_cache(maxsize=None)
def _build_step(A: int, W: int, S: int, shift: int, maxlen: int, nb: int):
    """One donated build step advancing the table by up to A*W*S babies:
    (res, jsl, fill, ov, px, py, j0, take) -> same tuple advanced.
    `take` (traced) masks the tail batch that overruns m — one compile
    serves every batch of the build."""
    gtx, gty = map(jnp.asarray, curve.offset_table(W))
    spx, spy = map(jnp.asarray, curve.point_const(A * W))
    span = A * W * S
    chunk = min(_SCATTER_CHUNK, span)          # small test geometries
    assert span % chunk == 0

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(res, jsl, fill, ov, px, py, j0, take):
        def one(carry, _):
            px, py = carry
            dx_main = field.sub(gtx[:, None, :], px[:, :, None])
            dx_step = field.sub(spx, px)
            alldx = jnp.concatenate([dx_main.reshape(8, A * W), dx_step],
                                    axis=1)
            inv = field.batch_inv(alldx)
            inv_main = inv[:, : A * W].reshape(8, A, W)
            inv_step = inv[:, A * W:]
            pxb, pyb = px[:, :, None], py[:, :, None]
            x3 = curve.add_with_inv(pxb, pyb, gtx[:, None, :],
                                    gty[:, None, :], inv_main, want_y=False)
            xn = field.norm(x3)
            frag = jnp.stack([xn[7].reshape(-1), xn[6].reshape(-1)])
            px2, py2 = curve.add_with_inv(px, py, spx, spy, inv_step)
            return (field.norm(px2), field.norm(py2)), frag

        (px2, py2), frags = jax.lax.scan(one, (px, py), None, length=S)
        w0 = frags[:, 0, :].reshape(-1)   # step-major == consecutive j
        w1 = frags[:, 1, :].reshape(-1)
        b = jax.lax.shift_right_logical(w0, jnp.uint32(shift)).astype(U32)
        resid = match.pack_residual(w0, w1, shift)
        jm1 = (j0 + jnp.arange(span, dtype=U32)).astype(U32)   # j-1 values
        keep = (jnp.arange(span, dtype=jnp.int32) < take).astype(U32)
        bs, rs, js, ks = jax.lax.sort((b, resid, jm1, keep), num_keys=1,
                                      is_stable=True)
        ar = jnp.arange(span, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.array([True]), bs[1:] != bs[:-1]])
        run_base = jax.lax.cummax(jnp.where(is_start, ar, 0))
        rank = (ar - run_base).astype(U32)
        slot = fill[bs.astype(jnp.int32)] + rank
        over = (slot >= np.uint32(maxlen)) & (ks != 0)
        bad = over | (ks == 0)
        # 1-D flat scatter indices: the slabs are BORN flat (module
        # docstring); bad entries point past the end and mode="drop"
        # discards them
        flat = jnp.where(bad, np.int32(nb * maxlen),
                         bs.astype(jnp.int32) * np.int32(maxlen)
                         + slot.astype(jnp.int32))
        ov = ov + over.sum(dtype=jnp.int32)
        ones = jnp.ones(chunk, U32)
        badd = jnp.where(keep != 0, b.astype(jnp.int32), np.int32(nb))
        for c in range(0, span, chunk):
            sl = slice(c, c + chunk)
            res = res.at[flat[sl]].set(rs[sl], mode="drop",
                                       unique_indices=True)
            jsl = jsl.at[flat[sl]].set(js[sl], mode="drop",
                                       unique_indices=True)
            fill = fill.at[badd[sl]].add(ones, mode="drop")
        return res, jsl, fill, ov, px2, py2

    return step


def build_device_table(m: int, pivots: int = 64, width: int = 2048,
                       steps: int = 4, avg: int = 256,
                       progress: bool = False,
                       rows2d: bool = True) -> DeviceTable:
    """Build the j*G table for j = 1..m entirely in device memory.

    rows2d: reshape the finished residual slab to (nb, maxlen) for the
    fast 2-D row-gather probe (default; maxlen is lane-aligned so the
    reshape is a layout-preserving bitcast, donated either way).
    rows2d=False keeps the raw flat build layout (tests / fallback)."""
    A, W, S = pivots, width, steps
    span = A * W * S
    assert m > W + 1, "tiny tables: use build_baby_table (host path)"
    nb, shift, maxlen = geometry(m, avg)
    step = _build_step(A, W, S, shift, maxlen, nb)
    res = jnp.full((nb * maxlen,), SENTINEL, U32)
    jsl = jnp.full((nb * maxlen,), SENTINEL, U32)
    fill = jnp.zeros((nb,), U32)
    # (1,)-shaped, not rank-0: scalar fetches cost seconds on the
    # tunneled runtime (see search.bsgs.make_giant_step_fn)
    ov = jnp.zeros((1,), jnp.int32)

    # host part: j = 1..host_n fragments from the walker's own constants
    host_n = min(W + 1, m)
    hx, _ = curve.offset_table(max(host_n, 2))
    w0h = hx[7, :host_n].astype(np.uint32)
    w1h = hx[6, :host_n].astype(np.uint32)
    bh = (w0h >> np.uint32(shift)).astype(np.int64)
    resh = match.pack_residual(w0h, w1h, shift)
    order = np.argsort(bh, kind="stable")
    slot = np.zeros(host_n, np.int64)
    fill_h = np.zeros(nb, np.int64)
    for i in order:
        slot[i] = fill_h[bh[i]]
        fill_h[bh[i]] += 1
    del order

    # donated flat updates: an undonated .at[].set on a 6 GiB slab would
    # copy it (see _build_step on why flat + donated)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _apply(buf, flat, vals):
        return buf.at[flat].set(vals, unique_indices=True)

    flat_h = jnp.asarray((bh * maxlen + slot).astype(np.int32))
    res = _apply(res, flat_h, jnp.asarray(resh))
    jsl = _apply(jsl, flat_h,
                 jnp.asarray(np.arange(host_n, dtype=np.uint32)))
    fill = fill + jnp.asarray(fill_h.astype(np.uint32))

    # device part: j = host_n+1 .. m; `take` masks the tail overrun
    keys = [host_n + a * W for a in range(A)]
    x, y = curve.points_for_keys(keys)
    px, py = jnp.asarray(x), jnp.asarray(y)
    t0 = time.time()
    pos = host_n
    while pos < m:
        take = min(span, m - pos)
        res, jsl, fill, ov, px, py = step(res, jsl, fill, ov, px, py,
                                          np.uint32(pos), np.int32(take))
        pos += take
        if progress and (pos // span) % 64 == 0:
            print(f"\r[+] device table {pos}/{m}", end="", flush=True)
    overflow = int(np.asarray(ov)[0])
    if progress:
        print(f"\n[+] device table built in {time.time()-t0:.1f}s "
              f"(overflow={overflow})", flush=True)
    if overflow:
        print(f"[W] device table dropped {overflow} entries to bucket "
              "overflow — rebuild with a larger avg", flush=True)
    if rows2d:
        # one donated reshape to the row-gather probe layout; maxlen is a
        # multiple of 128, so this is a bitcast, not a slab-sized copy
        res = jax.jit(lambda s: s.reshape(nb, maxlen),
                      donate_argnums=0)(res)
    return DeviceTable(m=m, res_slab=res, j_slab=jsl, shift=shift,
                       maxlen=maxlen, overflow=overflow)
