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

Layout (5 bytes per slot — the r5 halving of r4's 8 B/slot):
- res_slab: uint32 fragment residual per slot, direct-indexed by bucket
  (= w0 >> shift, exactly like ops.match.build_buckets_packed);
- j_words: a packed uint8-per-slot J HINT — the top 8 bits of j-1
  (jhint = (j-1) >> jshift, jshift = bit_length(m-1) - 8), stored 4
  hints per uint32 word via scatter-ADD (each slot is written once, so
  the adds never collide within a word's byte lanes).

A hit's exact j is recovered by RE-WALKING the 2^jshift-key window the
hint pins (j in [jhint<<jshift + 1, (jhint+1)<<jshift]) and matching the
bucket+residual — hits are rare (one per found key plus ~0.04 false
positives per dispatch), so a sub-second bounded re-walk replaces 4
bytes of every slot (VERDICT r4 next-steps #6). A window mate sharing
the full 54-bit bucket+residual (probability ~2^jshift * 2^-54 < 2^-31)
could shadow the true j; the host pubkey verify rejects such a candidate
rather than report it.

The slabs are BUILT flat: XLA's 2-D scatter lowering inserts a full
flattening reshape of the operand — a slab-sized relayout temp that OOMs
a 16 GB chip at m=2^30, seen in the allocation report — while 1-D
scatters update in place. Flat scatter indices are int32, so slabs whose
slot count reaches 2^31 (m = 2^31 at avg=1024 pads to ~2.7e9 slots) are
split into TWO bucket-contiguous HALVES, each under the int32 limit;
every batch scatters into both halves with out-of-range indices dropped.
After the build each half is reshaped ONCE to (nb_half, maxlen): maxlen
is lane-aligned (a multiple of 128), so the split is a layout-preserving
bitcast, and every search probe uses the fast 2-D row gather
(`match.probe_buckets_packed`, or two ranged probes OR-combined for
split slabs) instead of the windowed flat gather, which measured ~30x
slower on the chip (MARQUEE r4 (f)).

Construction per batch (one jitted, donated step — `_build_step`):
1. walk A*W*S points with the shared-inverse group trick
   (`search.bsgs._builder_step` geometry; thread_bPload's role,
   keyhunt.cpp:5284-5472);
2. bucket each fragment; stable-sort the BATCH by bucket (524k elements,
   device-local — no global sort anywhere);
3. within-batch rank via run-start cummax over the sorted buckets;
   slot = fill[bucket] + rank;
4. scatter residuals and packed j hints into the slabs (chunked: XLA:TPU
   scatter compile time scales with update count — 64Ki-update scatters
   compile in seconds; a single 512Ki-update scatter took >20 min to
   compile, and an indices_are_sorted variant with a windowed row-count
   gather never finished compiling in 40 min — measured; keep the plain
   form);
5. fill += per-bucket counts (chunked scatter-add).

maxlen is NOT measured (that would cost a second walk): bucket loads are
Poisson(avg), so maxlen = avg + 8*sqrt(avg), rounded up to a lane
multiple (the flat view is then layout-free), overflows with probability
~1e-9 per table; overflow is COUNTED on device and surfaced — never
silent (VERDICT r3 "no silent caps").

Budget ledger (the point of the r5 redesign): m=2^30 at avg=256 is
1.61e9 slots -> 6.4 GiB residuals + 1.5 GiB hints = 7.9 GiB (r4 needed
~12.9 GiB); m=2^31 at avg=1024 is 2.68e9 slots -> 10.7 + 2.5 = 13.3 GiB
— a device build at m=2^31 now fits a 16 GB chip from nothing.
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


@functools.partial(jax.jit, static_argnums=())
def _gather1(arr, idx):
    """One element of a (possibly 2-D) device array by flat index —
    traced (1,) index, so every position reuses one compile per shape."""
    return jnp.take(arr.reshape(-1), idx)
#: scatter chunk: compile-friendly update count (see module docstring)
_SCATTER_CHUNK = 65536
#: flat int32 scatter-index ceiling: slabs at/past this slot count split
_SPLIT_SLOTS = 1 << 31


def default_avg(m: int) -> int:
    """Bucket mean: 256 keeps rows short up to m=2^30; m=2^31 takes 1024
    so the Poisson pad factor (1.25 at mean 1024 vs 1.5 at 256) keeps the
    slabs inside a 16 GB chip (module docstring ledger)."""
    return 256 if m <= (1 << 30) else 1024


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
    return nb, shift, maxlen


def n_halves(nb: int, maxlen: int) -> int:
    """1 or 2 bucket-contiguous slab pieces (int32 flat-index ceiling)."""
    halves = 1 if nb * maxlen < _SPLIT_SLOTS else 2
    assert nb * maxlen // halves < _SPLIT_SLOTS, "table beyond 2 halves"
    return halves


def jshift_for(m: int) -> int:
    """Stored-hint shift: jhint = (j-1) >> jshift fits 8 bits."""
    return max((m - 1).bit_length() - 8, 0)


class DeviceTable:
    """Duck-types the BabyTable surface BsgsEngine needs: .m, .depth,
    .device_packed(), .pos_to_j(). t0/t1/perm are None (no host arrays
    exist — that is the point).

    res_slab / j_words are single arrays (one slab piece) or tuples of
    two (split slabs, module docstring); BsgsEngine passes res_slab
    through jit as a pytree either way."""

    t0 = t1 = perm = None
    depth = 0

    def __init__(self, m: int, res_slab, j_words, shift: int, maxlen: int,
                 overflow: int = 0):
        self.m = m
        self.res_slab = res_slab
        self.j_words = j_words
        self.shift = shift
        self.maxlen = maxlen
        self.jshift = jshift_for(m)
        self.overflow = overflow

    @property
    def _halves(self):
        return self.res_slab if isinstance(self.res_slab, tuple) \
            else (self.res_slab,)

    @property
    def flat_maxlen(self) -> int | None:
        """maxlen when the slab still needs the windowed FLAT probe
        (`match.probe_buckets_packed_flat`); None once 2-D (the fast
        row-gather probe applies). BsgsEngine keys the probe choice on
        this."""
        h0 = self._halves[0]
        return self.maxlen if h0.ndim == 1 else None

    def device_packed(self, avg: int | None = None):
        return self.res_slab, None, self.shift

    def packed(self, avg: int | None = None):
        return self.res_slab, None, self.shift

    def _entry(self, pos: int):
        """(bucket, residual, jhint) stored at a padded GLOBAL position —
        two tiny device gathers (rare: only on probe hits). The index is
        a TRACED (1,) argument: a python-int index would bake into the
        executable and compile a fresh gather per distinct position."""
        halves = self._halves
        jwords = self.j_words if isinstance(self.j_words, tuple) \
            else (self.j_words,)
        half_slots = (halves[0].size if halves[0].ndim == 1
                      else halves[0].shape[0] * self.maxlen)
        h, local = divmod(int(pos), half_slots)
        resid = int(_gather1(halves[h], np.asarray([local], np.int32))[0])
        word = int(_gather1(jwords[h],
                            np.asarray([local // 4], np.int32))[0])
        jhint = (word >> (8 * (local % 4))) & 0xFF
        return int(pos) // self.maxlen, resid, jhint

    def pos_to_j(self, pos: int) -> int | None:
        """Padded position -> exact baby j (1-based), or None for a
        sentinel/false-positive slot. The stored hint pins a 2^jshift
        window; a bounded device re-walk of that window recovers j
        (module docstring — this is what the dropped 4 B/slot bought)."""
        bucket, resid, jhint = self._entry(int(pos))
        base = jhint << self.jshift                       # j-1 window base
        j_lo = base + 1
        j_hi = min(base + (1 << self.jshift), self.m)
        if j_lo > self.m:
            return None
        return find_j(bucket, resid, self.shift, j_lo, j_hi)


def find_j(bucket: int, resid, shift: int, j_lo: int, j_hi: int) -> int | None:
    """Re-walk keys j_lo..j_hi and return the first j whose X fragment
    routes to `bucket` with residual `resid` (None if the window has no
    match — the probe hit was a padded-sentinel or residual collision).
    Uses the builder walk (search.bsgs._builder_step): col c of a span
    seeded at k0 is key k0 + c + 1."""
    from . import bsgs as _bsgs
    resid = np.uint32(resid)
    n = j_hi - j_lo + 1
    if n <= (1 << 12):
        A, W, S = 2, 32, 2           # compile-cheap (tests, small m)
    elif n <= (1 << 18):
        A, W, S = 16, 512, 4
    else:
        A, W, S = 64, 2048, 4
    span = A * W * S
    if j_lo <= W + 1:
        # low-j head checked host-side from the offset table: the device
        # walk's shared-slope add degenerates when a pivot key (k0 + a*W)
        # coincides with an offset key (1..W), so pivots must start past
        # W — exactly why build_baby_table/_build_step seed at host_n
        n_head = min(W + 1, j_hi)
        hx, _ = curve.offset_table(max(n_head, 2))
        w0h = hx[7, :n_head].astype(np.uint32)
        w1h = hx[6, :n_head].astype(np.uint32)
        ok = ((w0h >> np.uint32(shift)) == np.uint32(bucket)) \
            & (match.pack_residual(w0h, w1h, shift) == resid)
        for i in np.nonzero(ok)[0]:
            j = int(i) + 1                     # hx col i is key i+1
            if j_lo <= j <= j_hi:
                return j
        j_lo = n_head + 1
        if j_lo > j_hi:
            return None
    run = _bsgs._builder_step(A, W, S)
    k0 = j_lo - 1
    keys = [k0 + a * W for a in range(A)]
    x, y = curve.points_for_keys(keys)
    px, py = jnp.asarray(x), jnp.asarray(y)
    pos = k0
    while pos < j_hi:
        px, py, frags = run(px, py)
        arr = np.asarray(frags).transpose(1, 0, 2).reshape(2, span)
        w0, w1 = arr[0], arr[1]
        ok = ((w0 >> np.uint32(shift)) == np.uint32(bucket)) \
            & (match.pack_residual(w0, w1, shift) == resid)
        for i in np.nonzero(ok)[0]:
            j = pos + 1 + int(i)
            if j_lo <= j <= j_hi:
                return j
        pos += span
    return None


@functools.lru_cache(maxsize=None)
def _build_step(A: int, W: int, S: int, shift: int, maxlen: int, nb: int,
                jshift: int, halves: int):
    """One donated build step advancing the table by up to A*W*S babies:
    (res..., jw..., fill, ov, px, py, j0, take) -> same tuple advanced.
    `take` (traced) masks the tail batch that overruns m — one compile
    serves every batch of the build. res/jw ride as tuples of `halves`
    bucket-contiguous pieces (int32 flat-index ceiling)."""
    gtx, gty = map(jnp.asarray, curve.offset_table(W))
    spx, spy = map(jnp.asarray, curve.point_const(A * W))
    span = A * W * S
    chunk = min(_SCATTER_CHUNK, span)          # small test geometries
    assert span % chunk == 0
    nb_half = nb // halves
    oob = np.int32(nb_half * maxlen)           # dropped by mode="drop"

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(res, jw, fill, ov, px, py, j0, take):
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
        ov = ov + over.sum(dtype=jnp.int32)
        # packed j hints: 4 uint8 per uint32 word via scatter-ADD (each
        # real slot written exactly once, so byte lanes never collide)
        jhint = (js >> np.uint32(jshift)) & np.uint32(0xFF)
        bsi = bs.astype(jnp.int32)
        ones = jnp.ones(chunk, U32)
        badd = jnp.where(keep != 0, b.astype(jnp.int32), np.int32(nb))
        res, jw = list(res), list(jw)
        for h in range(halves):
            lo = np.int32(h * nb_half)
            inh = (bsi >= lo) & (bsi < lo + np.int32(nb_half)) & ~bad
            lflat = jnp.where(inh, (bsi - lo) * np.int32(maxlen)
                              + slot.astype(jnp.int32), oob)
            widx = lflat // 4
            wval = jhint << ((lflat % 4).astype(U32) * np.uint32(8))
            for c in range(0, span, chunk):
                sl = slice(c, c + chunk)
                res[h] = res[h].at[lflat[sl]].set(rs[sl], mode="drop",
                                                  unique_indices=True)
                jw[h] = jw[h].at[widx[sl]].add(wval[sl], mode="drop")
        for c in range(0, span, chunk):
            sl = slice(c, c + chunk)
            fill = fill.at[badd[sl]].add(ones, mode="drop")
        return tuple(res), tuple(jw), fill, ov, px2, py2

    return step


def build_device_table(m: int, pivots: int = 64, width: int = 2048,
                       steps: int = 4, avg: int | None = None,
                       progress: bool = False,
                       rows2d: bool = True) -> DeviceTable:
    """Build the j*G table for j = 1..m entirely in device memory.

    rows2d: reshape the finished residual slab pieces to (nb_half,
    maxlen) for the fast 2-D row-gather probe (default; maxlen is
    lane-aligned so the reshape is a layout-preserving bitcast, donated
    either way). rows2d=False keeps the raw flat build layout (tests /
    fallback; single-piece slabs only)."""
    A, W, S = pivots, width, steps
    span = A * W * S
    assert m > W + 1, "tiny tables: use build_baby_table (host path)"
    if avg is None:
        avg = default_avg(m)
    nb, shift, maxlen = geometry(m, avg)
    halves = n_halves(nb, maxlen)
    nb_half = nb // halves
    half_slots = nb_half * maxlen
    jshift = jshift_for(m)
    step = _build_step(A, W, S, shift, maxlen, nb, jshift, halves)
    res = tuple(jnp.full((half_slots,), SENTINEL, U32)
                for _ in range(halves))
    jw = tuple(jnp.zeros((half_slots // 4,), U32) for _ in range(halves))
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
    jh = ((np.arange(host_n, dtype=np.uint32) >> np.uint32(jshift))
          & np.uint32(0xFF))

    # donated flat updates: an undonated .at[].set on a 6 GiB slab would
    # copy it (see _build_step on why flat + donated)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _apply_set(buf, flat, vals):
        return buf.at[flat].set(vals, unique_indices=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _apply_add(buf, flat, vals):
        return buf.at[flat].add(vals)

    res, jw = list(res), list(jw)
    for h in range(halves):
        sel = (bh >= h * nb_half) & (bh < (h + 1) * nb_half)
        if not sel.any():
            continue
        lflat = ((bh[sel] - h * nb_half) * maxlen + slot[sel]).astype(np.int32)
        res[h] = _apply_set(res[h], jnp.asarray(lflat), jnp.asarray(resh[sel]))
        wval = (jh[sel].astype(np.uint32)
                << ((lflat % 4).astype(np.uint32) * 8))
        jw[h] = _apply_add(jw[h], jnp.asarray(lflat // 4), jnp.asarray(wval))
    res, jw = tuple(res), tuple(jw)
    fill = fill + jnp.asarray(fill_h.astype(np.uint32))

    # device part: j = host_n+1 .. m; `take` masks the tail overrun
    keys = [host_n + a * W for a in range(A)]
    x, y = curve.points_for_keys(keys)
    px, py = jnp.asarray(x), jnp.asarray(y)
    t0 = time.time()
    pos = host_n
    while pos < m:
        take = min(span, m - pos)
        res, jw, fill, ov, px, py = step(res, jw, fill, ov, px, py,
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
        # one donated reshape per piece to the row-gather probe layout;
        # maxlen is a multiple of 128, so this is a bitcast, not a
        # slab-sized copy
        shaped = jax.jit(lambda s: s.reshape(nb_half, maxlen),
                         donate_argnums=0)
        res = tuple(shaped(r) for r in res)
    else:
        assert halves == 1, "flat layout supports single-piece slabs only"
    if halves == 1:
        res, jw = res[0], jw[0]
    return DeviceTable(m=m, res_slab=res, j_words=jw, shift=shift,
                       maxlen=maxlen, overflow=overflow)
