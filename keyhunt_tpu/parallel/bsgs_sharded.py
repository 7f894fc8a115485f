"""Multi-chip BSGS: the baby table sharded across device HBM, giant-step
queries all-gathered, membership combined with collectives.

This is the TPU replacement for the reference's two scale paths
(SURVEY.md §5 "long-context analog"): the k-factor (bigger baby table ->
fewer giant steps) becomes *aggregate HBM across the mesh* — a v5p pod
slice holds a table D times larger than one chip — and the 256-way
byte-sharded bloom layers become value-range shards of the PACKED bucket
slab (4 B/slot, ops.match.build_buckets_packed).

Layout per step (mesh axis 'kspace', D devices):
- table: packed bucket slab split by bucket index into D equal stacks;
  device d holds rows [d*per, (d+1)*per) (P(AXIS) over the shard axis);
- lanes: each device walks its own (T, B) block of JACOBIAN lanes with
  the fused giant-scan kernel (ops.jacwalk — the same single-kernel walk
  as the single-device path; the r2 per-step batched inversion that this
  replaces measured launch-bound at ~19 M pts/s, VERDICT r3 weak #2).
  Affine conversion is deferred: ONE local batched inversion over all
  S-step emissions, then the 64-bit fragments (16 B/lane/step) ride ONE
  all-gather per call;
- probe: every device probes all D*S*Ll gathered queries against its
  local slab shard; a fragment lives in exactly one bucket (hence one
  shard), so the psum of (hit, pos+1) pairs is exact, not a vote.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map
from functools import partial

from ..ops import match, jacwalk
from ..ref import ecc
from ..search.bsgs import (BabyTable, BsgsConfig, DEGEN_SLOTS,
                           decode_packed_pos)
from .mesh import AXIS

U32 = jnp.uint32


def shard_buckets_packed(tbl: BabyTable, n_devices: int,
                         avg: int | None = None, parts: int = 1):
    """Split the packed bucket slab by BUCKET INDEX into D equal stacks:
    device d owns buckets [d*per, (d+1)*per). Bucket index is
    `w0 >> shift`, so query routing is a shift+compare — the TPU reading
    of the reference's 256-way first-byte bloom shards
    (`keyhunt.cpp:1704-1718`). If the table has fewer buckets than
    devices, sentinel rows pad the tail shards (they never match).

    With parts > 1 (the over-HBM regime COMPOSED with mesh sharding —
    aggregate HBM x partition sweeps), each device's contiguous bucket
    range is further split into `parts` contiguous pieces: pass p keeps
    piece p of EVERY device resident, so any bucket lives on at most one
    device in any pass (the psum combine stays exact) and P sweeps cover
    the whole table.

    Returns (slab, starts, shift) with slab shaped (D, parts, per,
    maxlen) — slice [:, p] for pass p; device d's piece p holds global
    bucket rows [d*parts*per + p*per, d*parts*per + (p+1)*per). starts is
    the GLOBAL bucket prefix (host RAM, consulted via decode_packed_pos
    only for rare hits)."""
    slab, starts, shift = tbl.packed(avg)
    slab = np.asarray(slab)
    nb, maxlen = slab.shape
    chunks = n_devices * max(parts, 1)
    if nb % chunks:
        pad = chunks - nb % chunks
        fill = np.full((pad, maxlen), 0xFFFFFFFF, np.uint32)
        slab = np.concatenate([slab, fill])
        nb += pad
    per = nb // chunks
    return slab.reshape(n_devices, max(parts, 1), per, maxlen), starts, shift


#: compiled sharded steppers keyed by everything shape/geometry-relevant —
#: the table slab rides as a RUNTIME jit argument, so ggsb pass switches
#: and daemon target-set changes reuse the compile (VERDICT r2 weak #8).
_STEPPER_CACHE: dict = {}


def _sharded_stepper(cfg: BsgsConfig, n_targets: int, mesh: Mesh,
                     per: int, maxlen: int, shift: int,
                     dev_stride: int | None = None):
    """dev_stride: global buckets between consecutive devices' first rows
    (= per when the whole table is resident; per*parts when composed with
    table partitions). The partition base rides as a RUNTIME (1,) int32
    arg, so all P partition passes share ONE compile."""
    dev_stride = per if dev_stride is None else dev_stride
    key = (cfg, n_targets, mesh, per, maxlen, shift, dev_stride)
    hit = _STEPPER_CACHE.get(key)
    if hit is not None:
        return hit
    D = mesh.devices.size
    B, S, K = cfg.lanes, cfg.steps, cfg.max_hits
    Ll = n_targets * B                         # lanes per device
    adv = ecc.ec_mul(D * B * cfg.stride)       # global advance per step
    negadv = ecc.ec_neg(adv)

    def local_step(slab, pbase, X, Y, Z):
        # X/Y/Z: (8, Ll) local Jacobian lanes; slab: (per, maxlen) local
        # packed bucket rows. The fused kernel emits all S steps' (X, Z);
        # ONE deferred local inversion converts them to affine fragments.
        Xo, Yo, Zo, xs, zs, dg = jacwalk.giant_scan(
            X, Y, Z, negadv[0], negadv[1], S)
        xa = jacwalk.to_affine_x(xs, zs)           # (8, S*Ll) canonical
        frags = jnp.stack([xa[7], xa[6]])          # (2, S*Ll) step-major

        # degenerate lanes stay device-local: up to DEGEN_SLOTS global
        # flat indices per (device, step) row (a psum combine would
        # corrupt simultaneous flags on two devices)
        my = jax.lax.axis_index(AXIS).astype(jnp.int32)

        def extract(m):
            vals, idx = jax.lax.top_k(m.astype(jnp.int32), DEGEN_SLOTS)
            return jnp.where(vals > 0, idx + my * np.int32(Ll), -1)
        flags = jax.lax.cond(
            dg.sum() > 0, lambda m: jax.vmap(extract)(m),
            lambda m: jnp.full((S, DEGEN_SLOTS), -1, jnp.int32), dg)

        # ONE all-gather ships every device's S*Ll fragments (16 B per
        # lane-step on ICI); flatten step-major/device-major so the flat
        # query index is g = (s*D + d)*Ll + l (the engine's decode).
        qall = jax.lax.all_gather(frags, AXIS)     # (D, 2, S*Ll)
        w0 = qall[:, 0, :].reshape(D, S, Ll).transpose(1, 0, 2).reshape(-1)
        w1 = qall[:, 1, :].reshape(D, S, Ll).transpose(1, 0, 2).reshape(-1)

        # packed probe against the local shard: this device's resident
        # rows cover global buckets [my*dev_stride + pbase, ... + per)
        hit_l, gpos = match.probe_buckets_packed_ranged(
            slab, w0, w1, shift, my * np.int32(dev_stride) + pbase[0])
        hit = jax.lax.psum(hit_l.astype(jnp.int32), AXIS) > 0
        # a fragment lives in exactly one bucket shard: psum is a select
        pos_all = jax.lax.psum(jnp.where(hit_l, gpos + np.uint32(1),
                                         np.uint32(0)), AXIS)
        lanes, possel, count = match.topk_with_payload(hit, pos_all, K)
        jout = jnp.where(lanes >= 0, possel - 1, 0)
        # all-gather the (tiny) per-device flag rows so every output is
        # REPLICATED — a multi-host process can fetch all of them (a
        # P(AXIS) output is only partially addressable there); rows stay
        # device-major: row = d*S + s, the engine's decode convention.
        flags_all = jax.lax.all_gather(flags, AXIS) \
            .reshape(D * S, DEGEN_SLOTS)
        # count as (1,), not rank-0: scalar fetches cost seconds on the
        # tunneled runtime (see search.bsgs.make_giant_step_fn)
        return Xo, Yo, Zo, lanes, jout, count[None], flags_all

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS, None, None), P(None),
                       P(None, AXIS), P(None, AXIS), P(None, AXIS)),
             out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                        P(), P(), P(), P()),
             # Pallas calls inside the body don't declare varying-mesh-axes
             # metadata; vma checking (default-on since jax 0.9) rejects
             # them.
             check_vma=False)
    def stepper(slab, pbase, X, Y, Z):
        return local_step(slab[0], pbase, X, Y, Z)

    sh_tab = NamedSharding(mesh, P(AXIS, None, None))
    sh_rep = NamedSharding(mesh, P(None))
    sh_pts = NamedSharding(mesh, P(None, AXIS))
    jitted = jax.jit(stepper,
                     in_shardings=(sh_tab, sh_rep, sh_pts, sh_pts, sh_pts))
    _STEPPER_CACHE[key] = jitted
    return jitted


def make_sharded_giant_step(cfg: BsgsConfig, tbl: BabyTable, mesh: Mesh,
                            n_targets: int = 1, part: int = 0,
                            parts: int = 1):
    """SPMD giant walk over the mesh. State: Jacobian (X, Y, Z) with
    T*D*B global lanes, sharded so device d owns lanes [d*T*B, (d+1)*T*B)
    (device-major (d, t, b) flat layout — BsgsEngine._seed).

    part/parts compose the over-HBM partition regime with mesh sharding
    (aggregate-HBM x sweeps): only piece `part` of every device's bucket
    range is resident; the engine sweeps the range once per part. The
    partition base is a runtime arg, so all `parts` passes share one
    compile (and one _STEPPER_CACHE entry).

    Outputs: (X', Y', Z', lanes, jsel, count, flags) — replicated top-K
    flat hits into the (S, Lg) query space (step-major, device-major
    within a step) + global padded slab positions + count, plus
    per-device degenerate-lane flag rows. The returned `run` carries
    `.pos_to_j`, the host decode from padded positions to baby indices
    (None = sentinel false positive). The slab is a runtime jit arg:
    ggsb pass switches with equal slab shapes reuse the compile."""
    from .mesh import commit_to_mesh
    slab4, starts, shift = shard_buckets_packed(tbl, mesh.devices.size,
                                                parts=parts)
    per, maxlen = slab4.shape[2], slab4.shape[3]
    jitted = _sharded_stepper(cfg, n_targets, mesh, per, maxlen, shift,
                              dev_stride=per * max(parts, 1))
    slab = commit_to_mesh(np.ascontiguousarray(slab4[:, part]), mesh,
                          P(AXIS, None, None))
    pbase = commit_to_mesh(np.array([part * per], np.int32), mesh, P(None))
    fn = {"impl": jitted}          # swapped for the AOT executable by warmup

    def _commit(X, Y, Z):
        return (commit_to_mesh(X, mesh, P(None, AXIS)),
                commit_to_mesh(Y, mesh, P(None, AXIS)),
                commit_to_mesh(Z, mesh, P(None, AXIS)))

    def run(X, Y, Z):
        X, Y, Z = _commit(X, Y, Z)
        return fn["impl"](slab, pbase, X, Y, Z)

    def warmup(X, Y, Z):
        """AOT-compile (no execution, no collectives) and keep the
        executable — see parallel.mesh.make_sharded_step_fn.warmup."""
        X, Y, Z = _commit(X, Y, Z)
        fn["impl"] = jitted.lower(slab, pbase, X, Y, Z).compile()

    perm = tbl.perm
    run.pos_to_j = lambda pos: decode_packed_pos(pos, starts, maxlen, perm)
    run.warmup = warmup
    return run
