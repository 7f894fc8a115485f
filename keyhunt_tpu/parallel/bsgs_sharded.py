"""Multi-chip BSGS: the baby table sharded across device HBM, giant-step
queries all-gathered, membership combined with collectives.

This is the TPU replacement for the reference's two scale paths
(SURVEY.md §5 "long-context analog"): the k-factor (bigger baby table ->
fewer giant steps) becomes *aggregate HBM across the mesh* — a v5p pod
slice holds a table D times larger than one chip — and the 256-way
byte-sharded bloom layers become value-range shards of the sorted
fragment table.

Layout per step (mesh axis 'kspace', D devices):
- table: lexicographically sorted fragments split into D equal value
  ranges; device d holds shard d (P(AXIS) over the shard axis);
- lanes: each device walks B giant lanes covering its own stripe of
  centers (global lane l = d*B + b advances by D*B*stride keys/step);
- probe: every device all-gathers all D*B queries (64 bits each — tiny on
  ICI), probes its local BUCKET-SLAB shard (`ops.match.build_buckets` —
  one row gather + compare, no binary-search loop; the searchsorted form
  costs ~150x composed, measured r2), and the per-shard hits/payloads
  combine with a psum. A fragment lives in exactly one bucket (hence one
  shard), so the psum of (hit, pos+1) pairs is exact, not a vote.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map
from functools import partial

from ..ops import u256, field, match
from ..ref import ecc
from ..search.bsgs import BabyTable, BsgsConfig, DEGEN_SLOTS
from .mesh import AXIS

U32 = jnp.uint32


def shard_buckets(tbl: BabyTable, n_devices: int, avg: int = 32):
    """Split the direct-indexed bucket slabs by BUCKET INDEX into D equal
    stacks: device d owns buckets [d*per, (d+1)*per). Bucket index is
    `w0 >> shift`, so query routing is a shift+compare — the TPU reading
    of the reference's 256-way first-byte bloom shards
    (`keyhunt.cpp:1704-1718`). If the table has fewer buckets than
    devices, sentinel rows pad the tail shards (they never match).

    Returns (slab0, slab1, permpad, shift) with slab* shaped
    (D, per, maxlen); permpad is the GLOBAL padded position→j permutation
    (host RAM, consulted only for rare hits)."""
    slab0, slab1, permpad, shift = tbl.buckets(avg)
    nb, maxlen = slab0.shape
    if nb < n_devices:
        pad = n_devices - nb
        fill = np.full((pad, maxlen), 0xFFFFFFFF, np.uint32)
        slab0 = np.concatenate([slab0, fill])
        slab1 = np.concatenate([slab1, fill])
        permpad = np.concatenate(
            [permpad, np.zeros(pad * maxlen, np.uint32)])
        nb = n_devices
    assert nb % n_devices == 0            # both are powers of two
    per = nb // n_devices
    return (slab0.reshape(n_devices, per, maxlen),
            slab1.reshape(n_devices, per, maxlen), permpad, shift)


#: compiled sharded steppers keyed by everything shape/geometry-relevant —
#: table slabs ride as RUNTIME jit arguments, so ggsb pass switches and
#: daemon target-set changes reuse the compile (VERDICT r2 weak #8).
_STEPPER_CACHE: dict = {}


def _sharded_stepper(cfg: BsgsConfig, n_targets: int, mesh: Mesh,
                     per: int, maxlen: int, shift: int):
    key = (cfg, n_targets, mesh, per, maxlen, shift)
    hit = _STEPPER_CACHE.get(key)
    if hit is not None:
        return hit
    D = mesh.devices.size
    B, S, K = cfg.lanes, cfg.steps, cfg.max_hits
    Lg = n_targets * D * B                     # global lanes
    Ll = n_targets * B                         # lanes per device
    adv = ecc.ec_mul(D * B * cfg.stride)       # global advance per step
    negadv = ecc.ec_neg(adv)
    cxc = u256.from_int(negadv[0], (1,))
    cyc = u256.from_int(negadv[1], (1,))

    def local_step(s0, s1, px, py):
        # px, py: (8, Ll) local lanes; s0/s1: (per, maxlen) local buckets
        cxb = jnp.broadcast_to(jnp.asarray(cxc), (8, Ll)).astype(U32)
        cyb = jnp.broadcast_to(jnp.asarray(cyc), (8, Ll)).astype(U32)

        def one(carry, _):
            px, py = carry
            frag = jnp.stack([px[7], px[6]])              # (2, Ll)

            # degenerate lanes stay device-local: up to DEGEN_SLOTS local
            # indices per step, offset into the global lane space (a psum
            # combine would corrupt simultaneous flags on two devices)
            x_eq = u256.eq(px, cxb)
            y_eq = u256.eq(py, cyb)
            same = x_eq & y_eq
            inf_case = x_eq & (~y_eq)
            my = jax.lax.axis_index(AXIS).astype(jnp.int32)
            fl, _ = match.topk_indices(x_eq, DEGEN_SLOTS)
            flags = jnp.where(fl >= 0, fl + my * np.int32(Ll), -1)
            one_b = jnp.broadcast_to(field.const(1, 2), (8, Ll)).astype(U32)
            den = jnp.where(same[None], field.add(py, py), field.sub(cxb, px))
            den = jnp.where(inf_case[None], one_b, den)
            num = jnp.where(same[None], field.mul_small(field.sqr(px), 3),
                            field.sub(cyb, py))
            inv = field.batch_inv(den)
            lam = field.mul(num, inv)
            x2 = field.sub(field.sub(field.sqr(lam), px), cxb)
            y2 = field.sub(field.mul(lam, field.sub(px, x2)), py)
            return ((field.norm(x2), field.norm(y2)), (frag, flags))

        (px2, py2), (frags, flags) = jax.lax.scan(
            one, (px, py), None, length=S)
        # frags: (S, 2, Ll) -> all-gather -> (D, S, 2, Ll); flatten the
        # query space step-major/device-major: g = (s*D + d)*Ll + l
        qall = jax.lax.all_gather(frags, AXIS)
        w0 = qall[:, :, 0, :].transpose(1, 0, 2).reshape(-1)    # (S*Lg,)
        w1 = qall[:, :, 1, :].transpose(1, 0, 2).reshape(-1)
        # bucket probe against the local shard: global bucket = w0 >> shift,
        # local row = global - my*per; off-shard queries are masked out.
        myi = jax.lax.axis_index(AXIS).astype(jnp.int32)
        gb = jax.lax.shift_right_logical(w0, jnp.uint32(shift)) \
            .astype(jnp.int32)
        lb = gb - myi * np.int32(per)
        mine = (lb >= 0) & (lb < per)
        lclip = jnp.clip(lb, 0, per - 1)
        r0 = s0[lclip]                              # (S*Lg, maxlen)
        r1 = s1[lclip]
        eq = (r0 == w0[:, None]) & (r1 == w1[:, None]) & mine[:, None]
        hit_l = eq.any(axis=1)
        slot = jnp.argmax(eq, axis=1).astype(U32)
        # global padded position (bucket*maxlen + slot) for the host perm
        gpos = gb.astype(U32) * np.uint32(maxlen) + slot
        hit = jax.lax.psum(hit_l.astype(jnp.int32), AXIS) > 0
        # a fragment lives in exactly one bucket shard: psum is a select
        pos_all = jax.lax.psum(jnp.where(hit_l, gpos + 1, 0), AXIS)
        lanes, possel, count = match.topk_with_payload(hit, pos_all, K)
        jout = jnp.where(lanes >= 0, possel - 1, 0)
        # count as (1,), not rank-0: scalar fetches cost seconds on the
        # tunneled runtime (see search.bsgs.make_giant_step_fn)
        return px2, py2, lanes, jout, count[None], flags

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS, None, None), P(AXIS, None, None),
                       P(None, AXIS), P(None, AXIS)),
             # flags ride P(AXIS): device d's (S, DEGEN_SLOTS) block sits at
             # rows [d*S, (d+1)*S) of the concatenated output
             out_specs=(P(None, AXIS), P(None, AXIS),
                        P(), P(), P(), P(AXIS)),
             # Pallas calls inside the body don't declare varying-mesh-axes
             # metadata; vma checking (default-on since jax 0.9) rejects them.
             check_vma=False)
    def stepper(s0, s1, px, py):
        return local_step(s0[0], s1[0], px, py)

    sh_tab = NamedSharding(mesh, P(AXIS, None, None))
    sh_pts = NamedSharding(mesh, P(None, AXIS))
    jitted = jax.jit(stepper, in_shardings=(sh_tab, sh_tab, sh_pts, sh_pts))
    _STEPPER_CACHE[key] = jitted
    return jitted


def make_sharded_giant_step(cfg: BsgsConfig, tbl: BabyTable, mesh: Mesh,
                            n_targets: int = 1):
    """SPMD giant walk over the mesh. State: (px, py) with T*D*B global
    lanes, sharded so device d owns lanes [d*T*B, (d+1)*T*B). The scan
    advances lanes and stacks per-step X fragments; ONE all-gather ships
    all S steps' queries (S*Lg * 8 bytes) and ONE bucket probe of the
    local shard runs per call — the nested-while searchsorted form costs
    ~150x more composed (see ops.match.build_buckets), and batching the
    all-gather also replaces S small collectives with one.

    Outputs: replicated top-K flat hits into the (S, Lg) query space
    (step-major, device-major within a step) + global padded slab
    positions + count, plus per-device degenerate-lane flags. The
    returned `run` carries `.perm` — the padded host permutation mapping
    global positions back to baby indices j. Slabs are runtime jit args:
    ggsb pass switches with equal slab shapes reuse the compile."""
    s0, s1, perm_host, shift = shard_buckets(tbl, mesh.devices.size)
    per, maxlen = s0.shape[1], s0.shape[2]
    jitted = _sharded_stepper(cfg, n_targets, mesh, per, maxlen, shift)

    def run(px, py):
        return jitted(s0, s1, px, py)

    run.perm = perm_host
    return run


def seed_lanes_sharded(cfg: BsgsConfig, targets, c0: int, n_devices: int,
                       record_cb=None):
    """Host: P[t, global lane l] = Q_t - (c0 + l*stride)*G, global lane
    l = d*B + b ordered device-major so P(None, AXIS) shards device blocks.

    record_cb(t, key) is invoked when a lane lands exactly on Q (the key
    is c0 + l*stride); the lane is replaced by a dummy.
    """
    B = cfg.lanes
    L = n_devices * B
    step = ecc.ec_mul(cfg.stride)
    xs, ys = [], []
    for t, q in enumerate(targets):
        pt = ecc.ec_sub(q, ecc.ec_mul(c0))
        off = None
        for l in range(L):
            p = pt if off is None else ecc.ec_sub(pt, off)
            if l + 1 < L:
                off = ecc.ec_add(off, step) if off is not None else step
            if p is None:
                if record_cb:
                    record_cb(t, c0 + l * cfg.stride)
                p = ecc.G
            xs.append(p[0])
            ys.append(p[1])
    # reorder target-major [t][l] -> device blocks [d][t][b]? The step fn
    # shards the lane axis into device blocks; lanes are laid out
    # [t, l] flattened with l device-major, so shard d gets, for every
    # target, its stripe — but shard boundaries must align: arrange as
    # (d, t, b) so that slicing along the flat axis by D gives whole
    # (t, b) blocks per device.
    xs = np.array(xs, dtype=object).reshape(len(targets), n_devices, B)
    ys = np.array(ys, dtype=object).reshape(len(targets), n_devices, B)
    xs = xs.transpose(1, 0, 2).reshape(-1)
    ys = ys.transpose(1, 0, 2).reshape(-1)
    return (u256.from_ints(list(xs)), u256.from_ints(list(ys)))
