"""Multi-device BSGS parity on the virtual CPU mesh: table sharded by
value range, queries all-gathered, hits psum-combined. Must find the same
keys the single-device engine finds (SURVEY.md §7 step 8)."""

import numpy as np
import jax
from jax.sharding import Mesh

from keyhunt_tpu.parallel.mesh import AXIS
from keyhunt_tpu.parallel.bsgs_sharded import (
    shard_buckets, make_sharded_giant_step, seed_lanes_sharded)
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.bsgs import BsgsConfig, build_baby_table
from conftest import cpu_devices
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

M = 256
D = 8


def _mesh():
    return Mesh(np.array(cpu_devices(D)), (AXIS,))


def test_shard_buckets_partitions():
    tbl = build_baby_table(M, pivots=2, width=32, steps=2)
    s0, s1, permpad, shift = shard_buckets(tbl, D)
    Dn, per, maxlen = s0.shape
    assert Dn == D
    assert permpad.shape == (D * per * maxlen,)   # global padded slots
    # every table entry lands on the shard its bucket index routes to,
    # and the global padded position maps back to the right baby index
    ent = set()
    for d in range(D):
        for b in range(per):
            for s in range(maxlen):
                w0 = int(s0[d, b, s])
                w1 = int(s1[d, b, s])
                if w0 == 0xFFFFFFFF and w1 == 0xFFFFFFFF:
                    continue
                gb = w0 >> shift
                assert gb == d * per + b          # routing invariant
                gpos = gb * maxlen + s
                j = int(permpad[gpos])
                k = np.where(tbl.perm == j)[0][0]
                assert int(tbl.t0[k]) == w0 and int(tbl.t1[k]) == w1
                ent.add((w0, w1, j))
    assert len(ent) == M                          # nothing lost or duplicated


def test_sharded_bsgs_finds_keys():
    tbl = build_baby_table(M, pivots=2, width=32, steps=2)
    cfg = BsgsConfig(m=M, lanes=2, steps=2)       # D*B = 16 lanes globally
    keys = [5000, 12345]
    targets = [ecc.pubkey(k) for k in keys]
    mesh = _mesh()
    step = make_sharded_giant_step(cfg, tbl, mesh, n_targets=len(targets))
    found = {}

    def record(t, key):
        key %= ecc.N
        for cand in (key, ecc.N - key):
            if ecc.pubkey(cand) == targets[t]:
                found[t] = cand

    B = cfg.lanes
    TB = len(targets) * B
    stride = cfg.stride                            # 512 keys per center
    span = D * B * cfg.steps * stride              # keys per dispatch/target
    c0 = 1 + M
    px, py = seed_lanes_sharded(cfg, targets, c0, D, record_cb=record)
    while c0 < 16384 and len(found) < len(targets):
        px, py, lanes, jsel, counts, flags = step(px, py)
        lanes = np.asarray(lanes)
        jsel = np.asarray(jsel)
        # flat hit indices into the (S, D*TB) query space (step-major,
        # device-major within a step)
        for k in range(cfg.max_hits):
            q = int(lanes[k])
            if q < 0:
                continue
            s, rr = divmod(q, D * TB)
            d, r = divmod(rr, TB)
            t, b = divmod(r, B)
            g = d * B + b
            c = c0 + (g + s * D * B) * stride
            # jsel is a global sorted position; host perm maps to j
            j = int(step.perm[int(jsel[k])]) + 1
            record(t, c - j)
            record(t, c + j)
        c0 += span
    assert sorted(found.values()) == sorted(keys)
