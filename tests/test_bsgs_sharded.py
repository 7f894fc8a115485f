"""Multi-device BSGS parity on the virtual CPU mesh: packed bucket slab
sharded by bucket range, Jacobian lanes walked by the fused giant-scan
per device, queries all-gathered, hits psum-combined. Must find the same
keys the single-device engine finds (SURVEY.md §7 step 8)."""

import numpy as np
import jax
from jax.sharding import Mesh

from keyhunt_tpu.parallel.mesh import AXIS
from keyhunt_tpu.parallel.bsgs_sharded import (
    shard_buckets_packed, make_sharded_giant_step)
from keyhunt_tpu.ops import match
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.bsgs import (BsgsConfig, build_baby_table,
                                     decode_packed_pos, seed_lanes)
from conftest import cpu_devices
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

M = 256
D = 8


def _mesh():
    return Mesh(np.array(cpu_devices(D)), (AXIS,))


def test_shard_buckets_packed_partitions():
    tbl = build_baby_table(M, pivots=2, width=32, steps=2)
    slab, starts, shift = shard_buckets_packed(tbl, D)
    Dn, parts, per, maxlen = slab.shape
    assert (Dn, parts) == (D, 1)
    slab = slab[:, 0]
    # every table entry lands on the shard its bucket index routes to,
    # its stored residual matches pack_residual of the sorted entry, and
    # the global padded position decodes back to the right baby index
    seen = set()
    for d in range(D):
        for b in range(per):
            gb = d * per + b
            if gb + 1 >= len(starts):
                continue
            n_real = int(starts[gb + 1]) - int(starts[gb])
            for s in range(n_real):
                gpos = gb * maxlen + s
                j = decode_packed_pos(gpos, starts, maxlen, tbl.perm)
                assert j is not None
                k = int(starts[gb]) + s               # sorted index
                res = match.pack_residual(
                    np.asarray([tbl.t0[k]], np.uint32),
                    np.asarray([tbl.t1[k]], np.uint32), shift)[0]
                assert int(slab[d, b, s]) == int(res)
                assert int(tbl.t0[k]) >> shift == gb  # routing invariant
                seen.add(j)
            # padded slots decode to None (sentinel false positives)
            if n_real < maxlen:
                assert decode_packed_pos(gb * maxlen + n_real, starts,
                                         maxlen, tbl.perm) is None
    assert seen == set(range(1, M + 1))        # nothing lost or duplicated


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

    import dataclasses
    B = cfg.lanes
    TB = len(targets) * B
    stride = cfg.stride                            # 512 keys per center
    span = D * B * cfg.steps * stride              # keys per dispatch/target
    c0 = 1 + M
    # seed T*(D*B) lanes target-major, reorder device-major (d, t, b) and
    # lift to Jacobian Z=1 — exactly BsgsEngine._seed's layout
    wide = dataclasses.replace(cfg, lanes=D * B)
    px, py = seed_lanes(wide, targets, c0, on_exact=record)
    px = np.asarray(px).reshape(8, len(targets), D, B) \
        .transpose(0, 2, 1, 3).reshape(8, -1)
    py = np.asarray(py).reshape(8, len(targets), D, B) \
        .transpose(0, 2, 1, 3).reshape(8, -1)
    pz = np.zeros_like(px)
    pz[0] = 1
    while c0 < 16384 and len(found) < len(targets):
        px, py, pz, lanes, jsel, counts, flags = step(px, py, pz)
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
            # jsel is a global padded slab position; pos_to_j maps to j
            j = step.pos_to_j(int(jsel[k]))
            if j is None:
                continue
            record(t, c - j)
            record(t, c + j)
        c0 += span
    assert sorted(found.values()) == sorted(keys)


def test_sharded_engine_with_table_partitions():
    """Composed regime (VERDICT r4 next-steps #5): 8 virtual devices x 2
    table partitions — each pass keeps piece p of every device's bucket
    shard resident and the engine sweeps the range once per partition;
    the planted keys must fall out of the PRODUCT BsgsEngine."""
    import tempfile, os
    from keyhunt_tpu.io.results import ResultSink
    from keyhunt_tpu.search.bsgs import BsgsEngine

    tbl = build_baby_table(M, pivots=2, width=32, steps=2)
    keys = [5000, 12345, 700]
    cfg = BsgsConfig(m=M, lanes=2, steps=2, table_partitions=2)
    with tempfile.TemporaryDirectory() as tmp:
        eng = BsgsEngine(cfg, tbl, [ecc.pubkey(k) for k in keys],
                         1, 16384, quiet=True, devices=D,
                         sink=ResultSink(path=os.path.join(tmp, "f.txt"),
                                         quiet=True))
        found = eng.run()
    assert sorted(found.values()) == sorted(keys)
    # the two passes' resident pieces must tile every device's shard:
    # piece p of device d covers [d*2*per + p*per, ...), so any bucket is
    # resident in exactly one (pass, device) cell
    slab4, starts, shift = shard_buckets_packed(tbl, D, parts=2)
    assert slab4.shape[0] == D and slab4.shape[1] == 2
