"""Device-resident baby table (search.dtable): sort-free on-device build
must hold EVERY baby j at the bucket slot its fragment routes to, probe
bit-identically to the packed host table, and drive BsgsEngine end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from keyhunt_tpu.ops import match
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine, build_baby_table
from keyhunt_tpu.search.dtable import DeviceTable, build_device_table, geometry

M = 512
GEO = dict(pivots=2, width=32, steps=2)    # span=128 device batches

# the on-device build compiles a real jit graph — slow tier on XLA:CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dtbl():
    return build_device_table(M, avg=32, **GEO)


def test_dtable_holds_every_baby(dtbl):
    host = build_baby_table(M, **GEO)
    maxlen = dtbl.maxlen
    res = np.asarray(dtbl.res_slab).reshape(-1, maxlen)
    jsl = np.asarray(dtbl.j_slab).reshape(-1, maxlen)
    nb = res.shape[0]
    assert dtbl.overflow == 0
    seen = {}
    for b in range(nb):
        for s in range(maxlen):
            j = int(jsl[b, s])
            if j == 0xFFFFFFFF:
                continue
            seen[j + 1] = (b, s, int(res[b, s]))
    assert set(seen) == set(range(1, M + 1))
    # each entry's residual/bucket matches the host-sorted ground truth
    pk = (host.t0.astype(np.uint64) << 32) | host.t1.astype(np.uint64)
    frag_by_j = {int(host.perm[i]) + 1: (int(host.t0[i]), int(host.t1[i]))
                 for i in range(M)}
    for j, (b, s, r) in seen.items():
        w0, w1 = frag_by_j[j]
        assert w0 >> dtbl.shift == b
        want = match.pack_residual(np.asarray([w0], np.uint32),
                                   np.asarray([w1], np.uint32), dtbl.shift)[0]
        assert r == int(want)


def test_dtable_probe_and_decode(dtbl):
    # default build is 2-D (row-gather probe layout) with flat j decode
    assert dtbl.res_slab.ndim == 2 and dtbl.flat_maxlen is None
    for j in (1, 33, 100, 511, 512):
        x = ecc.pubkey(j)[0]
        w0 = np.uint32((x >> 224) & 0xFFFFFFFF)
        w1 = np.uint32((x >> 192) & 0xFFFFFFFF)
        hit, pos = match.probe_buckets_packed(
            jnp.asarray(dtbl.res_slab), jnp.asarray([w0]),
            jnp.asarray([w1]), dtbl.shift)
        assert bool(np.asarray(hit)[0])
        assert dtbl.pos_to_j(int(np.asarray(pos)[0])) == j


def test_dtable_flat_layout_probe():
    # rows2d=False keeps the build layout; the windowed flat probe and
    # the engine's flat_maxlen routing must still work
    dtbl = build_device_table(M, avg=32, rows2d=False, **GEO)
    assert dtbl.res_slab.ndim == 1 and dtbl.flat_maxlen == dtbl.maxlen
    for j in (1, 100, 512):
        x = ecc.pubkey(j)[0]
        w0 = np.uint32((x >> 224) & 0xFFFFFFFF)
        w1 = np.uint32((x >> 192) & 0xFFFFFFFF)
        hit, pos = match.probe_buckets_packed_flat(
            jnp.asarray(dtbl.res_slab), dtbl.maxlen, jnp.asarray([w0]),
            jnp.asarray([w1]), dtbl.shift)
        assert bool(np.asarray(hit)[0])
        assert dtbl.pos_to_j(int(np.asarray(pos)[0])) == j


def test_dtable_engine_finds_keys(dtbl):
    keys = [5000, 12345]
    targets = [ecc.pubkey(k) for k in keys]
    cfg = BsgsConfig(m=M, lanes=4, steps=2)
    eng = BsgsEngine(cfg, dtbl, targets, 1, 16384, quiet=True)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)


def test_geometry_lane_aligned():
    nb, shift, maxlen = geometry(1 << 30, avg=256)
    assert nb == 1 << 22 and shift == 10 and maxlen % 128 == 0
