"""Device-resident baby table (search.dtable): sort-free on-device build
must hold EVERY baby j at the bucket slot its fragment routes to, probe
bit-identically to the packed host table, recover exact j from the
packed 8-bit hint (the r5 5 B/slot layout), and drive BsgsEngine
end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from keyhunt_tpu.ops import match
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine, build_baby_table
from keyhunt_tpu.search.dtable import (DeviceTable, build_device_table,
                                       geometry, jshift_for, n_halves)

M = 512
GEO = dict(pivots=2, width=32, steps=2)    # span=128 device batches

# the on-device build compiles a real jit graph — slow tier on XLA:CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dtbl():
    return build_device_table(M, avg=32, **GEO)


def test_dtable_holds_every_baby(dtbl):
    """Every occupied slot decodes (via the hint + re-walk) to a distinct
    j in 1..M, residuals match the host-sorted ground truth, and nothing
    is lost."""
    host = build_baby_table(M, **GEO)
    maxlen = dtbl.maxlen
    res = np.asarray(dtbl.res_slab).reshape(-1, maxlen)
    nb = res.shape[0]
    assert dtbl.overflow == 0
    frag_by_j = {int(host.perm[i]) + 1: (int(host.t0[i]), int(host.t1[i]))
                 for i in range(M)}
    seen = set()
    for b in range(nb):
        for s in range(maxlen):
            r = int(res[b, s])
            if r == 0xFFFFFFFF:
                continue
            j = dtbl.pos_to_j(b * maxlen + s)
            assert j is not None, (b, s)
            w0, w1 = frag_by_j[j]
            assert w0 >> dtbl.shift == b
            want = match.pack_residual(np.asarray([w0], np.uint32),
                                       np.asarray([w1], np.uint32),
                                       dtbl.shift)[0]
            assert r == int(want)
            seen.add(j)
    assert seen == set(range(1, M + 1))


def test_dtable_probe_and_decode(dtbl):
    # default build is 2-D (row-gather probe layout); exact j comes from
    # the 8-bit hint + bounded re-walk (2^jshift window)
    assert dtbl.res_slab.ndim == 2 and dtbl.flat_maxlen is None
    assert dtbl.jshift == jshift_for(M) == 1
    for j in (1, 2, 33, 100, 511, 512):
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


def test_dtable_split_slab_engine():
    """Split slabs (two bucket-contiguous pieces — the >=2^31-slot regime
    at m=2^31) exercised at test scale by forcing the split: the tuple
    probe path + global position decode must find planted keys."""
    dtbl = build_device_table(M, avg=32, **GEO)
    # re-split the built slab into two halves exactly as the big-m build
    # lays them out (bucket-contiguous, local flat per half)
    res = np.asarray(dtbl.res_slab)
    jw = np.asarray(dtbl.j_words)
    nb = res.shape[0]
    half = nb // 2
    split = DeviceTable(
        m=M,
        res_slab=(jnp.asarray(res[:half]), jnp.asarray(res[half:])),
        j_words=(jnp.asarray(jw[: jw.size // 2]),
                 jnp.asarray(jw[jw.size // 2:])),
        shift=dtbl.shift, maxlen=dtbl.maxlen, overflow=0)
    for j in (1, 100, 512):
        x = ecc.pubkey(j)[0]
        w0 = np.uint32((x >> 224) & 0xFFFFFFFF)
        w1 = np.uint32((x >> 192) & 0xFFFFFFFF)
        gb = int(w0) >> dtbl.shift
        h = 0 if gb < half else 1
        hit, pos = match.probe_buckets_packed_ranged(
            jnp.asarray(split.res_slab[h]), jnp.asarray([w0]),
            jnp.asarray([w1]), dtbl.shift, jnp.int32(h * half))
        assert bool(np.asarray(hit)[0])
        assert split.pos_to_j(int(np.asarray(pos)[0])) == j
    keys = [5000, 12345]
    targets = [ecc.pubkey(k) for k in keys]
    cfg = BsgsConfig(m=M, lanes=4, steps=2)
    eng = BsgsEngine(cfg, split, targets, 1, 16384, quiet=True)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)


def test_geometry_lane_aligned():
    nb, shift, maxlen = geometry(1 << 30, avg=256)
    assert nb == 1 << 22 and shift == 10 and maxlen % 128 == 0
    assert n_halves(nb, maxlen) == 1
    # m=2^31 at avg=1024: past the int32 flat ceiling -> two halves
    nb, shift, maxlen = geometry(1 << 31, avg=1024)
    assert nb == 1 << 21 and maxlen == 1280
    assert n_halves(nb, maxlen) == 2
    assert jshift_for(1 << 31) == 23
