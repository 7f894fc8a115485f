"""BSGS parity tests: baby-table correctness, giant-walk hits, degenerate
cases, save/load (SURVEY.md §7 step 7; oracle style of tests/test120.txt —
targets with known keys)."""

import os
import tempfile

import numpy as np
import pytest

from keyhunt_tpu.ref import ecc
from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.search.bsgs import (
    BabyTable, BsgsConfig, BsgsEngine, build_baby_table, save_table,
    load_table, derive_m)

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

M = 256              # tiny baby table: stride 512 keys


def small_table(m=M):
    return build_baby_table(m, pivots=2, width=32, steps=2)


def test_baby_table_contents():
    tbl = small_table()
    # every j in 1..m must be present with the right fragment
    frag = {}
    for slot in range(tbl.m):
        frag[int(tbl.perm[slot])] = (int(tbl.t0[slot]), int(tbl.t1[slot]))
    for j in range(1, tbl.m + 1):
        x = ecc.pubkey(j)[0]
        assert frag[j - 1] == ((x >> 224) & 0xFFFFFFFF, (x >> 192) & 0xFFFFFFFF), f"j={j}"
    # sorted lexicographically
    packed = (tbl.t0.astype(np.uint64) << 32) | tbl.t1.astype(np.uint64)
    assert (np.diff(packed.astype(np.int64)) >= 0).all() or (np.sort(packed) == packed).all()


def _engine(tbl, targets, start, end, **kw):
    cfg = BsgsConfig(m=tbl.m, lanes=4, steps=2, **kw)
    tmp = tempfile.mkdtemp()
    sink = ResultSink(path=os.path.join(tmp, "found.txt"), quiet=True)
    return BsgsEngine(cfg, tbl, targets, start, end, sink=sink, quiet=True)


def test_bsgs_finds_planted_keys():
    tbl = small_table()
    keys = [5000, 12345, 777]
    targets = [ecc.pubkey(k) for k in keys]
    eng = _engine(tbl, targets, 1, 16384)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)


def test_bsgs_schedulers():
    tbl = small_table()
    keys = [9000]
    targets = [ecc.pubkey(k) for k in keys]
    for sched in ("backward", "both", "random", "dance", "angrygiant"):
        eng = _engine(tbl, targets, 1, 16384, scheduler=sched)
        found = eng.run(max_keys=10 * 16384)
        assert list(found.values()) == keys, sched


def test_bsgs_ggsb_blocks():
    """GGSB splits the baby table into blocks searched in passes; a key
    whose baby index lands in a LATER block must still be found."""
    tbl = small_table()
    keys = [9000, 777]
    targets = [ecc.pubkey(k) for k in keys]
    eng = _engine(tbl, targets, 1, 16384, scheduler="ggsb", block_count=4)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)
    # derivation parity (keyhunt.cpp:1477-1499)
    assert BsgsConfig(m=256, block_count=4).ggsb_blocks() == (4, 64)
    assert BsgsConfig(m=256, block_size=100).ggsb_blocks() == (3, 100)
    assert BsgsConfig(m=256, scheduler="ggsb").ggsb_blocks() == (1, 256)


def test_bsgs_center_exact_key():
    """Key exactly on a stride center: detected at seeding or via the
    degenerate-advance flag, not via table probes."""
    tbl = small_table()
    # c0 = start + m = 257; centers at 257 + i*512; pick key = center
    key = 257 + 512 * 3
    targets = [ecc.pubkey(key)]
    eng = _engine(tbl, targets, 1, 16384)
    found = eng.run()
    assert list(found.values()) == [key]


def test_bsgs_key_at_negated_point():
    """Targets whose giant point passes through ±jG with the negative
    sign exercise the c+j reconstruction branch."""
    tbl = small_table()
    keys = [257 + 512 * 2 + 100, 257 + 512 * 5 - 100]   # c+j and c-j forms
    targets = [ecc.pubkey(k) for k in keys]
    eng = _engine(tbl, targets, 1, 16384)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)


def test_table_save_load():
    tbl = small_table()
    with tempfile.TemporaryDirectory() as tmp:
        path = save_table(tbl, tmp)
        assert os.path.exists(path)
        tbl2 = load_table(tbl.m, tmp)
        assert tbl2 is not None
        assert (tbl2.t0 == tbl.t0).all() and (tbl2.perm == tbl.perm).all()
        # corrupt -> checksum failure
        data = np.load(path)
        np.savez(path, m=data["m"], t0=data["t0"] ^ 1, t1=data["t1"],
                 perm=data["perm"], sha256=data["sha256"])
        with pytest.raises(ValueError):
            load_table(tbl.m, tmp)


def test_derive_m():
    assert derive_m(None, 1) == 1 << 22
    assert derive_m(1 << 44, 4) == 4 << 22
    assert derive_m(1 << 20, 1) == 1 << 10
    with pytest.raises(SystemExit):
        derive_m((1 << 44) + 2, 1)


def test_table_save_load_dir_format():
    """Directory/memmap format (large-m regime): raw .npy arrays loaded
    with mmap_mode='r', per-file sha256 in meta.json."""
    tbl = small_table()
    with tempfile.TemporaryDirectory() as tmp:
        path = save_table(tbl, path=os.path.join(tmp, "big_table.d"))
        assert os.path.isdir(path)
        tbl2 = load_table(tbl.m, path=path)
        assert tbl2 is not None
        assert isinstance(tbl2.t0, np.memmap)
        assert (np.asarray(tbl2.t0) == tbl.t0).all()
        assert (np.asarray(tbl2.perm) == tbl.perm).all()
        assert tbl2.depth == tbl.depth
        # wrong m rejected
        with pytest.raises(ValueError):
            load_table(tbl.m * 2, path=path)
        # corruption detected
        t0p = os.path.join(path, "t0.npy")
        arr = np.load(t0p)
        np.save(t0p, arr ^ 1)
        with pytest.raises(ValueError):
            load_table(tbl.m, path=path)
        # -6 semantics: skip checksum loads anyway
        assert load_table(tbl.m, path=path, verify=False) is not None


def test_bsgs_engine_with_memmap_table():
    """The engine must search correctly off a memmap-backed table."""
    tbl = small_table()
    with tempfile.TemporaryDirectory() as tmp:
        path = save_table(tbl, path=os.path.join(tmp, "t.d"))
        tbl2 = load_table(tbl.m, path=path)
        keys = [5000, 777]
        targets = [ecc.pubkey(k) for k in keys]
        eng = _engine(tbl2, targets, 1, 16384)
        found = eng.run()
        assert sorted(found.values()) == sorted(keys)


def test_bucket_partitions_cover_table():
    """Every table entry lives in exactly one packed partition, at the
    global bucket row its value routes to, with the shared global starts
    prefix mapping its padded position back to the right baby index."""
    from keyhunt_tpu.ops import match
    from keyhunt_tpu.search.bsgs import bucket_partitions, decode_packed_pos
    import numpy as np
    tbl = small_table()
    parts, starts, shift = bucket_partitions(tbl, 4)
    maxlen = parts[0][0].shape[1]
    seen = set()
    for slab, base in parts:
        for r in range(slab.shape[0]):
            gb = base + r
            if gb + 1 >= len(starts):
                continue
            n_real = int(starts[gb + 1]) - int(starts[gb])
            for s in range(n_real):
                j = decode_packed_pos(gb * maxlen + s, starts, maxlen,
                                      tbl.perm)
                assert j is not None
                k = int(starts[gb]) + s                  # sorted index
                assert int(tbl.t0[k]) >> shift == gb     # routing invariant
                res = match.pack_residual(
                    np.asarray([tbl.t0[k]], np.uint32),
                    np.asarray([tbl.t1[k]], np.uint32), shift)[0]
                assert int(slab[r, s]) == int(res)
                seen.add(j)
            if n_real < maxlen:          # padded slots decode to None
                assert decode_packed_pos(gb * maxlen + n_real, starts,
                                         maxlen, tbl.perm) is None
    assert seen == set(range(1, tbl.m + 1))


def test_bsgs_partitioned_table_finds_keys():
    """Over-HBM regime: 4 resident partitions, 4 sweeps, same hits as the
    whole-table run — and ONE compile shared by all partitions."""
    tbl = small_table()
    keys = [5000, 12345, 777]
    targets = [ecc.pubkey(k) for k in keys]
    eng = _engine(tbl, targets, 1, 16384, table_partitions=4)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)


def test_bsgs_partitions_reject_bad_combos():
    import pytest as _pytest
    tbl = small_table()
    targets = [ecc.pubkey(5000)]
    with _pytest.raises(ValueError, match="pick one"):
        _engine(tbl, targets, 1, 16384, table_partitions=2,
                scheduler="ggsb")


def test_bsgs_target_dropout_resize():
    """Found targets drop out of the device batch (the reference only
    walks unfound targets, keyhunt.cpp:4642): after the early key is
    found, the engine rebuilds with the unfound targets and wider lanes
    and still finds every key."""
    tbl = small_table()
    keys = [600, 12000, 15000]            # one early, two late
    targets = [ecc.pubkey(k) for k in keys]
    # small span (lanes=2, steps=1 -> 1024 keys/dispatch) so the early
    # key drains while plenty of range remains and the dropout can fire
    cfg = BsgsConfig(m=tbl.m, lanes=2, steps=1)
    tmp = tempfile.mkdtemp()
    sink = ResultSink(path=os.path.join(tmp, "found.txt"), quiet=True)
    eng = BsgsEngine(cfg, tbl, targets, 1, 16384, sink=sink, quiet=True)
    found = eng.run()
    assert sorted(found.values()) == sorted(keys)
    # the dropout actually happened: fewer live targets, wider lanes
    assert len(eng.targets) < len(keys)
    assert eng.cfg.lanes > 2
