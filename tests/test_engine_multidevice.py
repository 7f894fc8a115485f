"""Engine/CLI-level multi-device parity (VERDICT r1 item 1): the SAME
engine and CLI entry points used for production runs, with devices=8 on
the virtual CPU mesh, must find exactly what a single device finds.

Uses xpoint-mode configs (hash-free) so XLA:CPU compile time stays sane —
the sharding semantics under test are mode-independent.
"""

import os
import tempfile

import numpy as np

from keyhunt_tpu.ref import ecc
from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.io.targets import load_xpoint_file
from keyhunt_tpu.search.walker import WalkerConfig
from keyhunt_tpu.search.engine import Engine
from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine, build_baby_table
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def _sink(tmp):
    return ResultSink(path=os.path.join(tmp, "found.txt"), quiet=True)


def _xpoint_file(tmp, keys):
    p = os.path.join(tmp, "targets.pub")
    with open(p, "w") as fh:
        for k in keys:
            fh.write(f"{ecc.pubkey(k)[0]:064x}\n")
    return p


CFG = dict(pivots=2, width=32, steps=2, mode="xpoint", max_hits=8)
PLANT = [300, 301, 512, 999, 1400, 70, 3]       # incl. host low-region keys


def _run_engine(devices):
    with tempfile.TemporaryDirectory() as tmp:
        ts = load_xpoint_file(_xpoint_file(tmp, PLANT))
        eng = Engine(WalkerConfig(**CFG), ts, 1, 1600, sink=_sink(tmp),
                     quiet=True, devices=devices)
        eng.run()
        # the engine canonicalizes xpoint hits to the in-range key
        # (keyhunt.cpp:3629-3634 sign fix): raw set equality is the contract
        return eng.found_keys


def test_walker_engine_1_vs_8_devices():
    assert _run_engine(1) == set(PLANT)
    assert _run_engine(8) == set(PLANT)


def test_walker_engine_8_devices_random_mode():
    with tempfile.TemporaryDirectory() as tmp:
        ts = load_xpoint_file(_xpoint_file(tmp, PLANT))
        eng = Engine(WalkerConfig(**CFG), ts, 1, 1600, sink=_sink(tmp),
                     quiet=True, devices=8, random_mode=True, rng_seed=3,
                     n_seq=1024)
        eng.run(max_keys=64 * 1600)
        assert eng.found_keys == set(PLANT)


def test_bsgs_engine_1_vs_8_devices():
    tbl = build_baby_table(256, pivots=2, width=32, steps=2)
    keys = [5000, 12345, 777]
    targets = [ecc.pubkey(k) for k in keys]
    for devices in (1, 8):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = BsgsConfig(m=256, lanes=4, steps=2)
            eng = BsgsEngine(cfg, tbl, targets, 1, 16384, sink=_sink(tmp),
                             quiet=True, devices=devices)
            found = eng.run()
            assert sorted(found.values()) == sorted(keys), f"devices={devices}"


def test_bsgs_two_degenerate_lanes_one_step():
    """Adversarial: two targets whose giant points BOTH x-equal the advance
    point in the same inner step (straddling one advance stride). The old
    single-argmax flag slot dropped one of them silently."""
    tbl = build_baby_table(256, pivots=2, width=32, steps=2)
    cfg = BsgsConfig(m=256, lanes=4, steps=2)
    # c0 = start + m = 257; centers c = c0 + (lane + step*4)*512;
    # degenerate when key = c ± 4*512. Pick two lanes of step 1.
    c0 = 257
    adv = 4 * 512
    keys = [c0 + (0 + 1 * 4) * 512 + adv, c0 + (2 + 1 * 4) * 512 + adv]
    targets = [ecc.pubkey(k) for k in keys]
    with tempfile.TemporaryDirectory() as tmp:
        eng = BsgsEngine(cfg, tbl, targets, 1, 16384, sink=_sink(tmp),
                         quiet=True)
        found = eng.run()
        assert sorted(found.values()) == sorted(keys)


def test_cli_xpoint_8_devices(capsys):
    from keyhunt_tpu import cli
    with tempfile.TemporaryDirectory() as tmp:
        path = _xpoint_file(tmp, [999, 1400])
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            rc = cli.main(["-m", "xpoint", "-f", path, "-r", "1:1600",
                           "--devices", "8", "--pivots", "2", "--width", "32",
                           "--steps", "2", "-q"])
            txt = open("KEYFOUNDKEYFOUND.txt").read()
        finally:
            os.chdir(cwd)
        assert rc == 0
        assert f"{999:064x}" in txt and f"{1400:064x}" in txt


def test_walker_engine_8_devices_compressed_hash160():
    """Hash-mode sharding parity (VERDICT r2 weak #5): the sharded walker
    with the real hash160 pipeline (jnp path on the CPU mesh) must find
    the same keys as a 1-device run. Tiny shapes: the sha256+rmd160 graph
    is what's under test, not throughput."""
    from keyhunt_tpu.io.targets import load_hash160_file
    from keyhunt_tpu.ref.hashes import hash160
    cfg = dict(pivots=2, width=8, steps=2, mode="compressed", max_hits=8)
    plant = [90, 300, 512]
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.rmd")
        with open(p, "w") as fh:
            for k in plant:
                fh.write(hash160(ecc.compress(ecc.pubkey(k))).hex() + "\n")
        ts = load_hash160_file(p, is_address=False)
        results = {}
        for devices in (1, 8):
            eng = Engine(WalkerConfig(**cfg), ts, 1, 640, sink=_sink(tmp),
                         quiet=True, devices=devices)
            eng.run()
            results[devices] = set(eng.found_keys)
    assert results[1] == set(plant)
    assert results[8] == set(plant)


def test_walker_engine_8_devices_eth():
    """ETH (keccak) pipeline under sharding, 1-vs-8 parity."""
    from keyhunt_tpu.io.targets import load_eth_file
    from keyhunt_tpu.ref.hashes import eth_address
    cfg = dict(pivots=2, width=8, steps=2, mode="eth", max_hits=8)
    plant = [90, 300, 512]
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.eth")
        with open(p, "w") as fh:
            for k in plant:
                fh.write(eth_address(*ecc.pubkey(k)).hex() + "\n")
        ts = load_eth_file(p)
        results = {}
        for devices in (1, 8):
            eng = Engine(WalkerConfig(**cfg), ts, 1, 640, sink=_sink(tmp),
                         quiet=True, devices=devices)
            eng.run()
            results[devices] = set(eng.found_keys)
    assert results[1] == set(plant)
    assert results[8] == set(plant)
