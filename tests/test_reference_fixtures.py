"""End-to-end runs against the UNTOUCHED upstream fixtures in
/root/reference/tests (SURVEY.md §4.1 known-answer strategy): the engines
must reproduce the documented hits bit-exactly.

These compile the full hash graphs, so they are `slow` and need the
attached accelerator (XLA:CPU takes minutes per hash compile)."""

import os
import tempfile

import jax
import pytest

from keyhunt_tpu.io import base58
from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.io.targets import (load_hash160_file, load_eth_file,
                                    load_xpoint_file, load_pubkeys_file)
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160, eth_address
from keyhunt_tpu.search.walker import WalkerConfig
from keyhunt_tpu.search.engine import Engine
from conftest import reference_fixture

accel = pytest.mark.skipif(jax.default_backend() == "cpu",
                           reason="hash graphs need the accelerator toolchain")

#: Bitcoin puzzle-transaction private keys 1..16 (public knowledge; the
#: keys of tests/1to32.* rows 1-16, all < 0x10000 — README.md:184-215)
PUZZLE_KEYS_16 = [1, 3, 7, 8, 21, 49, 76, 224, 467, 514, 1155, 2683,
                  5216, 10544, 26867, 51510]


def _fixture_or_skip(name):
    p = reference_fixture(name)
    if p is None:
        pytest.skip(f"reference fixture {name} unavailable")
    return p


def _sink(tmp):
    return ResultSink(path=os.path.join(tmp, "found.txt"), quiet=True)


CFG = dict(pivots=8, width=256, steps=4, max_hits=16)


def _self_check(ts, mode):
    """The hardcoded puzzle keys must be what the upstream file contains."""
    for k in PUZZLE_KEYS_16:
        pt = ecc.pubkey(k)
        if mode == "hash160":
            assert hash160(ecc.compress(pt)) in ts.exact
        elif mode == "eth":
            assert eth_address(pt[0], pt[1]) in ts.exact
        else:
            assert pt[0] in ts.exact


@accel
@pytest.mark.slow
def test_rmd160_1to32_range_ffff():
    ts = load_hash160_file(_fixture_or_skip("1to32.rmd"), is_address=False)
    _self_check(ts, "hash160")
    with tempfile.TemporaryDirectory() as tmp:
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 1, 0xFFFF,
                     sink=_sink(tmp), quiet=True)
        eng.run()
    assert eng.found_keys == set(PUZZLE_KEYS_16)


@accel
@pytest.mark.slow
def test_address_1to32_range_ffff():
    ts = load_hash160_file(_fixture_or_skip("1to32.txt"), is_address=True)
    _self_check(ts, "hash160")
    with tempfile.TemporaryDirectory() as tmp:
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 1, 0xFFFF,
                     sink=_sink(tmp), quiet=True)
        eng.run()
    assert eng.found_keys == set(PUZZLE_KEYS_16)


@accel
@pytest.mark.slow
def test_eth_1to32_range_ffff():
    ts = load_eth_file(_fixture_or_skip("1to32.eth"))
    _self_check(ts, "eth")
    with tempfile.TemporaryDirectory() as tmp:
        eng = Engine(WalkerConfig(mode="eth", **CFG), ts, 1, 0xFFFF,
                     sink=_sink(tmp), quiet=True)
        eng.run()
    assert eng.found_keys == set(PUZZLE_KEYS_16)


@pytest.mark.slow
def test_xpoint_1to63_range_ffff():
    ts = load_xpoint_file(_fixture_or_skip("1to63_65.txt"))
    _self_check(ts, "xpoint")
    with tempfile.TemporaryDirectory() as tmp:
        eng = Engine(WalkerConfig(mode="xpoint", **CFG), ts, 1, 0xFFFF,
                     sink=_sink(tmp), quiet=True)
        eng.run()
    assert eng.found_keys == set(PUZZLE_KEYS_16)


@accel
@pytest.mark.slow
def test_minikeys_reference_hit():
    """The documented minikey hit (README.md:1253-1273): target address
    15azScMmHvFPAQfQafrKr48E9MqRRXSnVv, minikey SG64GZqySYwBm9KxE3wJ29.
    Scans from a base 66 counter steps below the hit."""
    from keyhunt_tpu.search.minikeys import MinikeysConfig, MinikeysEngine
    ts = load_hash160_file(_fixture_or_skip("minikeys.txt"), is_address=True)
    with tempfile.TemporaryDirectory() as tmp:
        eng = MinikeysEngine(MinikeysConfig(filter_batch=4096, solve_lanes=128),
                             ts, base="SG64GZqySYwBm9KxE3wJ11",
                             sink=_sink(tmp), quiet=True)
        found = eng.run(max_candidates=4096)
    assert ("SG64GZqySYwBm9KxE3wJ29",
            0x0d1a4fc1f83b2f3b31dcd999acd8288ff346f7df46401596d53964e0c69d5b4d
            ) in found


@pytest.mark.slow
def test_bsgs_test120_narrowed_window():
    """tests/test120.txt carries its two private keys in trailing comments
    (README.md:620-627) — BSGS over a narrowed window must recover both."""
    from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine, build_baby_table
    pts = load_pubkeys_file(_fixture_or_skip("test120.txt"))
    assert len(pts) == 2
    k1 = 0x800000000000000000100000000000
    k2 = 0x800000000000000000200000000000
    m = 1 << 22
    tbl = build_baby_table(m)
    cfg = BsgsConfig(m=m, lanes=1024, steps=8)
    lo, hi = k1 - (1 << 30), k2 + (1 << 30)
    with tempfile.TemporaryDirectory() as tmp:
        eng = BsgsEngine(cfg, tbl, pts, lo, hi, sink=_sink(tmp), quiet=True)
        found = eng.run()
    assert sorted(found.values()) == [k1, k2]
