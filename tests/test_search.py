"""End-to-end search-mode tests with planted targets (the fixture-driven
strategy of SURVEY.md §4, scaled to CI sizes)."""

import os
import tempfile

import pytest

from keyhunt_tpu.io import base58
from keyhunt_tpu.io.targets import load_hash160_file, load_xpoint_file, load_eth_file
from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160, eth_address
from keyhunt_tpu.search.walker import WalkerConfig
from keyhunt_tpu.search.engine import Engine

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

CFG = dict(pivots=4, width=64, steps=2, max_hits=8)

PLANT = [300, 301, 512, 999, 1400]   # keys inside [257, 1537] walker region
LOW = [3, 7, 40]                     # keys inside the host-covered low region


def _sink(tmp):
    return ResultSink(path=os.path.join(tmp, "found.txt"), quiet=True)


def _write(tmp, name, lines):
    p = os.path.join(tmp, name)
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return p


def test_rmd160_mode():
    with tempfile.TemporaryDirectory() as tmp:
        lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in PLANT + LOW]
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 1, 1600,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(PLANT + LOW)


def test_address_mode():
    with tempfile.TemporaryDirectory() as tmp:
        lines = [base58.p2pkh_address(hash160(ecc.compress(ecc.pubkey(k))))
                 for k in PLANT]
        ts = load_hash160_file(_write(tmp, "t.txt", lines), is_address=True)
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 257, 1600,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(PLANT)


def test_uncompressed_mode():
    with tempfile.TemporaryDirectory() as tmp:
        lines = [hash160(ecc.uncompress_bytes(ecc.pubkey(k))).hex() for k in PLANT]
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="uncompressed", **CFG), ts, 257, 1600,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(PLANT)


def test_xpoint_mode():
    with tempfile.TemporaryDirectory() as tmp:
        lines = [ecc.compress(ecc.pubkey(k)).hex() for k in PLANT[:3]]
        lines.append(f"{ecc.pubkey(PLANT[3])[0]:064x}")      # raw X form
        lines.append(ecc.uncompress_bytes(ecc.pubkey(PLANT[4])).hex())
        ts = load_xpoint_file(_write(tmp, "t.pub", lines))
        eng = Engine(WalkerConfig(mode="xpoint", **CFG), ts, 257, 1600,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        # xpoint hits may legitimately resolve to N-k; X coords must match
        got_x = {ecc.pubkey(k)[0] for k in eng.found_keys}
        assert got_x == {ecc.pubkey(k)[0] for k in PLANT}


def test_eth_mode():
    with tempfile.TemporaryDirectory() as tmp:
        lines = ["0x" + eth_address(*ecc.pubkey(k)).hex() for k in PLANT]
        ts = load_eth_file(_write(tmp, "t.eth", lines))
        eng = Engine(WalkerConfig(mode="eth", **CFG), ts, 257, 1600,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(PLANT)


def test_random_mode_finds_target():
    with tempfile.TemporaryDirectory() as tmp:
        lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in PLANT]
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 257, 1600,
                     sink=_sink(tmp), quiet=True, random_mode=True, rng_seed=42)
        eng.run(max_keys=20000)
        assert set(PLANT) <= eng.found_keys | set(PLANT)  # no false keys
        for k in eng.found_keys:
            assert k in PLANT


def test_endomorphism_mode():
    """-e search: a target whose key k has lambda*k' = k for a walk key k'
    in range is found via the beta*X check. Plant targets directly: walk
    keys W, their lambda-multiples are the planted target keys."""
    walk_keys = [400, 900]
    target_keys = [k * ecc.LAMBDA % ecc.N for k in walk_keys]
    with tempfile.TemporaryDirectory() as tmp:
        lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in target_keys]
        # also one plain in-range key to check the base variant still works
        lines.append(hash160(ecc.compress(ecc.pubkey(555))).hex())
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="compressed", endo=True, **CFG),
                     ts, 257, 1600, sink=_sink(tmp), quiet=True)
        eng.run()
        want = set(target_keys) | {555}
        # verification may record the negated twin; compare via X coords
        got_x = {ecc.pubkey(k)[0] for k in eng.found_keys}
        assert {ecc.pubkey(k)[0] for k in want} <= got_x


def test_pivot_advance_doubling():
    """Range aligned so a pivot key hits exactly A*W*stride: the pivot
    advance P+SP degenerates to doubling and must still walk correctly."""
    with tempfile.TemporaryDirectory() as tmp:
        # A=4, W=64: pivot keys at k0 + a*64; start=193 -> k0=192, pivot a=1
        # sits at key 256 = A*W -> P == SP on the first advance.
        plant = [1000, 1100]
        lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in plant]
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="compressed", **CFG), ts, 193, 1200,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(plant)


def test_stride():
    with tempfile.TemporaryDirectory() as tmp:
        # stride 3 from 258: keys 258, 261, ..., plant on-grid keys
        plant = [258 + 3 * 7, 258 + 3 * 100]
        lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in plant]
        ts = load_hash160_file(_write(tmp, "t.rmd", lines), is_address=False)
        eng = Engine(WalkerConfig(mode="compressed", pivots=4, width=32,
                                  steps=2, stride=3), ts, 258, 258 + 3 * 200,
                     sink=_sink(tmp), quiet=True)
        eng.run()
        assert eng.found_keys == set(plant)
