"""Vanity-mode tests: prefix->range expansion and end-to-end prefix hits."""

import os
import tempfile

from keyhunt_tpu.io import base58
from keyhunt_tpu.io.targets import vanity_ranges, load_vanity_targets
from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160
from keyhunt_tpu.search.vanity import make_vanity_engine
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def test_vanity_ranges_contain_matching_address():
    # pick a real key, derive its address, use its first 4 chars as prefix
    h = hash160(ecc.compress(ecc.pubkey(999)))
    addr = base58.p2pkh_address(h)
    prefix = addr[:4]
    ranges = vanity_ranges(prefix)
    assert any(lo <= h <= hi for lo, hi in ranges), (addr, prefix)


def test_vanity_ranges_exclude_nonmatching():
    h = hash160(ecc.compress(ecc.pubkey(999)))
    ranges = vanity_ranges("1zzzz")
    addr = base58.p2pkh_address(h)
    if not addr.startswith("1zzzz"):
        assert not any(lo <= h <= hi for lo, hi in ranges)


def test_vanity_search_finds_prefix():
    # target: the address of a planted key; prefix = its first 5 chars,
    # guaranteeing >=1 hit in range
    key = 700
    addr = base58.p2pkh_address(hash160(ecc.compress(ecc.pubkey(key))))
    prefix = addr[:5]
    tmp = tempfile.mkdtemp()
    sink = ResultSink(path=os.path.join(tmp, "vanity.txt"), quiet=True)
    eng = make_vanity_engine([prefix], 257, 1600, pivots=4, width=64,
                             steps=2, quiet=True, sink=sink)
    eng.run()
    assert key in eng.found_keys
    for k in eng.found_keys:
        a = base58.p2pkh_address(hash160(ecc.compress(ecc.pubkey(k))))
        assert a.startswith(prefix)
    assert os.path.exists(os.path.join(tmp, "vanity.txt"))
