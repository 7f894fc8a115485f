"""Target parsing + cache persistence tests (readFileAddress / data_*.dat
semantics, keyhunt.cpp:7033-7857), base58 codec, and reference fixture
parsing when available."""

import os

import numpy as np
import pytest

from keyhunt_tpu.io import base58, targets as tio
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160
from conftest import reference_fixture


def test_base58_roundtrip():
    for data in (b"", b"\x00", b"\x00\x00abc", bytes(range(25)), b"\xff" * 20):
        assert base58.b58decode(base58.b58encode(data)) == data
    payload = b"\x00" + bytes(20)
    s = base58.b58encode_check(payload)
    assert base58.b58decode_check(s) == payload
    with pytest.raises(ValueError):
        base58.b58decode_check(s[:-1] + ("1" if s[-1] != "1" else "2"))


def test_known_address():
    # well-known: address of private key 1
    h = hash160(ecc.compress(ecc.pubkey(1)))
    assert base58.p2pkh_address(h) == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"


def test_hash160_cache_roundtrip(tmp_path):
    lines = [hash160(ecc.compress(ecc.pubkey(k))).hex() for k in (5, 6, 7)]
    p = tmp_path / "t.rmd"
    p.write_text("\n".join(lines) + "\n")
    ts1 = tio.load_hash160_file(str(p), is_address=False, use_cache=True,
                                cache_dir=str(tmp_path))
    cpath = tio._cache_path(str(p), str(tmp_path))
    assert os.path.exists(cpath)
    ts2 = tio.load_hash160_file(str(p), is_address=False, use_cache=True,
                                cache_dir=str(tmp_path))
    assert ts1.exact == ts2.exact
    assert (ts1.t0 == ts2.t0).all() and (ts1.t1 == ts2.t1).all()


def test_xpoint_cache_roundtrip(tmp_path):
    lines = [ecc.compress(ecc.pubkey(k)).hex() for k in (11, 12)]
    p = tmp_path / "t.pub"
    p.write_text("\n".join(lines) + "\n")
    ts1 = tio.load_xpoint_file(str(p), use_cache=True, cache_dir=str(tmp_path))
    ts2 = tio.load_xpoint_file(str(p), use_cache=True, cache_dir=str(tmp_path))
    assert ts1.exact == ts2.exact


def test_cache_checksum_detects_corruption(tmp_path):
    lines = [hash160(ecc.compress(ecc.pubkey(9))).hex()]
    p = tmp_path / "t.rmd"
    p.write_text("\n".join(lines) + "\n")
    tio.load_hash160_file(str(p), is_address=False, use_cache=True,
                          cache_dir=str(tmp_path))
    cpath = tio._cache_path(str(p), str(tmp_path))
    d = np.load(cpath)
    np.savez(cpath, mode=d["mode"], exact=d["exact"], t0=d["t0"] ^ 1,
             t1=d["t1"], sha256=d["sha256"])
    with pytest.raises(ValueError):
        tio.load_hash160_file(str(p), is_address=False, use_cache=True,
                              cache_dir=str(tmp_path))


def test_comment_stripping(tmp_path):
    h = hash160(ecc.compress(ecc.pubkey(3)))
    p = tmp_path / "t.rmd"
    p.write_text(f"{h.hex()}  # puzzle comment\n\n{h.hex()}\tanother\n")
    ts = tio.load_hash160_file(str(p), is_address=False)
    assert ts.exact == {h}


def test_reference_address_fixture_parses():
    path = reference_fixture("1to32.txt")
    if path is None:
        pytest.skip("reference fixtures not available")
    ts = tio.load_hash160_file(path, is_address=True)
    assert ts.count == 32
    # puzzle #1's key is 1: its address hash160 must be in the set
    assert hash160(ecc.compress(ecc.pubkey(1))) in ts.exact


def test_reference_rmd_fixture_parses():
    path = reference_fixture("1to32.rmd")
    if path is None:
        pytest.skip("reference fixtures not available")
    ts = tio.load_hash160_file(path, is_address=False)
    assert ts.count == 32
    assert hash160(ecc.compress(ecc.pubkey(1))) in ts.exact
