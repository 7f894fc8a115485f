"""util.py vs the reference's util.c:358-416 behavior."""

from keyhunt_tpu.util import NK_TABLE, validate_nk, is_valid_hex, get_total_ram


def test_nk_table_matches_reference():
    # spot values straight from util.c:367-371
    assert NK_TABLE[20] == 1
    assert NK_TABLE[44] == 4096
    assert NK_TABLE[64] == 4194304
    assert len(NK_TABLE) == 23


def test_validate_nk():
    assert validate_nk(1 << 44, 4096)
    assert not validate_nk(1 << 44, 4097)       # k over max
    assert not validate_nk(1 << 19, 1)          # below 2^20
    assert not validate_nk((1 << 44) + 8, 1)    # not a power of two
    assert not validate_nk(1 << 45, 1)          # odd exponent not in table
    assert not validate_nk(1 << 44, 0)


def test_is_valid_hex():
    assert is_valid_hex("0aF9")
    assert not is_valid_hex("0x12")
    assert not is_valid_hex("")


def test_get_total_ram():
    assert get_total_ram() > 0


def test_fast_put_chunked_roundtrip(monkeypatch):
    """runtime.fast_put must assemble chunked transfers bit-exactly (and
    its checksum must pass) — exercised with a tiny chunk size so the
    donated in-place update path runs on CPU."""
    import numpy as np
    from keyhunt_tpu import runtime
    monkeypatch.setattr(runtime, "_PUT_CHUNK_BYTES", 1 << 10)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**32, size=(37, 19), dtype=np.uint64).astype(np.uint32)
    d = runtime.fast_put(a)
    assert np.array_equal(np.asarray(d), a)
    # small arrays take the single-put path
    b = rng.integers(0, 2**32, size=(4,), dtype=np.uint64).astype(np.uint32)
    assert np.array_equal(np.asarray(runtime.fast_put(b)), b)
