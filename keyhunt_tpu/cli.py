"""Command-line interface.

Presents the reference's user surface (`menu()`, keyhunt.cpp:6624-6675)
with argparse: the same mode names, range/bit flags, and behaviour knobs,
plus TPU-specific sizing options. Unsupported/no-op flags are accepted
where harmless so existing keyhunt invocations translate directly.
"""

from __future__ import annotations

import argparse
import os
import sys

from . import runtime


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="keyhunt-tpu",
        description="TPU-native secp256k1 key search (keyhunt-compatible surface)")
    p.add_argument("-m", "--mode", required=True,
                   choices=["address", "rmd160", "xpoint", "eth", "bsgs", "minikeys", "vanity"],
                   help="search mode (keyhunt -m)")
    p.add_argument("-f", "--file", help="target file (keyhunt -f)")
    p.add_argument("-r", "--range", help="range START:END in hex (keyhunt -r)")
    p.add_argument("-b", "--bits", type=int, help="search bit range n: [2^(n-1), 2^n) (keyhunt -b)")
    p.add_argument("-l", "--look", default="compress",
                   choices=["compress", "uncompress", "both"],
                   help="address form searched (keyhunt -l)")
    p.add_argument("-R", "--random", action="store_true", help="random chunk order (keyhunt -R)")
    p.add_argument("-I", "--stride", default="1", help="key stride in hex/dec (keyhunt -I)")
    p.add_argument("-t", "--threads", type=int, default=1,
                   help="accepted for CLI parity; device parallelism is per-chip batch + mesh")
    p.add_argument("-k", "--kfactor", type=int, default=1, help="BSGS k factor (keyhunt -k)")
    p.add_argument("-n", "--nvalue", default=None,
                   help="BSGS: N per cycle; other modes: keys per random "
                        "base with -R (keyhunt -n)")
    p.add_argument("-B", "--bsgs-mode", default="sequential",
                   choices=["sequential", "backward", "both", "random",
                            "dance", "ggsb", "angrygiant"],
                   help="BSGS scheduler (keyhunt -B)")
    p.add_argument("--bsgs-block-count", type=int, default=0,
                   help="GGSB: split babies into n blocks (implies -B ggsb)")
    p.add_argument("--bsgs-block-size", type=int, default=0,
                   help="GGSB: babies per block; count derived if only size given")
    p.add_argument("-S", "--save", action="store_true", help="save/load BSGS tables (keyhunt -S)")
    p.add_argument("-6", dest="skip_checksum", action="store_true",
                   help="skip file checksums on load (keyhunt -6)")
    p.add_argument("-q", "--quiet", action="store_true", help="quiet thread output (keyhunt -q)")
    p.add_argument("-s", "--stats", type=float, default=5.0,
                   help="seconds between speed lines (keyhunt -s)")
    p.add_argument("-M", "--matrix", action="store_true",
                   help="scrolling stats lines instead of carriage-return updates")
    p.add_argument("-e", "--endomorphism", action="store_true",
                   help="x6 (x3 xpoint) endomorphism search (keyhunt -e)")
    p.add_argument("-v", "--vanity", action="append", default=[],
                   help="vanity prefix target (keyhunt -v)")
    p.add_argument("-C", "--minikey-base", default=None,
                   help="base minikey to scan from (keyhunt -C)")
    p.add_argument("-8", "--alphabet", dest="alphabet", default=None,
                   help="base58 alphabet for minikeys (keyhunt -8)")
    p.add_argument("-c", "--crypto", default="btc", choices=["btc", "eth"],
                   help="crypto searched with -m address (keyhunt -c)")
    p.add_argument("-z", "--bloom-multiplier", type=int, default=1,
                   help="bloom size multiplier (keyhunt -z; applies to host "
                        "bloom filters — the device probe uses exact sorted "
                        "tables and needs no oversizing)")
    # mapped/ptable family: on TPU the probe tables live in HBM and persist
    # as .npz/.npy files; these flags control file placement like the
    # reference's mmap subsystem (keyhunt.cpp:724-830,1844-1956).
    p.add_argument("--tmpdir", default=".", help="directory for table files")
    p.add_argument("--ptable", default=None,
                   help="explicit path for the persisted bP/baby table")
    p.add_argument("--load-ptable", action="store_true",
                   help="require an existing table file; do not rebuild")
    p.add_argument("--lanes", type=int, default=0,
                   help="BSGS giant lanes per target (0 = auto-size: up to "
                        "32768 as the range allows; tuned chip geometry)")
    p.add_argument("--table-partitions", type=int, default=0,
                   help="BSGS over-HBM regime: keep 1/N of the baby table "
                        "device-resident and sweep the range N times (the "
                        "role of the reference's mmap'd chunked blooms)")
    p.add_argument("--dtable", action="store_true",
                   help="BSGS: build the baby table ENTIRELY on the device "
                        "(no disk cache, no host->device upload; fastest "
                        "cold start). 8 B/slot vs the host table's 4, so "
                        "max m halves; incompatible with -S/--ggsb/"
                        "--table-partitions/--devices>1")
    p.add_argument("--rmd-batch-size", type=int, default=None,
                   help="accepted for parity; device batch is --pivots*--width")
    # reference mapped-bloom flag family (keyhunt.cpp:724-830, README:35-62):
    # accepted and TRANSLATED onto the TPU build's persistence/partition
    # knobs (warn + translate, never error) so existing keyhunt invocations
    # run unchanged — see translate_mapped_flags.
    p.add_argument("--mapped", nargs="?", const="", default=None,
                   metavar="FILE",
                   help="reference alias: disk-backed probe structures -> "
                        "-S persisted tables (FILE's directory becomes "
                        "--tmpdir)")
    p.add_argument("--mapped-size", default=None, metavar="BYTES",
                   help="reference alias: accepted; table files size "
                        "themselves exactly (no preallocation needed)")
    p.add_argument("--mapped-chunks", type=int, default=None, metavar="N",
                   help="reference alias: split across N resident chunks -> "
                        "--table-partitions N")
    p.add_argument("--bloom-bytes", default=None, metavar="SIZE",
                   help="reference alias: accepted; the device probe uses "
                        "exact packed slabs, no error-rate sizing")
    p.add_argument("--create-mapped", nargs="?", const="", default=None,
                   metavar="SIZE",
                   help="reference alias: preallocate without searching -> "
                        "build + save the BSGS table, then exit")
    p.add_argument("--bloom-file", default=None, metavar="FILE",
                   help="reference alias: probe-structure path -> --ptable")
    p.add_argument("--load-bloom", action="store_true",
                   help="reference alias: require the existing file -> "
                        "--load-ptable")
    # TPU sizing
    p.add_argument("--pivots", type=int, default=64, help="walker pivot count A")
    p.add_argument("--width", type=int, default=4096, help="walker offset width W")
    p.add_argument("--steps", type=int, default=16, help="inner scan steps per dispatch")
    p.add_argument("--max-seconds", type=float, default=None)
    p.add_argument("--devices", type=int, default=None,
                   help="shard the range across this many devices (default: all)")
    # multi-host (jax.distributed): run the SAME command on every host with
    # its own --process-id; the mesh then spans all hosts' chips and
    # --devices defaults to the global device count. Replaces the
    # reference's daemon + fan-out client (bsgsd_client.py:284-404).
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def parse_int(s: str) -> int:
    s = s.strip()
    if s.lower().startswith("0x"):
        return int(s, 16)
    # keyhunt treats bare range values as hex
    try:
        return int(s, 16)
    except ValueError:
        return int(s, 10)


def resolve_range(args, allow_default: bool = True) -> tuple[int, int]:
    """Reference range semantics (keyhunt.cpp:1024-1056,1248-1256):
    `-r START:END`; `-r START` (or `START:`) is open-ended to the group
    order; no -r/-b at all defaults to the full keyspace [1, n)."""
    from .ref import ecc
    if args.bits:
        return 1 << (args.bits - 1), (1 << args.bits) - 1
    if args.range:
        if ":" in args.range:
            a, b = args.range.split(":")
        else:
            a, b = args.range, ""
        start = parse_int(a) if a.strip() else 1
        end = parse_int(b) if b.strip() else ecc.N - 1
        if start > end:
            print("[W] start range can't be greater than end range; swapping",
                  flush=True)
            start, end = end, start
        return max(start, 1), end
    if allow_default:
        return 1, ecc.N - 1
    raise SystemExit("[E] need -r START:END or -b BITS")


def resolve_devices(args) -> int:
    """--devices N shards the search across a mesh of N devices; default is
    every attached device (one block of walker pivots / BSGS lanes each —
    the mesh analog of the reference's -t thread count)."""
    import jax
    n = args.devices if args.devices else len(jax.devices())
    return max(1, n)


def resolve_nseq(args) -> int:
    """-n for non-BSGS modes: keys scanned sequentially from each random
    base (N_SEQUENTIAL_MAX; >=1024 and a multiple of 1024 or back to the
    0x100000000 default, keyhunt.cpp:1270-1291)."""
    if not args.nvalue:
        return 0x100000000
    n = parse_int(args.nvalue)
    if n < 1024 or n % 1024:
        print("[I] n value needs to be >=1024 and a multiple of 1024, "
              "back to defaults", flush=True)
        return 0x100000000
    return n


def translate_mapped_flags(args) -> None:
    """Map the reference's mapped-bloom flag family (keyhunt.cpp:724-830)
    onto this build's knobs, warning about each translation. The TPU
    analog of a disk-backed bloom/bP file is the persisted baby table +
    packed-slab sidecar (-S/--tmpdir/--ptable) and, for capacity beyond
    device memory, --table-partitions sweeps (BsgsConfig docstring)."""
    def note(msg):
        print(f"[W] {msg}", flush=True)

    if getattr(args, "mapped", None) is not None:
        args.save = True
        if args.mapped:
            d = os.path.dirname(args.mapped)
            if d:
                args.tmpdir = d
        note("--mapped: translated to -S persisted tables in "
             f"'{args.tmpdir}' (HBM-resident packed slabs + on-disk "
             "sidecars play the mapped-bloom role)")
    if getattr(args, "mapped_chunks", None):
        if not getattr(args, "table_partitions", 0):
            args.table_partitions = args.mapped_chunks
        note(f"--mapped-chunks {args.mapped_chunks}: translated to "
             f"--table-partitions {args.table_partitions} (bucket-"
             "contiguous resident chunks, one range sweep each)")
    if getattr(args, "mapped_size", None) is not None:
        note("--mapped-size: accepted (table files size themselves "
             "exactly; no preallocation needed)")
    if getattr(args, "bloom_bytes", None) is not None:
        note("--bloom-bytes: accepted (the device probe is an exact "
             "packed-slab compare; no bloom error-rate sizing)")
    if getattr(args, "bloom_file", None):
        if not getattr(args, "ptable", None):
            args.ptable = args.bloom_file
        note(f"--bloom-file: translated to --ptable {args.ptable}")
    if getattr(args, "load_bloom", False):
        args.load_ptable = True
        note("--load-bloom: translated to --load-ptable")
    if getattr(args, "create_mapped", None) is not None:
        args.save = True
        note("--create-mapped: the BSGS table will be built and saved, "
             "then exit without searching")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    runtime.setup(coordinator=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    translate_mapped_flags(args)

    if getattr(args, "create_mapped", None) is not None:
        if args.mode != "bsgs":
            raise SystemExit("[E] --create-mapped only applies to -m bsgs "
                             "(target caches build automatically on load)")
        from .search.bsgs import (derive_m, build_baby_table, save_table,
                                  table_path, load_table)
        n_value = parse_int(args.nvalue) if args.nvalue else None
        m = derive_m(n_value, args.kfactor)
        path = getattr(args, "ptable", None) or table_path(m, args.tmpdir)
        try:
            if load_table(m, path=path, verify=not args.skip_checksum):
                print(f"[+] table {path} already exists", flush=True)
                return 0
        except Exception:
            pass
        tbl = build_baby_table(m, progress=not args.quiet)
        print(f"[+] saved baby table {save_table(tbl, path=path)}",
              flush=True)
        tbl.packed()        # also materialize the packed-slab sidecar
        return 0

    if args.mode == "bsgs":
        from .search.bsgs import run_bsgs_cli
        return run_bsgs_cli(args)

    from .io import targets as tio
    from .search.walker import WalkerConfig
    from .search.engine import Engine

    if not args.file and args.mode != "vanity":
        raise SystemExit("[E] -f FILE required")
    if args.file and not os.path.exists(args.file):
        raise SystemExit(f"[E] can't open file {args.file}")
    start, end = resolve_range(args)
    stride = parse_int(args.stride)

    if args.mode == "address" and args.crypto == "eth":
        args.mode = "eth"                      # keyhunt -m address -c eth
    if args.mode == "address":
        ts = tio.load_hash160_file(args.file, is_address=True, use_cache=True)
    elif args.mode == "rmd160":
        ts = tio.load_hash160_file(args.file, is_address=False, use_cache=True)
    elif args.mode == "xpoint":
        ts = tio.load_xpoint_file(args.file, use_cache=True)
    elif args.mode == "eth":
        ts = tio.load_eth_file(args.file, use_cache=True)
    elif args.mode == "vanity":
        from .search.vanity import run_vanity_cli
        return run_vanity_cli(args, start, end)
    elif args.mode == "minikeys":
        from .search.minikeys import run_minikeys_cli
        return run_minikeys_cli(args)
    else:
        raise SystemExit(f"[E] mode {args.mode} not handled")

    if args.mode in ("address", "rmd160"):
        wmode = {"compress": "compressed", "uncompress": "uncompressed",
                 "both": "both"}[args.look]
    elif args.mode == "xpoint":
        wmode = "xpoint"
    else:
        wmode = "eth"

    devices = resolve_devices(args)
    print(f"[+] keyhunt-tpu: mode {args.mode}, {ts.count} targets, "
          f"range {start:#x}:{end:#x}, devices {devices}", flush=True)
    try:
        cfg = WalkerConfig(pivots=args.pivots, width=args.width,
                           steps=args.steps, stride=stride, mode=wmode,
                           endo=args.endomorphism)
    except ValueError as exc:
        raise SystemExit(f"[E] {exc}")
    eng = Engine(cfg, ts, start, end, random_mode=args.random,
                 quiet=args.quiet, stats_every=args.stats, matrix=args.matrix,
                 devices=devices, n_seq=resolve_nseq(args))
    eng.run(max_seconds=args.max_seconds)
    print(f"[+] done: {len(eng.found_keys)} key(s) found", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
