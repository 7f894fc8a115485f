"""MARQUEE (b): the reference's 16-pubkeys-in-a-64-bit-window BSGS run
(`tests/in.txt`, README.md:981-1066 — 164.5 min at n=2^60/k=1/6 threads;
59.8 min at k=4 with ~18 GB tables).

Drives the PRODUCT CLI path (BsgsEngine via run_bsgs_cli) on the cached
m=2^30 table with an explicit lane/step geometry, logging wall-clock and
each found key with a timestamp. A --deadline guard exits cleanly (the
engine honors max_seconds) so a bounded session never strands the chip.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RANGE_LO = 0x49DCCFD96DC5DF56487436F5A1B18C4F5D34F65DDB48CB5E0000000000000000
RANGE_HI = 0x49DCCFD96DC5DF56487436F5A1B18C4F5D34F65DDB48CB5EFFFFFFFFFFFFFFFF


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="/root/reference/tests/in.txt")
    ap.add_argument("--tmpdir",
                    default=os.path.expanduser("~/.cache/keyhunt_tpu"))
    ap.add_argument("--m", type=int, default=1 << 30,
                    help="baby table size (cached table required)")
    ap.add_argument("--lanes", type=int, default=4096,
                    help="giant lanes PER TARGET")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--deadline", type=float, default=None,
                    help="max seconds for the search phase")
    args = ap.parse_args()

    from keyhunt_tpu import runtime
    runtime.setup()
    from keyhunt_tpu.io import targets as tio
    from keyhunt_tpu.io.results import ResultSink
    from keyhunt_tpu.search.bsgs import (BsgsConfig, BsgsEngine, load_table,
                                         table_path)

    m = args.m
    pts = tio.load_pubkeys_file(args.file)
    print(f"[in16] {len(pts)} pubkeys, m=2^{m.bit_length()-1}, "
          f"lanes={args.lanes}/target, steps={args.steps}", flush=True)
    t0 = time.time()
    tbl = load_table(m, path=table_path(m, args.tmpdir), verify=False)
    assert tbl is not None, "cached table required (bench.py builds it)"
    print(f"[in16] table loaded in {time.time()-t0:.1f}s", flush=True)

    class StampSink(ResultSink):
        def record(self, key, kind="btc", compressed=True):
            print(f"[in16] KEY t+{time.time()-t0:.1f}s: {key:064x}",
                  flush=True)
            super().record(key, kind, compressed)

    cfg = BsgsConfig(m=m, lanes=args.lanes, steps=args.steps, max_hits=8)
    eng = BsgsEngine(cfg, tbl, pts, RANGE_LO, RANGE_HI,
                     sink=StampSink(quiet=False), stats_every=60.0,
                     matrix=True)
    t1 = time.time()
    found = eng.run(max_seconds=args.deadline)
    dt = time.time() - t1
    print(f"[in16] search {dt:.1f}s ({dt/60:.1f} min), found "
          f"{len(found)}/{len(pts)}; total wall {time.time()-t0:.1f}s",
          flush=True)
    for t, k in sorted(found.items()):
        print(f"[in16] target {t}: {k:064x}", flush=True)
    return 0 if len(found) == len(pts) else 1


if __name__ == "__main__":
    sys.exit(main())
