"""VERDICT r5 deliverable: a from-nothing DEVICE build at m=2^31
(overflow=0) plus an engine-run planted-key search against it.

The r5 5 B/slot layout (search/dtable.py: uint32 residual + packed
8-bit j hint) puts the m=2^31 build at ~13.3 GiB HBM — inside a 16 GB
chip, which the r4 8 B/slot layout (~26 GiB) could not do.

Usage: python tools/run_dtable31.py [--m 2147483648] [--key 0x...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 31)
    ap.add_argument("--key", type=lambda s: int(s, 0), default=0x59AB3F00D1CE)
    ap.add_argument("--avg", type=int, default=None)
    args = ap.parse_args()

    from keyhunt_tpu import runtime
    runtime.setup()
    from keyhunt_tpu.io.results import ResultSink
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine
    from keyhunt_tpu.search.dtable import build_device_table

    m = args.m
    t0 = time.time()
    tbl = build_device_table(m, avg=args.avg, progress=True)
    build_s = time.time() - t0
    halves = tbl.res_slab if isinstance(tbl.res_slab, tuple) \
        else (tbl.res_slab,)
    jw = tbl.j_words if isinstance(tbl.j_words, tuple) else (tbl.j_words,)
    gib = (sum(int(h.size) for h in halves) * 4
           + sum(int(w.size) for w in jw) * 4) / 2**30
    print(f"[dtable31] m=2^{m.bit_length()-1} built in {build_s:.1f}s, "
          f"overflow={tbl.overflow}, slabs {gib:.2f} GiB "
          f"({len(halves)} piece(s), maxlen={tbl.maxlen}, "
          f"jshift={tbl.jshift})", flush=True)

    key = args.key
    target = ecc.pubkey(key)
    lo, hi = 1, max(key * 2, 1 << 48)
    cfg = BsgsConfig(m=m, lanes=256, steps=16)
    t1 = time.time()
    eng = BsgsEngine(cfg, tbl, [target], lo, hi,
                     sink=ResultSink(quiet=False), stats_every=30.0,
                     matrix=True)
    found = eng.run()
    dt = time.time() - t1
    ok = found.get(0) == key
    print(f"[dtable31] search {dt:.1f}s: found={found} expected={key:#x} "
          f"-> {'OK' if ok else 'MISMATCH'}", flush=True)
    return 0 if (ok and tbl.overflow == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
