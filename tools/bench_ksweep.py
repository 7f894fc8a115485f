"""k-factor sweep: BSGS effective keys/s as the baby table grows — the TPU
analog of the reference's k-scaling table (README.md:819-928: k=1 15.2T,
k=20 256T, k=128 1.29P, k=512 46P/thread). Effective rate = giant points/s
x 2m, so doubling m doubles keys/s until the probe becomes table-bound.

Usage: python tools/bench_ksweep.py [m_exp ...]   (default 22 24 26 28)
Tables persist in the CWD between runs (m-keyed names).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    exps = [int(a) for a in sys.argv[1:]] or [22, 24, 26, 28]
    rows = []
    for e in exps:
        args = bench.main.__wrapped__ if False else None  # noqa
        ns = type("A", (), {})()
        ns.m = 1 << e
        ns.lanes = 32768
        ns.steps = 16
        ns.seconds = 10.0
        ns.tmpdir = bench.DEFAULT_TMPDIR
        ns.verbose = True
        r = bench.bench_bsgs(ns, emit=False)
        r["m_exp"] = e
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": [(r["m_exp"], r["value"]) for r in rows]}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
