"""Sweep the fused giant-walk kernel geometry (steps x row-block x lanes)
against a resident packed table and report giant points/s for each.

The kernel's per-mul row ops work on R*128 elements (R = the block's
sublane row count); small R leaves every VPU op latency-bound, while the
S*R product is capped by the VMEM the two emission blocks occupy
(ops.jacwalk). This sweep measures the real end-to-end step rate (scan
kernel + deferred inversion + packed probe + top-k) per geometry, on the
m-keyed cached table in --tmpdir.

Usage: python tools/bench_jacgeo.py [--m 1073741824] [--seconds 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 30)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--tmpdir",
                    default=os.path.expanduser("~/.cache/keyhunt_tpu"))
    ap.add_argument("--combos", default="16x8,8x16,4x32,2x64,8x32,4x64,16x16")
    ap.add_argument("--lanes", default="32768,65536")
    args = ap.parse_args()

    from keyhunt_tpu import runtime
    runtime.setup()
    import numpy as np
    import jax.numpy as jnp
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.runtime import fast_put
    from keyhunt_tpu.search.bsgs import (BsgsConfig, load_table, table_path,
                                         make_giant_step_fn, seed_lanes)
    from keyhunt_tpu.ops import jacwalk

    tbl = load_table(args.m, path=table_path(args.m, args.tmpdir),
                     verify=False)
    assert tbl is not None, "build the table first (bench.py does)"
    slab, _starts, shift = tbl.packed()
    s_ = fast_put(np.asarray(slab))
    print(f"[geo] slab resident: {s_.shape} shift={shift}", file=sys.stderr,
          flush=True)

    combos = [tuple(map(int, c.split("x"))) for c in args.combos.split(",")]
    lanes_list = [int(x) for x in args.lanes.split(",")]
    best = None
    for lanes in lanes_list:
        for steps, rows in combos:
            os.environ["KEYHUNT_TPU_JACROWS"] = str(rows)
            make_giant_step_fn.cache_clear()
            jacwalk._scan_call.cache_clear()
            cfg = BsgsConfig(m=args.m, lanes=lanes, steps=steps)
            step = make_giant_step_fn(cfg, 1, shift)
            tx, ty = ecc.pubkey((1 << 200) + 12345)
            px, py = seed_lanes(cfg, [(tx, ty)],
                                c0=cfg.stride * cfg.lanes + 1)
            z = np.zeros((8, cfg.lanes), np.uint32)
            z[0] = 1
            pz = jnp.asarray(z)
            t0 = time.time()
            try:
                out = step(px, py, pz, s_)
                np.asarray(out[-1])
            except Exception as exc:                    # noqa: BLE001
                print(json.dumps({"lanes": lanes, "steps": steps,
                                  "rows": rows,
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      flush=True)
                continue
            compile_s = time.time() - t0
            state = (px, py, pz)
            calls, inflight = 0, []
            t0 = time.time()
            while time.time() - t0 < args.seconds:
                out = step(*state, s_)
                state = out[:3]
                inflight.append(out[-1])
                if len(inflight) > 2:
                    np.asarray(inflight.pop(0))
                calls += 1
            for x in inflight:
                np.asarray(x)
            dt = time.time() - t0
            pts = calls * lanes * steps / dt
            row = {"lanes": lanes, "steps": steps, "rows": rows,
                   "mpts_per_s": round(pts / 1e6, 2),
                   "pkeys_per_s": round(pts * 2 * args.m / 1e15, 2),
                   "ms_per_call": round(dt / calls * 1e3, 2),
                   "compile_s": round(compile_s, 1)}
            print(json.dumps(row), flush=True)
            if best is None or pts > best[0]:
                best = (pts, row)
    if best:
        print(json.dumps({"best": best[1]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
