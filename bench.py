"""Benchmark driver: measures walker throughput on the attached accelerator
and prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: effective keys/s in compressed address/rmd160 mode (the
reference's north-star counter, `keyhunt.cpp:2850-2962`). Baseline:
4.76 Mkeys/s — the reference's single-thread address-mode run
(README.md:244, BASELINE.md).

`--mode bsgs` instead measures the flagship BSGS mode (effective keyspace
covered per second: giant points/s x 2m — the same counting the reference
uses, `keyhunt.cpp:2871-2874`). Baseline: 15.2 Tkeys/s — the reference's
1-thread default-n k=1 run (README.md:812-817, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_ADDRESS_KEYS_PER_S = 4.76e6
BASELINE_BSGS_KEYS_PER_S = 15.2e12


def bench_bsgs(args) -> int:
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.search.bsgs import (
        BsgsConfig, build_baby_table, make_giant_step_fn, seed_lanes)

    cfg = BsgsConfig(m=args.m, lanes=args.lanes, steps=args.steps)
    if args.verbose:
        print(f"[bench] devices={jax.devices()} cfg={cfg}",
              file=sys.stderr, flush=True)
    t_b = time.time()
    tbl = build_baby_table(cfg.m)
    if args.verbose:
        print(f"[bench] baby table m=2^{cfg.m.bit_length()-1} built in "
              f"{time.time()-t_b:.1f}s", file=sys.stderr, flush=True)
    t0_, t1_ = jnp.asarray(tbl.t0), jnp.asarray(tbl.t1)
    step = make_giant_step_fn(cfg, n_targets=1, depth=tbl.depth)
    # one unreachable target point far outside the walked window
    tx, ty = ecc.pubkey((1 << 200) + 12345)
    px, py = seed_lanes(cfg, [(tx, ty)], c0=cfg.stride * cfg.lanes + 1)
    t_c = time.time()
    out = step(px, py, t0_, t1_)
    jax.block_until_ready(out)
    if args.verbose:
        print(f"[bench] compile+first call {time.time()-t_c:.1f}s",
              file=sys.stderr, flush=True)

    calls = 0
    inflight = []
    t0 = time.time()
    while time.time() - t0 < args.seconds:
        px, py, lanes, jsel, counts, fa, fl = step(px, py, t0_, t1_)
        inflight.append(counts)
        if len(inflight) > 2:
            jax.block_until_ready(inflight.pop(0))
        calls += 1
    jax.block_until_ready(inflight)
    dt = time.time() - t0
    rate = calls * cfg.keys_per_call(1) / dt
    if args.verbose:
        print(f"[bench] {calls} calls in {dt:.2f}s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"keys_per_sec_bsgs_m{cfg.m:#x}",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_BSGS_KEYS_PER_S, 3),
    }), flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="compressed",
                    choices=["compressed", "xpoint", "uncompressed", "eth",
                             "bsgs"])
    ap.add_argument("--m", type=int, default=1 << 24,
                    help="bsgs: baby-table size")
    ap.add_argument("--lanes", type=int, default=32768,
                    help="bsgs: giant lanes")
    ap.add_argument("--pivots", type=int, default=64)
    ap.add_argument("--width", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--endo", action=argparse.BooleanOptionalAction, default=True,
                    help="x6 endomorphism counting (reference -e rules); --no-endo disables")
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.mode == "bsgs":
        return bench_bsgs(args)

    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import numpy as np
    from keyhunt_tpu.ops import match
    from keyhunt_tpu.search.walker import WalkerConfig, make_step_fn, seed_pivots

    cfg = WalkerConfig(pivots=args.pivots, width=args.width, steps=args.steps,
                       mode=args.mode, endo=args.endo)
    # one unreachable target: full probe work, no hit traffic
    t0_, t1_ = match.build_table([(0xDEADBEEF, 0x12345678)])
    if args.verbose:
        print(f"[bench] devices={jax.devices()} cfg={cfg}", file=sys.stderr, flush=True)
    t_setup = time.time()
    step = make_step_fn(cfg)
    import jax.numpy as jnp
    t0_, t1_ = jnp.asarray(t0_), jnp.asarray(t1_)
    px, py = seed_pivots(cfg, 1 << 65)
    out = step(px, py, t0_, t1_)
    jax.block_until_ready(out)
    if args.verbose:
        print(f"[bench] compile+first call {time.time()-t_setup:.1f}s",
              file=sys.stderr, flush=True)

    # steady state: pivot state chains call-to-call (no result caching
    # possible). Bounded 2-deep pipeline: hides dispatch latency without
    # letting the async queue build up (an unbounded enqueue once flooded
    # the device for an hour).
    calls = 0
    inflight = []
    t0 = time.time()
    while time.time() - t0 < args.seconds:
        px, py, hits, counts = step(px, py, t0_, t1_)
        inflight.append(counts)
        if len(inflight) > 2:
            jax.block_until_ready(inflight.pop(0))
        calls += 1
    jax.block_until_ready(inflight)
    dt = time.time() - t0
    keys = calls * cfg.keys_per_call * cfg.keys_per_point
    rate = keys / dt
    if args.verbose:
        print(f"[bench] {calls} calls in {dt:.2f}s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"keys_per_sec_{args.mode}",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_ADDRESS_KEYS_PER_S, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
