"""Benchmark driver: measures search throughput on the attached accelerator
and prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Default run (`python bench.py`, the driver's command) benches BOTH:
- BSGS — the flagship mode and the HEADLINE metric. Effective keyspace
  covered per second (giant points/s x 2m, the reference's own counting,
  `keyhunt.cpp:2871-2874`). Baseline row: 15.2 Tkeys/s, the reference's
  1-thread n=2^44 k=1 run (README.md:812-817; BASELINE.md).
- the compressed walker (address/rmd160 engine) — reported in the
  "secondary" field. With --endo (default) keys are counted x6
  (keyhunt.cpp:2883-2891); the comparable reference row is the 5.82 Mkeys/s
  endomorphism vanity run (README.md:301), and the ratio against the
  non-endo 4.76 Mkeys/s address row (README.md:244) is ALSO emitted at
  matching x2 counting ("vs_baseline_x2_counting") for honest comparison.

The baby table persists in --tmpdir between runs (m-keyed name), so the
build cost is paid once per m.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

#: baby tables persist here between runs — OUTSIDE the repo working tree
#: (a 2^26 table is ~770 MB; keep it out of the checkout)
DEFAULT_TMPDIR = os.environ.get(
    "KEYHUNT_TPU_BENCH_DIR", os.path.expanduser("~/.cache/keyhunt_tpu"))

BASELINE_ADDRESS_KEYS_PER_S = 4.76e6      # README.md:244 (x2 counting)
BASELINE_VANITY_ENDO_KEYS_PER_S = 5.82e6  # README.md:301 (x6 counting, -e)
BASELINE_BSGS_KEYS_PER_S = 15.2e12        # README.md:812-817 (k=1, 1 thread)
BASELINE_MINIKEYS_KEYS_PER_S = 27.7e3     # README.md:1291 (1 thread random)


def _steady_rate(step, state, seconds, pipeline=2):
    """Timed loop with a bounded async pipeline (hides dispatch latency
    without flooding the device queue). `step(*state)` must return the new
    state tuple first and a SMALL array last, which is FETCHED to host —
    block_until_ready alone returns early for pallas-call outputs on the
    tunneled runtime and would report enqueue rate, not compute rate."""
    import numpy as np
    calls = 0
    inflight = []
    t0 = time.time()
    while time.time() - t0 < seconds:
        out = step(*state)
        state = out[:len(state)]
        inflight.append(out[-1])
        if len(inflight) > pipeline:
            np.asarray(inflight.pop(0))
        calls += 1
    for x in inflight:
        np.asarray(x)
    return calls, time.time() - t0


def bench_bsgs(args, emit=True):
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.search.bsgs import (
        BsgsConfig, build_baby_table, load_table, save_table, table_path,
        make_giant_step_fn, seed_lanes)

    m = args.m
    os.makedirs(args.tmpdir, exist_ok=True)
    # the default m=2^31 table takes ~50 min to build from nothing on
    # the tunneled dev runtime; when it is not cached but a smaller
    # cached table exists, bench that instead of stalling the driver
    if not os.path.exists(table_path(m, args.tmpdir)):
        for alt in (1 << 30, 1 << 28, 1 << 26):
            if alt < m and os.path.exists(table_path(alt, args.tmpdir)):
                print(f"[bench] no cached m={m:#x} table; using cached "
                      f"m={alt:#x}", file=sys.stderr, flush=True)
                m = alt
                break
    cfg = BsgsConfig(m=m, lanes=args.lanes, steps=args.steps)
    if args.verbose:
        print(f"[bench] devices={jax.devices()} cfg={cfg}",
              file=sys.stderr, flush=True)
    t_b = time.time()
    path = table_path(cfg.m, args.tmpdir)
    try:
        tbl = load_table(cfg.m, path=path, verify=False)
    except Exception:
        tbl = None
    if tbl is None:
        tbl = build_baby_table(cfg.m, pivots=64, width=2048, steps=4)
        try:
            save_table(tbl, path=path)
        except Exception as exc:
            print(f"[bench] table save failed: {exc}", file=sys.stderr)
    if args.verbose:
        print(f"[bench] baby table m=2^{cfg.m.bit_length()-1} ready in "
              f"{time.time()-t_b:.1f}s", file=sys.stderr, flush=True)
    from keyhunt_tpu.runtime import fast_put
    from keyhunt_tpu.search.bsgs import probe_chunks_for
    slab, _starts, shift = tbl.packed()
    s_ = fast_put(slab)
    step = make_giant_step_fn(
        cfg, 1, shift,
        probe_chunks=probe_chunks_for(cfg.lanes * cfg.steps, slab.shape[1]))
    # one unreachable target point far outside the walked window
    import numpy as np
    tx, ty = ecc.pubkey((1 << 200) + 12345)
    px, py = seed_lanes(cfg, [(tx, ty)], c0=cfg.stride * cfg.lanes + 1)
    z = np.zeros((8, cfg.lanes), np.uint32)
    z[0] = 1
    pz = jnp.asarray(z)
    t_c = time.time()
    out = step(px, py, pz, s_)
    # force REAL completion with a host fetch: block_until_ready returns
    # early for pallas outputs on the tunneled runtime AND leaves the
    # stream in a state where later enqueues stall ~4.5 s each (measured:
    # 3 calls vs 319 calls per 8 s window with/without the forced fetch)
    import numpy as _np
    _np.asarray(out[-1])
    if args.verbose:
        print(f"[bench] compile+first call {time.time()-t_c:.1f}s",
              file=sys.stderr, flush=True)

    fn = lambda px, py, pz: step(px, py, pz, s_)      # noqa: E731
    calls, dt = _steady_rate(fn, (px, py, pz), args.seconds)
    rate = calls * cfg.keys_per_call(1) / dt
    points = calls * cfg.lanes * cfg.steps / dt
    if args.verbose:
        print(f"[bench] {calls} calls in {dt:.2f}s "
              f"({points/1e6:.1f} M giant points/s)", file=sys.stderr, flush=True)
    result = {
        "metric": f"keys_per_sec_bsgs_m{cfg.m:#x}",
        "value": round(rate, 1),
        "unit": "keys/s",
        "giant_points_per_sec": round(points, 1),
        "vs_baseline": round(rate / BASELINE_BSGS_KEYS_PER_S, 3),
        "baseline_row": "README.md:812-817 BSGS k=1 1-thread 15.2 Tkeys/s",
    }
    if emit:
        print(json.dumps(result), flush=True)
    return result


def bench_walker(args, emit=True):
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    from keyhunt_tpu.ops import match
    from keyhunt_tpu.search.walker import WalkerConfig, make_step_fn, seed_pivots

    if args.hash_impl != "auto":
        from keyhunt_tpu.ops import hash160 as _h160
        _h160.set_impl(args.hash_impl)
    import numpy as np
    mode = args.mode if args.mode not in ("all", "bsgs") else "compressed"
    cfg = WalkerConfig(pivots=args.pivots, width=args.width,
                       steps=args.steps_walker, mode=mode,
                       endo=args.endo and mode in ("compressed", "xpoint"))
    # one unreachable target, probed through the PRODUCT path (bucket
    # slabs — the same layout Engine uses), full probe work, no hits
    t0_, t1_ = match.build_table([(0xDEADBEEF, 0x12345678)])
    slab0, slab1, _perm, shift = match.build_buckets(
        t0_, t1_, np.zeros(t0_.shape[0], np.uint32))
    if args.verbose:
        print(f"[bench] devices={jax.devices()} cfg={cfg}", file=sys.stderr, flush=True)
    t_setup = time.time()
    step = make_step_fn(cfg, shift=shift)
    import jax.numpy as jnp
    t0_, t1_ = jnp.asarray(slab0), jnp.asarray(slab1)
    px, py = seed_pivots(cfg, 1 << 65)
    out = step(px, py, t0_, t1_)
    np.asarray(out[-1])       # force REAL completion (see bench_bsgs note)
    if args.verbose:
        print(f"[bench] compile+first call {time.time()-t_setup:.1f}s",
              file=sys.stderr, flush=True)

    fn = lambda px, py: step(px, py, t0_, t1_)      # noqa: E731
    calls, dt = _steady_rate(fn, (px, py), args.seconds)
    keys = calls * cfg.keys_per_call * cfg.keys_per_point
    rate = keys / dt
    points = calls * cfg.keys_per_call / dt
    if args.verbose:
        print(f"[bench] {calls} calls in {dt:.2f}s "
              f"({points/1e6:.1f} M points/s)", file=sys.stderr, flush=True)
    result = {
        "metric": f"keys_per_sec_{mode}" + ("_endo" if cfg.endo else ""),
        "value": round(rate, 1),
        "unit": "keys/s",
        "points_per_sec": round(points, 1),
        "vs_baseline": round(rate / (BASELINE_VANITY_ENDO_KEYS_PER_S if cfg.endo
                                     else BASELINE_ADDRESS_KEYS_PER_S), 3),
        "baseline_row": ("README.md:301 vanity -e 5.82 Mkeys/s (x6 counting)"
                         if cfg.endo else
                         "README.md:244 address 4.76 Mkeys/s (x2 counting)"),
    }
    if cfg.endo:
        # same-counting alternative vs the x2-counted address row
        result["vs_baseline_x2_counting"] = round(
            (points * 2) / BASELINE_ADDRESS_KEYS_PER_S, 3)
    if emit:
        print(json.dumps(result), flush=True)
    return result


def bench_minikeys(args, emit=True):
    """Minikeys mode on-device: candidates filtered per second (the
    reference's counting — every tested minikey is a key candidate).
    Baseline: 27.7 kkeys/s, 1 thread random (README.md:1291)."""
    from keyhunt_tpu import runtime
    runtime.setup()
    from keyhunt_tpu.io.targets import _build, _h160_words
    from keyhunt_tpu.search.minikeys import MinikeysConfig, MinikeysEngine

    h = b"\xde\xad\xbe\xef" * 5                           # unreachable
    ts = _build([_h160_words(h)], "hash160", {h})
    cfg = MinikeysConfig()
    eng = MinikeysEngine(cfg, ts, quiet=True, rng_seed=7, random_mode=True)
    # warm up BOTH device paths (filter compile lands on block 1, the much
    # larger solve graph — scalar_mult_base — on the first drained solve),
    # then restart the meter for the steady-state window
    from keyhunt_tpu.stats import SpeedMeter
    eng.run(max_candidates=3 * cfg.filter_batch)
    eng.meter = SpeedMeter()
    eng.run(max_seconds=args.seconds)
    rate = eng.meter.rate
    result = {
        "metric": "keys_per_sec_minikeys",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_MINIKEYS_KEYS_PER_S, 3),
        "baseline_row": "README.md:1291 minikeys 27.7 kkeys/s (1 thread)",
    }
    if emit:
        print(json.dumps(result), flush=True)
    return result


def bench_vanity(args, emit=True):
    """Vanity mode: the compressed-endo walker with the probe replaced by
    hash160-in-range compares (thread_process_vanity). Baseline: the
    reference's own vanity -e run, 5.82 Mkeys/s x6 counting
    (README.md:301)."""
    from keyhunt_tpu import runtime
    runtime.setup()
    import numpy as np
    import jax.numpy as jnp
    from keyhunt_tpu.io.targets import load_vanity_targets, ranges_to_words
    from keyhunt_tpu.ops import match
    from keyhunt_tpu.search.walker import (WalkerConfig, make_step_fn,
                                           seed_pivots)

    ts = load_vanity_targets(["1KeyHuntHunt"])       # unreachable prefix
    cfg = WalkerConfig(pivots=args.pivots, width=args.width,
                       steps=args.steps_walker, mode="compressed",
                       vanity=ranges_to_words(ts.points), endo=args.endo)
    t0_, t1_ = match.build_table([])
    step = make_step_fn(cfg)
    t0_, t1_ = jnp.asarray(t0_), jnp.asarray(t1_)
    px, py = seed_pivots(cfg, 1 << 65)
    out = step(px, py, t0_, t1_)
    np.asarray(out[-1])       # force REAL completion (see bench_bsgs note)
    fn = lambda px, py: step(px, py, t0_, t1_)      # noqa: E731
    calls, dt = _steady_rate(fn, (px, py), args.seconds)
    rate = calls * cfg.keys_per_call * cfg.keys_per_point / dt
    points = calls * cfg.keys_per_call / dt
    result = {
        "metric": "keys_per_sec_vanity" + ("_endo" if cfg.endo else ""),
        "value": round(rate, 1),
        "unit": "keys/s",
        "points_per_sec": round(points, 1),
        "vs_baseline": round(rate / BASELINE_VANITY_ENDO_KEYS_PER_S, 3),
        "baseline_row": "README.md:301 vanity -e 5.82 Mkeys/s (x6 counting)",
    }
    if emit:
        print(json.dumps(result), flush=True)
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["all", "compressed", "xpoint", "uncompressed",
                             "eth", "bsgs", "minikeys", "vanity"])
    ap.add_argument("--m", type=int, default=1 << 31,
                    help="bsgs: baby-table size (the density-regime "
                         "headline; tables + packed sidecars persist in "
                         "--tmpdir, so only the first-ever run pays the "
                         "build; falls back to a smaller cached table)")
    ap.add_argument("--lanes", type=int, default=131072,
                    help="bsgs: giant lanes (131072 x 16 steps is the r4 "
                         "measured optimum — see search.bsgs.auto_lanes)")
    ap.add_argument("--steps", type=int, default=16, help="bsgs inner steps")
    ap.add_argument("--pivots", type=int, default=64)
    ap.add_argument("--width", type=int, default=4096)
    ap.add_argument("--steps-walker", type=int, default=16)
    ap.add_argument("--endo", action=argparse.BooleanOptionalAction, default=True,
                    help="x6 endomorphism counting (reference -e rules); --no-endo disables")
    ap.add_argument("--hash-impl", default="auto",
                    choices=["auto", "jnp", "pallas"],
                    help="force the hash160 backend inside the walker")
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--tmpdir", default=DEFAULT_TMPDIR)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.mode == "bsgs":
        bench_bsgs(args)
        return 0
    if args.mode == "minikeys":
        bench_minikeys(args)
        return 0
    if args.mode == "vanity":
        bench_vanity(args)
        return 0
    if args.mode != "all":
        bench_walker(args)
        return 0

    # default: BSGS headline + per-mode secondaries, ONE JSON line.
    # The headline must survive any secondary failing (a fresh compile
    # cache or a mode-specific regression must not cost the whole line).
    headline = dict(bench_bsgs(args, emit=False))
    # emit the headline NOW: if a later secondary is killed by a driver
    # timeout, the last complete line still carries the flagship number
    print(json.dumps(headline), flush=True)
    def walker_xpoint(a, emit=False):
        # hash-free EC+probe walker: the points_per_sec field is the
        # chip's EC point-adds/s evidence row (BASELINE north star)
        import argparse as _ap
        a2 = _ap.Namespace(**vars(a))
        a2.mode, a2.endo = "xpoint", False
        return bench_walker(a2, emit=emit)

    for name, fn in (("secondary", bench_walker),
                     ("vanity", bench_vanity),
                     ("minikeys", bench_minikeys),
                     ("xpoint_ec_adds", walker_xpoint)):
        try:
            headline[name] = fn(args, emit=False)
        except Exception as exc:                    # noqa: BLE001
            headline[name] = {"error": f"{type(exc).__name__}: {exc}"}
    print(json.dumps(headline), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
