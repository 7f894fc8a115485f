"""Per-op microbenchmarks on the attached accelerator.

Times the walker's constituent device ops at bench shapes so optimization
effort goes where the nanoseconds are (the reference's per-op equivalents:
ModMulK1 / IntGroup::ModInv / GetHash160_fromX / bloom_check).

Usage: python tools/bench_ops.py [--batch 262144] [--iters 20] [op ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters, batch):
    import jax
    out = fn()                      # compile + warm
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.3f} ms/call  {dt/batch*1e9:8.2f} ns/elt",
          flush=True)
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--table-bits", type=int, default=24,
                    help="log2 probe-table entries for the probe benches")
    ap.add_argument("ops", nargs="*", default=[])
    args = ap.parse_args(argv)

    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import field, u256, match, hash160 as h160

    B = args.batch
    print(f"devices={jax.devices()} batch={B}", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))

    want = set(args.ops)

    def on(name):
        return not want or name in want

    if on("mul"):
        f = jax.jit(field.mul)
        timeit("field.mul (pallas)", lambda: f(a, b), args.iters, B)
    if on("mul_jnp"):
        field.set_impl("jnp")
        f = jax.jit(field.mul)
        timeit("field.mul (jnp)", lambda: f(a, b), args.iters, B)
        field.set_impl("auto")
    if on("sqr"):
        f = jax.jit(field.sqr)
        timeit("field.sqr", lambda: f(a), args.iters, B)
    if on("sub"):
        f = jax.jit(field.sub)
        timeit("field.sub", lambda: f(a, b), args.iters, B)
    if on("norm"):
        f = jax.jit(field.norm)
        timeit("field.norm", lambda: f(a), args.iters, B)
    if on("inv"):
        f = jax.jit(field.batch_inv)
        timeit("field.batch_inv", lambda: f(a), args.iters, B)
    if on("hash"):
        f = jax.jit(h160.hash160_both_prefixes)
        timeit("hash160 both prefixes", lambda: f(a), args.iters, B)
    if on("probe"):
        m = 1 << args.table_bits
        t0 = jnp.sort(jnp.asarray(
            rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)))
        t1 = jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32))
        f = jax.jit(match.probe)
        timeit(f"probe (m=2^{args.table_bits})",
               lambda: f(t0, t1, a[7], a[6]), args.iters, B)
        g = jax.jit(match.probe_pos)
        timeit(f"probe_pos (m=2^{args.table_bits})",
               lambda: g(t0, t1, a[7], a[6]), args.iters, B)
    if on("ecadd"):
        from keyhunt_tpu.ops import curve
        inv = jnp.asarray(rng.integers(0, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))

        def ec(px, py, qx, qy, iv):
            return curve.add_with_inv(px, py, qx, qy, iv, want_y=False)
        f = jax.jit(ec)
        timeit("add_with_inv (X only)", lambda: f(a, b, b, a, inv),
               args.iters, B)
    if on("topk"):
        mask = jnp.zeros(2 * B, bool)
        f = jax.jit(match.topk_indices, static_argnums=1)
        timeit("topk_indices (2B mask)", lambda: f(mask, 8), args.iters, B)
    if on("step"):
        from keyhunt_tpu.search.walker import (
            WalkerConfig, make_step_fn, seed_pivots)
        width = max(B // 64, 128)
        for steps in (1, 16):
            cfg = WalkerConfig(pivots=64, width=width, steps=steps,
                               mode="compressed")
            t0w, t1w = match.build_table([(0xDEADBEEF, 0x12345678)])
            t0w, t1w = jnp.asarray(t0w), jnp.asarray(t1w)
            stepf = make_step_fn(cfg)
            px, py = seed_pivots(cfg, 1 << 65)
            timeit(f"walker step (S={steps})",
                   lambda: stepf(px, py, t0w, t1w),
                   max(args.iters // steps, 2), B * steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
