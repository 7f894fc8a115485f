"""Micro-bench: decompose the BSGS giant-step cost — probe vs advance —
at production lanes/table sizes, to direct optimization."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, state, iters=30, pipeline=2):
    import jax
    out = fn(*state)
    jax.block_until_ready(out)
    inflight = []
    t0 = time.time()
    for _ in range(iters):
        out = fn(*state)
        state = out[:len(state)] if isinstance(out, tuple) and len(out) > 1 else state
        inflight.append(out[-1] if isinstance(out, tuple) else out)
        if len(inflight) > pipeline:
            jax.block_until_ready(inflight.pop(0))
    jax.block_until_ready(inflight)
    return (time.time() - t0) / iters


def main():
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import u256, field, match
    from keyhunt_tpu.search.bsgs import load_table

    import bench
    m = int(sys.argv[1], 0) if len(sys.argv) > 1 else 1 << 26
    B = int(sys.argv[2], 0) if len(sys.argv) > 2 else 32768
    tbl = load_table(m, directory=bench.DEFAULT_TMPDIR, verify=False)
    assert tbl is not None, "run bench.py --mode bsgs first to build the table"
    t0_, t1_ = jnp.asarray(tbl.t0), jnp.asarray(tbl.t1)
    rng = np.random.default_rng(5)
    w0 = jnp.asarray(rng.integers(0, 1 << 32, B, dtype=np.int64).astype(np.uint32))
    w1 = jnp.asarray(rng.integers(0, 1 << 32, B, dtype=np.int64).astype(np.uint32))
    px = jnp.asarray(rng.integers(0, 1 << 32, (8, B), dtype=np.int64).astype(np.uint32))
    print(f"m=2^{m.bit_length()-1} B={B} depth={tbl.depth}", flush=True)

    # tables ride as runtime args — baking 256 MB constants into the HLO
    # breaks the remote-compile transport and is not the product pattern
    probe = jax.jit(lambda t0c, t1c, a, b:
                    match.probe_pos(t0c, t1c, a, b, depth=tbl.depth))
    dt = timeit(lambda a, b: probe(t0_, t1_, a, b), (w0, w1))
    print(f"probe_pos        {dt*1e3:8.3f} ms  ({B/dt/1e6:.1f} M queries/s)", flush=True)

    ss = jax.jit(lambda t0c, a: jnp.searchsorted(t0c, a))
    dt = timeit(lambda a: (ss(t0_, a),), (w0,))
    print(f"searchsorted     {dt*1e3:8.3f} ms", flush=True)

    binv = jax.jit(field.batch_inv)
    dt = timeit(lambda a: (binv(a),), (px,))
    print(f"batch_inv        {dt*1e3:8.3f} ms", flush=True)

    topk = jax.jit(lambda a: match.topk_with_payload(a < 0, a, 4))
    dt = timeit(lambda a: (topk(a),), (jnp.zeros(B, jnp.uint32),))
    print(f"topk(gated)      {dt*1e3:8.3f} ms", flush=True)

    # the PRODUCT probe: PACKED direct-indexed bucket slab (one gather
    # of 4 B/slot rows + residual compare)
    slab, _starts, shift = tbl.packed()
    s_ = jnp.asarray(slab)
    pb = jax.jit(lambda sc, a, b:
                 match.probe_buckets_packed(sc, a, b, shift))
    dt = timeit(lambda a, b: pb(s_, a, b), (w0, w1))
    print(f"probe_packed     {dt*1e3:8.3f} ms  ({B/dt/1e6:.1f} M queries/s)",
          flush=True)

    # giant-step pieces at product geometry: full step vs probe-free walk
    from keyhunt_tpu.search.bsgs import BsgsConfig, make_giant_step_fn, seed_lanes
    from keyhunt_tpu.ref import ecc
    S = 16
    cfg = BsgsConfig(m=m, lanes=B, steps=S)
    step = make_giant_step_fn(cfg, 1, shift)
    tx, ty = ecc.pubkey((1 << 200) + 12345)
    px0, py0 = seed_lanes(cfg, [(tx, ty)], c0=cfg.stride * cfg.lanes + 1)
    z0 = np.zeros((8, B), np.uint32)
    z0[0] = 1
    z0 = jnp.asarray(z0)
    dt = timeit(lambda px, py, pz: step(px, py, pz, s_),
                (px0, py0, z0), iters=10)
    print(f"giant step FULL  {dt*1e3:8.3f} ms  "
          f"({B*S/dt/1e6:.1f} M giant points/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
