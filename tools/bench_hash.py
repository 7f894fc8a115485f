"""Micro-bench: jnp hash160 pipeline vs the fused Pallas kernel at walker
batch size, plus a device correctness cross-check."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import hash160 as h160, pallas_hash

    B = 1 << 18
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(8, B), dtype=np.uint64)
                    .astype(np.uint32))
    print(f"devices={jax.devices()} B={B}", flush=True)

    jnp_fn = jax.jit(lambda x: h160.hash160_both_prefixes(x))
    pal_fn = jax.jit(lambda x: pallas_hash.hash160_both(x))

    for name, fn in (("jnp", jnp_fn), ("pallas", pal_fn)):
        t0 = time.time()
        out = fn(x)
        jax.block_until_ready(out)
        print(f"{name:8s} compile+first {time.time()-t0:.1f}s", flush=True)

    a = jax.block_until_ready(jnp_fn(x))
    b = jax.block_until_ready(pal_fn(x))
    ok = all(bool(jnp.array_equal(u, v)) for u, v in zip(a, b))
    print(f"match: {ok}", flush=True)
    if not ok:
        return 1

    for name, fn in (("jnp", jnp_fn), ("pallas", pal_fn)):
        # bounded 2-deep pipeline: hides dispatch latency without flooding
        # the device queue (JAX never memoizes executions, so re-calling on
        # the same input still measures real device work)
        iters = 20
        t0 = time.time()
        outs = []
        for _ in range(iters):
            outs.append(fn(x))
            if len(outs) > 2:
                jax.block_until_ready(outs.pop(0))
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / iters
        print(f"{name:8s} {dt*1e3:8.3f} ms/call "
              f"({2*B/dt/1e6:.1f} Mhash160/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
