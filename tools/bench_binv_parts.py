"""Apportion the fused batch-inversion cost: up kernel alone, down kernel
alone, full pair, at the walker's B=2^18, plus a Fermat-only variant
(B=128) to expose the latency-bound root inversion."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=20):
    import jax
    out = fn()
    jax.block_until_ready(out)
    # sync via scalar reduce (block_until_ready returns early for pallas)
    import jax.numpy as jnp
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.uint32)))
    np.asarray(red(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    np.asarray(red(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import pallas_field as pf

    B = 1 << 18
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 2**32, (8, B), dtype=np.uint64)
                    .astype(np.uint32))
    print(f"devices={jax.devices()} B=2^18", flush=True)

    tile = min(pf.TILE, B)
    ntiles = pf._MAX_NTILES
    chunk = ntiles * tile
    nchunks = -(-B // chunk)
    up, down = pf._binv_calls(nchunks, ntiles, tile, False)
    x3 = x.reshape(8, B // 128, 128)

    up_j = jax.jit(lambda v: up(v))
    ups = up_j(x3)
    down_j = jax.jit(lambda v, *u: down(v, *u))

    timeit("up kernel (tree+levels out)", lambda: up_j(x3))
    timeit("down kernel (fermat+downsweep)", lambda: down_j(x3, *ups))
    timeit("full batch_inv", lambda: pf.batch_inv(x))
    timeit("one mul (8,2^18)", lambda: pf.mul(x, x))
    timeit("one sqr (8,2^18)", lambda: pf.sqr(x))
    return 0


if __name__ == "__main__":
    sys.exit(main())
