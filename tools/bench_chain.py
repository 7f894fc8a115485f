"""Dependent-chain microbenchmarks: feed each op's output into the next
call so the device cannot overlap iterations — measures true sequential
latency (the walker/BSGS inner loops are dependent chains; independent
back-to-back timing overstates throughput on an async runtime)."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import field, u256

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    N = 64                      # chain length inside one jit
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(1, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))
    print(f"devices={jax.devices()} batch={B} chain={N}", flush=True)

    def bench(name, jf, x, per_call_ops):
        out = jf(x)
        jax.block_until_ready(out)
        t0 = time.time()
        out = jf(x)
        jax.block_until_ready(out)
        dt = time.time() - t0
        per = dt / per_call_ops
        print(f"{name:30s} {per*1e3:9.4f} ms/op  {per/B*1e9:8.3f} ns/elt",
              flush=True)

    @jax.jit
    def chain_mul(x):
        def body(c, _):
            return field.mul(c, b), None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    @jax.jit
    def chain_sqr(x):
        def body(c, _):
            return field.sqr(c), None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    @jax.jit
    def chain_sub(x):
        def body(c, _):
            return field.sub(c, b), None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    @jax.jit
    def one_batch_inv(x):
        return field.batch_inv(x)

    @jax.jit
    def one_fermat(x):
        return field.inv(x)

    @jax.jit
    def chain_mul_unrolled(x):
        for _ in range(N):
            x = field.mul(x, b)
        return x

    @jax.jit
    def chain_sub_unrolled(x):
        for _ in range(N):
            x = field.sub(x, b)
        return x

    @jax.jit
    def chain_mul_pallas(x):
        from keyhunt_tpu.ops import pallas_field
        for _ in range(N):
            x = pallas_field.mul(x, b)
        return x

    @jax.jit
    def chain_sqr_pallas(x):
        from keyhunt_tpu.ops import pallas_field
        for _ in range(N):
            x = pallas_field.sqr(x)
        return x

    bench("mul (scan chain)", chain_mul, a, N)
    bench("sub (scan chain)", chain_sub, a, N)
    bench("mul (unrolled chain)", chain_mul_unrolled, a, N)
    bench("sub (unrolled chain)", chain_sub_unrolled, a, N)
    bench("mul (pallas, unrolled)", chain_mul_pallas, a, N)
    bench("sqr (pallas, unrolled)", chain_sqr_pallas, a, N)
    bench("sqr (scan chain)", chain_sqr, a, N)
    bench("batch_inv (single)", one_batch_inv, a, 1)
    if B <= 8192:
        bench("fermat inv (single)", one_fermat, a, 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
