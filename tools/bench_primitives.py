"""Raw VPU primitive rates on the attached TPU: what does one elementwise
op cost at (8, 2^18)? Chains N dependent ops inside ONE jit so launch
overhead is amortized and XLA can't elide the chain."""

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

    B = 1 << 18
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.integers(0, 2**32, (8, B), dtype=np.uint64).astype(np.uint32))
    xf = jnp.asarray(rng.random((8, B), dtype=np.float32))
    N = 64

    def chain(op, x):
        def f(v):
            for _ in range(N):
                v = op(v)
            return v
        return jax.jit(f), x

    cases = {
        "u32 mul":  chain(lambda v: v * (v | np.uint32(1)), xu),
        "u32 add":  chain(lambda v: v + (v >> np.uint32(1)), xu),
        "u32 shift+and": chain(lambda v: (v >> np.uint32(3)) & np.uint32(0xFFFF), xu),
        "u16-range mul (masked u32)": chain(
            lambda v: ((v & np.uint32(0xFFFF)) * ((v >> np.uint32(16)) | np.uint32(1))) ^ v, xu),
        "f32 mul":  chain(lambda v: v * (v + np.float32(1.0)), xf),
        "f32 fma":  chain(lambda v: v * np.float32(1.000001) + v, xf),
        "i32 mul":  chain(lambda v: v * (v | np.int32(1)), xu.astype(jnp.int32)),
    }

    print(f"devices={jax.devices()} B=2^18 chain={N}", flush=True)
    for name, (f, x) in cases.items():
        out = f(x)
        jax.block_until_ready(out)
        t0 = time.time()
        R = 20
        for _ in range(R):
            out = f(out if out.dtype == x.dtype else x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / (R * N)
        rate = 8 * B / dt / 1e9
        print(f"{name:28s} {dt*1e6:8.2f} us/op   {rate:8.1f} Gelem/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
