"""VPU uint32 roofline microbench.

Establishes the denominator for the walker/BSGS per-op roofline
(PARITY.md): peak sustained u32 elementwise ops/s in a Pallas kernel,
for (a) independent op streams (throughput), (b) one dependent chain
(latency-bound issue), and (c) a rotate-heavy mix approximating the
SHA/RIPEMD round body (TPU has no rotate instruction: each rotation
lowers to shl+shr+or = 3 ops).

The point: if hash160 already runs at the measured VPU peak, the
hash-counted walker modes are AT speed-of-light and the remaining
headroom lives in the mul-bound paths (BSGS giant walk, xpoint walker).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOPS = 512          # ops per element per kernel pass


def main() -> int:
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    rows = 64
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def mk(body):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.uint32),
            grid=(B // 128 // rows,),
            in_specs=[spec], out_specs=spec)

    def indep_kernel(x_ref, o_ref):
        # 4 independent accumulator streams (fills multi-issue slots)
        v = x_ref[:]
        a, b, c, d = v, v + np.uint32(1), v ^ np.uint32(3), v + np.uint32(7)
        for _ in range(NOPS // 8):
            a = a + v
            b = b ^ v
            c = c + b
            d = d ^ a
            a = a ^ d
            b = b + c
            c = c ^ a
            d = d + b
        o_ref[:] = a ^ b ^ c ^ d

    def dep_kernel(x_ref, o_ref):
        v = x_ref[:]
        x = x_ref[:]
        for i in range(NOPS // 2):
            v = v + x
            v = v ^ x
        o_ref[:] = v

    def rot_kernel(x_ref, o_ref):
        # SHA-ish mix: rotate(3 ops) + add + xor per "round op"
        v = x_ref[:]
        x = x_ref[:]
        for i in range(NOPS // 5):
            r = (v << np.uint32(7)) | (v >> np.uint32(25))     # 3 ops
            v = (r + x) ^ x                                     # 2 ops
        o_ref[:] = v

    rng = np.random.default_rng(0)
    xin = jnp.asarray(
        rng.integers(0, 2**32, (B // 128, 128), dtype=np.uint64)
        .astype(np.uint32))

    REPS = 8
    for name, body, ops in (("independent", indep_kernel, NOPS),
                            ("dependent", dep_kernel, NOPS),
                            ("rotate-mix", rot_kernel, NOPS // 5 * 5)):
        call = mk(body)

        @jax.jit
        def fn(x, _call=call):
            # chain REPS kernel passes and fetch ONE (1,) checksum — a
            # full-output fetch costs ~370 ms on the tunnel (measured)
            # and buries the compute time entirely
            def rep(c, _):
                return _call(c), None
            out, _ = jax.lax.scan(rep, x, None, length=REPS)
            return out[0, ::1024].sum(dtype=jnp.uint32)[None]

        acc = fn(xin)
        _ = np.asarray(acc)                    # real fetch (warm)
        t0 = time.time()
        acc = fn(xin)
        s = int(np.asarray(acc)[0])
        dt = time.time() - t0
        total = ops * B * REPS
        print(f"[vpu] {name:12s}: {dt*1e3:7.2f} ms for {total/1e9:.2f} G "
              f"u32 ops -> {total/dt/1e12:.3f} T ops/s  (checksum {s})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
