"""Bisect the walker inner step: time cumulative slices of the device
graph to find where the wall-clock goes (sum-of-isolated-ops is ~4ms but
the full step measured ~40ms — some composition effect dominates)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_sync_fn = None


def _sync(out):
    """Force a real device sync: block_until_ready on this runtime returns
    early for pallas-call outputs, so reduce+transfer a scalar instead."""
    global _sync_fn
    import jax
    import jax.numpy as jnp
    if _sync_fn is None:
        _sync_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.uint32)))
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    np.asarray(_sync_fn(leaves[0]))


def timeit(name, fn, iters=5, per=1):
    t_c = time.time()
    out = fn()
    _sync(out)
    compile_s = time.time() - t_c
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.time() - t0) / (iters * per)
    print(f"{name:34s} {dt*1e3:9.3f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import field, curve, match, hash160 as h160, u256
    from keyhunt_tpu.search.walker import WalkerConfig, seed_pivots

    A, W = 64, 4096
    cfg = WalkerConfig(pivots=A, width=W, steps=1, mode="compressed")
    gtx, gty = curve.offset_table_strided(W, A)
    gtx, gty = jnp.asarray(gtx), jnp.asarray(gty)
    px, py = seed_pivots(cfg, 1 << 65)
    t0_, t1_ = match.build_table([(0xDEADBEEF, 0x12345678)])
    t0_, t1_ = jnp.asarray(t0_), jnp.asarray(t1_)
    print(f"devices={jax.devices()} A={A} W={W}", flush=True)

    def dx_inv(px, py):
        # output feeds back as next px: keeps chained calls dependent so
        # the async runtime can't overlap iterations
        dx_main = field.sub(gtx[:, None, :], px[:, :, None])
        inv = field.batch_inv(dx_main.reshape(8, A * W))
        return inv[:, :A], py

    def through_x_state(px, py):
        xn, px2, py2 = through_x(px, py)
        return px2, py2

    def through_x(px, py):
        dx_main = field.sub(gtx[:, None, :], px[:, :, None])
        inv_main = field.batch_inv(dx_main.reshape(8, A * W)).reshape(8, A, W)
        x3 = curve.add_with_inv(px[:, :, None], py[:, :, None],
                                gtx[:, None, :], gty[:, None, :],
                                inv_main, want_y=False)
        xn = field.norm(x3)
        px2 = xn[:, :, -1]
        lam_l = field.mul(field.sub(gty[:, -1:], py), inv_main[:, :, -1])
        py2 = field.norm(
            field.sub(field.mul(lam_l, field.sub(px, x3[:, :, -1])), py))
        return xn, px2, py2

    def through_hash(px, py):
        xn, px2, py2 = through_x(px, py)
        h02, h03 = h160.hash160_both_prefixes(xn)
        return h02, h03, px2, py2

    def through_hash_state(px, py):
        h02, h03, px2, py2 = through_hash(px, py)
        return px2, py2

    def full(px, py):
        h02, h03, px2, py2 = through_hash(px, py)
        masks = []
        for h in (h02, h03):
            masks.append(match.probe(t0_, t1_, h[0], h[1]))
        mask_flat = jnp.stack(masks).reshape(-1)
        hits, count = match.topk_indices(mask_flat, cfg.max_hits)
        return px2, py2

    for name, fn in [("dx+batch_inv (2^18)", dx_inv),
                     ("through x3+norm+advance", through_x_state),
                     ("+ hash160 both", through_hash_state),
                     ("+ probe + gated topk (full)", full)]:
        jf = jax.jit(fn)

        def chained(jf=jf):
            s = (px, py)
            for _ in range(4):
                s = jf(*s)
            return s
        timeit(name, chained, per=4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
