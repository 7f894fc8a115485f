"""Tunnel-free dispatch-floor measurement (VERDICT r4 next-steps #9).

The r4 geometry sweep (tools/bench_jacgeo.py) measured an ~18 ms FIXED
cost per giant dispatch and tuned the lane/step geometry around it — but
that floor includes the tunneled runtime's host<->device round trip
(~14 ms), an artifact of the dev harness, not of TPU hosts. This tool
separates the two by CHAINING K whole giant dispatches inside ONE jit
(scan + deferred inversion + packed probe + top-k accumulate per link),
so only a tiny checksum crosses the host boundary per K dispatches:

    per-dispatch cost = T(K)/K  ->  K->inf limit = tunnel-free cost
    fixed floor       = T(1) - tunnel-free cost

The production host's optimum geometry falls out of the tunnel-free
marginal cost; `bench.py` headline numbers stay honest single-dispatch
(pipelined) rates, and PARITY.md records both.

Usage: python tools/bench_dispatch_floor.py [--m 1073741824]
           [--lanes 131072] [--steps 16] [--chains 1,2,4,8]
Requires the cached m table (bench.py builds it).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 30)
    ap.add_argument("--lanes", type=int, default=131072,
                    help="TOTAL giant lanes")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--chains", default="1,2,4,8")
    ap.add_argument("--tmpdir",
                    default=os.path.expanduser("~/.cache/keyhunt_tpu"))
    args = ap.parse_args()

    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import jacwalk, match, u256
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.search.bsgs import load_table, table_path, seed_lanes, \
        BsgsConfig, probe_chunks_for

    m, L, S = args.m, args.lanes, args.steps
    tbl = load_table(m, path=table_path(m, args.tmpdir), verify=False)
    assert tbl is not None, f"cached m={m:#x} table required"
    t0 = time.time()
    slab, starts, shift = tbl.device_packed()
    jax.block_until_ready(slab)
    print(f"[floor] slab resident in {time.time()-t0:.1f}s "
          f"({np.prod(slab.shape)*4/2**30:.2f} GiB)", flush=True)

    adv = ecc.ec_mul(L * 2 * m)
    negadv = ecc.ec_neg(adv)

    def make_chained(K: int):
        @jax.jit
        def chained(X, Y, Z, slab):
            chunks = probe_chunks_for(L * S, int(slab.shape[1]))

            def link(carry, _):
                X, Y, Z, acc = carry
                Xo, Yo, Zo, xs, zs, dg = jacwalk.giant_scan(
                    X, Y, Z, negadv[0], negadv[1], S)
                xa = jacwalk.to_affine_x(xs, zs)
                if chunks > 1:
                    Q = L * S
                    h, p = jax.lax.map(
                        lambda ab: match.probe_buckets_packed(
                            slab, ab[0], ab[1], shift),
                        (xa[7].reshape(chunks, Q // chunks),
                         xa[6].reshape(chunks, Q // chunks)))
                    hit, pos = h.reshape(Q), p.reshape(Q)
                else:
                    hit, pos = match.probe_buckets_packed(
                        slab, xa[7], xa[6], shift)
                lanes, jsel, count = match.topk_with_payload(hit, pos, 4)
                # keep every stage live in one tiny accumulator
                acc = (acc + count.astype(jnp.uint32)
                       + jnp.uint32(jsel.sum())
                       + dg.sum(dtype=jnp.uint32))
                return (Xo, Yo, Zo, acc), None
            (Xo, Yo, Zo, acc), _ = jax.lax.scan(
                link, (X, Y, Z, jnp.zeros((1,), jnp.uint32)), None, length=K)
            return acc
        return chained

    # seed real lanes (any target works; degenerate-free by construction)
    cfg = BsgsConfig(m=m, lanes=L, steps=S)
    q = ecc.pubkey(0x123456789ABCDEF)
    px, py = seed_lanes(cfg, [q], m + 1)
    X = jnp.asarray(px)
    Y = jnp.asarray(py)
    Z = jnp.zeros((8, L), jnp.uint32).at[0].set(1)

    results = {}
    for K in [int(k) for k in args.chains.split(",")]:
        fn = make_chained(K)
        acc = fn(X, Y, Z, slab)
        _ = np.asarray(acc)                     # real fetch (compile+warm)
        t0 = time.time()
        acc = fn(X, Y, Z, slab)
        got = int(np.asarray(acc)[0])
        dt = time.time() - t0
        per = dt / K
        pts = L * S / per
        results[K] = per
        print(f"[floor] K={K:3d}: {dt*1e3:8.1f} ms total, {per*1e3:7.1f} "
              f"ms/dispatch, {pts/1e6:7.1f} M pts/s, "
              f"{pts*2*m/1e15:8.2f} Pkeys/s (acc={got})", flush=True)

    ks = sorted(results)
    if len(ks) >= 2:
        k_lo, k_hi = ks[0], ks[-1]
        # T(K) = fixed + K*marginal  ->  marginal from the two extremes
        marginal = (results[k_hi] * k_hi - results[k_lo] * k_lo) \
            / (k_hi - k_lo)
        fixed = results[k_lo] * k_lo - marginal * k_lo
        pts = L * S / marginal
        print(f"[floor] tunnel-free marginal {marginal*1e3:.1f} ms/dispatch "
              f"({marginal/(L*S)*1e9:.2f} ns/pt) -> {pts/1e6:.1f} M pts/s "
              f"= {pts*2*m/1e15:.2f} Pkeys/s at m={m:#x}; "
              f"per-call fixed overhead {fixed*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
