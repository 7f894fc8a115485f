"""Stage breakdown of the giant-dispatch cost via chained in-graph
repetition (the only reliable timing on the tunneled runtime: one fetch
per K repetitions, so neither enqueue-rate illusions nor fixed per-call
costs pollute the marginal).

Stages at the production geometry (L lanes x S steps):
  scan      — the fused Jacobian kernel alone
  affine    — scan + deferred batched inversion + fragment extract
  full      — scan + affine + packed probe + top-k   (the whole link)
  mul       — N dependent (8, L*S) field multiplies  (per-mul cost)

The gap full-minus-affine is the probe; affine-minus-scan is the
inversion; scan/11 per point is the per-mul cost inside the kernel
(11 modmul-equivalents per mixed add, ops/jacwalk.py docstring).
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
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--k", type=int, default=8, help="chain length")
    ap.add_argument("--skip-table", action="store_true",
                    help="skip the probe stage (no slab upload)")
    ap.add_argument("--tmpdir",
                    default=os.path.expanduser("~/.cache/keyhunt_tpu"))
    args = ap.parse_args()

    from keyhunt_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from keyhunt_tpu.ops import jacwalk, match, field
    from keyhunt_tpu.ref import ecc
    from keyhunt_tpu.search.bsgs import (load_table, table_path, seed_lanes,
                                         BsgsConfig, probe_chunks_for)

    m, L, S, K = args.m, args.lanes, args.steps, args.k
    adv = ecc.ec_mul(L * 2 * m)
    negadv = ecc.ec_neg(adv)
    cfg = BsgsConfig(m=m, lanes=L, steps=S)
    q = ecc.pubkey(0x123456789ABCDEF)
    px, py = seed_lanes(cfg, [q], m + 1)
    X, Y = jnp.asarray(px), jnp.asarray(py)
    Z = jnp.zeros((8, L), jnp.uint32).at[0].set(1)

    def scan_link(carry, _):
        X, Y, Z, acc = carry
        Xo, Yo, Zo, xs, zs, dg = jacwalk.giant_scan(
            X, Y, Z, negadv[0], negadv[1], S)
        acc = acc + xs[0, ::65536].sum(dtype=jnp.uint32)[None] \
            + zs[0, ::65536].sum(dtype=jnp.uint32)[None] \
            + dg.sum(dtype=jnp.uint32)[None]
        return (Xo, Yo, Zo, acc), None

    def affine_link(carry, _):
        X, Y, Z, acc = carry
        Xo, Yo, Zo, xs, zs, dg = jacwalk.giant_scan(
            X, Y, Z, negadv[0], negadv[1], S)
        xa = jacwalk.to_affine_x(xs, zs)
        acc = acc + xa[7, ::65536].sum(dtype=jnp.uint32)[None] \
            + dg.sum(dtype=jnp.uint32)[None]
        return (Xo, Yo, Zo, acc), None

    stages = {"scan": scan_link, "affine": affine_link}

    if not args.skip_table:
        tbl = load_table(m, path=table_path(m, args.tmpdir), verify=False)
        assert tbl is not None, f"cached m={m:#x} table required"
        t0 = time.time()
        slab, starts, shift = tbl.device_packed()
        jax.block_until_ready(slab)
        print(f"[parts] slab resident in {time.time()-t0:.1f}s", flush=True)
        chunks = probe_chunks_for(L * S, int(slab.shape[1]))

        def full_link(carry, _):
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
                hit, pos = match.probe_buckets_packed(slab, xa[7], xa[6],
                                                      shift)
            lanes, jsel, count = match.topk_with_payload(hit, pos, 4)
            acc = acc + count.astype(jnp.uint32) \
                + jnp.uint32(jsel.sum())[None] + dg.sum(dtype=jnp.uint32)[None]
            return (Xo, Yo, Zo, acc), None

        stages["full"] = full_link

    results = {}
    for name, link in stages.items():
        @jax.jit
        def chained(X, Y, Z, _link=link):
            (Xo, Yo, Zo, acc), _ = jax.lax.scan(
                _link, (X, Y, Z, jnp.zeros((1,), jnp.uint32)), None, length=K)
            return acc
        acc = chained(X, Y, Z)
        _ = np.asarray(acc)
        t0 = time.time()
        acc = chained(X, Y, Z)
        got = int(np.asarray(acc)[0])
        per = (time.time() - t0) / K
        results[name] = per
        pts = L * S / per
        print(f"[parts] {name:7s}: {per*1e3:7.1f} ms/link, "
              f"{pts/1e6:7.1f} M pts/s (acc={got})", flush=True)

    # dependent mul chain at the emission batch size
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(1, 1 << 32, (8, L * S),
                                 dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 32, (8, L * S),
                                 dtype=np.int64).astype(np.uint32))
    NM = 32

    @jax.jit
    def mulchain(x, y):
        def body(c, _):
            return field.mul(c, y), None
        out, _ = jax.lax.scan(body, x, None, length=NM)
        return out[0, ::65536].sum(dtype=jnp.uint32)[None]

    acc = mulchain(a, b)
    _ = np.asarray(acc)
    t0 = time.time()
    acc = mulchain(a, b)
    _ = int(np.asarray(acc)[0])
    per = (time.time() - t0) / NM
    eff = L * S / per
    print(f"[parts] mul    : {per*1e3:7.2f} ms per (8, {L*S}) modmul "
          f"-> {eff/1e6:.0f} M modmul/s", flush=True)

    if "affine" in results and "scan" in results:
        print(f"[parts] inversion share: "
              f"{(results['affine']-results['scan'])*1e3:.1f} ms", flush=True)
    if "full" in results and "affine" in results:
        print(f"[parts] probe+topk share: "
              f"{(results['full']-results['affine'])*1e3:.1f} ms", flush=True)
    kern = results.get("scan")
    if kern:
        permul = kern / S / 11
        print(f"[parts] kernel per-point: {kern/ (L*S)*1e9:.1f} ns "
              f"(~11 modmul) -> in-kernel mul rate "
              f"{L*S*11/kern/1e6:.0f} M modmul/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
