"""Multi-device parity: the sharded walker on the 8-device virtual CPU mesh
must find exactly what the single-device walker finds (SURVEY.md §4.5:
single-process multi-device parity tests)."""

import numpy as np
import jax

from keyhunt_tpu.ops import match
from keyhunt_tpu.parallel.mesh import (
    make_mesh, make_sharded_step_fn, seed_pivots_sharded, decode_sharded_hit, AXIS)
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import hash160
from keyhunt_tpu.search.walker import WalkerConfig


def test_sharded_walker_8_devices():
    assert len(jax.devices()) >= 8
    cfg = WalkerConfig(pivots=2, width=32, steps=2, mode="compressed", max_hits=4)
    n = 8
    k0 = 64                       # > W
    span = cfg.keys_per_call      # 128 keys per device
    # plant one key inside device 0, 3, 7 blocks
    plant = [k0 + 0 * span + 5, k0 + 3 * span + 77, k0 + 7 * span + 128]
    pairs = []
    for k in plant:
        h = hash160(ecc.compress(ecc.pubkey(k)))
        pairs.append((int.from_bytes(h[0:4], "little"), int.from_bytes(h[4:8], "little")))
    t0, t1 = match.build_table(pairs)
    mesh = make_mesh(n)
    step = make_sharded_step_fn(cfg, t0, t1, mesh)
    px, py = seed_pivots_sharded(cfg, k0, n)
    px2, py2, hits, counts, total = step(px, py)
    hits = np.asarray(hits)       # (n*S, K)
    total = int(np.asarray(total)[0])
    assert total >= len(plant)
    found = set()
    for r in range(hits.shape[0]):
        d, s = divmod(r, cfg.steps)
        for f in hits[r]:
            if int(f) < 0:
                continue
            _, key = decode_sharded_hit(cfg, k0, d, s, int(f))
            # device hits are candidates; exact-verify like the engine
            for cand in (key, ecc.N - key):
                if hash160(ecc.compress(ecc.pubkey(cand))) in {
                        hash160(ecc.compress(ecc.pubkey(p))) for p in plant}:
                    found.add(cand)
    assert found == set(plant)


def test_sharded_pivot_state_advances():
    cfg = WalkerConfig(pivots=2, width=16, steps=1, mode="xpoint", max_hits=2)
    n = 8
    t0, t1 = match.build_table([])
    mesh = make_mesh(n)
    step = make_sharded_step_fn(cfg, t0, t1, mesh)
    px, py = seed_pivots_sharded(cfg, 100, n)
    px2, py2, hits, counts, total = step(px, py)
    assert int(np.asarray(total)[0]) == 0
    # after one call each pivot advanced by keys_per_call (=A*W*S) keys
    from keyhunt_tpu.ops import u256
    got = u256.to_ints(np.asarray(px2))
    span = cfg.keys_per_call * cfg.stride
    exp = []
    for d in range(n):
        for a in range(cfg.pivots):
            exp.append(ecc.pubkey(100 + d * span + a * cfg.width + cfg.steps * cfg.batch)[0])
    assert got == exp
