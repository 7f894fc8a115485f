"""Multi-device parity: the sharded walker on the 8-device virtual CPU mesh
must find exactly what the single-device walker finds (SURVEY.md §4.5:
single-process multi-device parity tests).

Uses xpoint mode (no hashing): XLA:CPU compile time explodes on the hash
graphs, and the sharding semantics under test are mode-independent.
"""

import numpy as np
import jax
from jax.sharding import Mesh

from keyhunt_tpu.ops import match
from keyhunt_tpu.parallel.mesh import (
    AXIS, make_sharded_step_fn, seed_pivots_sharded, decode_sharded_hit)
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.walker import WalkerConfig
from conftest import cpu_devices
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def _mesh(n):
    return Mesh(np.array(cpu_devices(n)), (AXIS,))


def test_sharded_walker_8_devices():
    cfg = WalkerConfig(pivots=2, width=32, steps=2, mode="xpoint", max_hits=4)
    n = 8
    # k0 must clear the interleaved-geometry floor: (G*W + G - 1)*stride
    # for G = n*A = 16 global pivots (see walker.py)
    k0 = 1024
    span = cfg.keys_per_call      # 128 keys per device
    plant = [k0 + 0 * span + 5, k0 + 3 * span + 77, k0 + 7 * span + 128]
    pairs = []
    for k in plant:
        x = ecc.pubkey(k)[0]
        pairs.append(((x >> 224) & 0xFFFFFFFF, (x >> 192) & 0xFFFFFFFF))
    t0, t1 = match.build_table(pairs)
    step = make_sharded_step_fn(cfg, t0, t1, _mesh(n))
    px, py = seed_pivots_sharded(cfg, k0, n)
    px2, py2, packed, total = step(px, py)
    hits = np.asarray(packed)[:, :-1]   # (n*S, K); last col is the count
    total = int(np.asarray(total)[0])
    assert total >= len(plant)
    want_x = {ecc.pubkey(p)[0] for p in plant}
    found = set()
    for r in range(hits.shape[0]):
        d, s = divmod(r, cfg.steps)
        for f in hits[r]:
            if int(f) < 0:
                continue
            _, key = decode_sharded_hit(cfg, k0, d, s, int(f), n)
            for cand in (key, ecc.N - key):
                if ecc.pubkey(cand)[0] in want_x:
                    found.add(min(cand, ecc.N - cand))
    assert found == set(plant)


def test_sharded_pivot_state_advances():
    cfg = WalkerConfig(pivots=2, width=16, steps=1, mode="xpoint", max_hits=2)
    n = 8
    t0, t1 = match.build_table([])
    step = make_sharded_step_fn(cfg, t0, t1, _mesh(n))
    k0 = 1024   # past the (G*W + G - 1) floor for G = 16 global pivots
    px, py = seed_pivots_sharded(cfg, k0, n)
    px2, py2, packed, total = step(px, py)
    assert int(np.asarray(total)[0]) == 0
    from keyhunt_tpu.ops import u256
    got = u256.to_ints(np.asarray(px2))
    # interleaved lanes: every inner step advances ALL pivots by the
    # global batch n*A*W, so pivot g ends one global span past its seed
    ntot = n * cfg.pivots
    exp = [ecc.pubkey(k0 + (g + 1 - ntot) + cfg.steps * n * cfg.batch)[0]
           for g in range(ntot)]
    assert got == exp
