"""Minikeys-mode tests: counter codec, Jacobian scalar mult, and an
end-to-end hit with a planted valid minikey (oracle style of the
README:1253-1273 run)."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keyhunt_tpu.io.results import ResultSink
from keyhunt_tpu.io.targets import TargetSet
from keyhunt_tpu.ops import u256, field, curve, match
from keyhunt_tpu.ref import ecc
from keyhunt_tpu.ref.hashes import sha256, hash160
from keyhunt_tpu.search.minikeys import (
    MinikeysConfig, MinikeysEngine, minikey_from_int, minikey_to_int,
    batch_minikeys)

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def test_minikey_codec():
    for v in (0, 1, 57, 58, 58**5 - 1, 58**5, 12345678901234567890 % 58**21):
        mk = minikey_from_int(v)
        assert len(mk) == 22 and mk[0] == "S"
        assert minikey_to_int(mk) == v


def test_batch_minikeys_sequential():
    base = 123456789
    msgs, nxt = batch_minikeys(base, 100)
    assert nxt == base + 100
    for i in range(100):
        assert msgs[i].tobytes().decode() == minikey_from_int(base + i)


def test_batch_minikeys_carry_clamp():
    base = 58**5 - 10          # 10 values until the low-digit boundary
    msgs, nxt = batch_minikeys(base, 100)
    assert msgs.shape[0] == 10
    assert nxt == 58**5


def test_scalar_mult_base():
    ks = [1, 2, 3, 0xDEADBEEF, ecc.N - 1, 2**255 % ecc.N]
    kl = jnp.asarray(u256.from_ints(ks))
    f = jax.jit(lambda k: tuple(field.norm(v) for v in curve.scalar_mult_base(k)))
    x, y = f(kl)
    for i, k in enumerate(ks):
        want = ecc.pubkey(k)
        assert (u256.to_ints(x)[i], u256.to_ints(y)[i]) == want, f"k={k}"


def _find_valid_minikey(start: int) -> tuple[str, int]:
    v = start
    while True:
        mk = minikey_from_int(v)
        if sha256(mk.encode() + b"?")[0] == 0:
            return mk, v
        v += 1


def test_minikeys_end_to_end():
    mk, v = _find_valid_minikey(10_000_000)
    key = int.from_bytes(sha256(mk.encode()), "big") % ecc.N
    h = hash160(ecc.uncompress_bytes(ecc.pubkey(key)))
    pairs = [(int.from_bytes(h[0:4], "little"), int.from_bytes(h[4:8], "little"))]
    t0, t1 = match.build_table(pairs)
    ts = TargetSet(mode="hash160", exact={h}, t0=t0, t1=t1)
    tmp = tempfile.mkdtemp()
    sink = ResultSink(path=os.path.join(tmp, "mk.txt"), quiet=True)
    eng = MinikeysEngine(MinikeysConfig(filter_batch=2048, solve_lanes=16),
                         ts, base=minikey_from_int(10_000_000), sink=sink,
                         quiet=True)
    # scan enough candidates to pass v and flush the solve queue
    found = eng.run(max_candidates=(v - 10_000_000) + 6000)
    assert (mk, key) in found


def test_random_mode_rerolls_base_per_block(monkeypatch):
    """-R re-rolls a FRESH random base per block (keyhunt.cpp:3121-3170),
    it does not increment from one random start forever."""
    from keyhunt_tpu.io.targets import TargetSet
    from keyhunt_tpu.ops import match as _match
    import numpy as np
    ts = TargetSet(mode="hash160", exact=set())
    ts.t0, ts.t1 = _match.build_table([])
    eng = MinikeysEngine(MinikeysConfig(filter_batch=256, solve_lanes=16),
                         ts, rng_seed=7, quiet=True, random_mode=True)
    bases = []
    import keyhunt_tpu.search.minikeys as mk

    real_batch = mk.batch_minikeys

    def spy(base_int, count, alphabet):
        bases.append(base_int)
        return real_batch(base_int, count, alphabet)

    monkeypatch.setattr(mk, "batch_minikeys", spy)
    eng.run(max_candidates=4 * 256)
    assert len(bases) >= 4
    # consecutive bases must NOT be sequential increments of each other
    diffs = {bases[i + 1] - bases[i] for i in range(len(bases) - 1)}
    assert diffs != {256}
    # and the reroll stream is reproducible from the seed
    import random
    want = []
    r = random.Random(7)
    r.randrange(58 ** 21)            # constructor's initial base draw
    for _ in bases:
        want.append(r.randrange(58 ** 21))
    assert bases == want
