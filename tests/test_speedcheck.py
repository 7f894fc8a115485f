"""Speed self-check targets (README.md:1195-1236 parity): a BSGS run at
the claimed speed must find the planted keys inside the time budget —
here shrunk to a toy speed so the whole loop runs in seconds."""

import os
import tempfile

from keyhunt_tpu.ref import ecc
from keyhunt_tpu.tools.speedcheck import make_speed_targets, main
from keyhunt_tpu.search.bsgs import BsgsConfig, BsgsEngine, build_baby_table
from keyhunt_tpu.io.results import ResultSink
import pytest

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow


def test_make_speed_targets_positions():
    rows = make_speed_targets(1 << 20, [1000.0, 5000.0], seconds=2.0)
    assert rows[0][0] == (1 << 20) + 2000
    assert rows[1][0] == (1 << 20) + 10000
    for key, pub in rows:
        assert pub == ecc.compress(ecc.pubkey(key)).hex()


def test_cli_writes_file(tmp_path):
    out = os.path.join(tmp_path, "sc.txt")
    main(["--start", "0x100000", "--speeds", "1000", "--seconds", "2",
          "-o", out, "--with-keys"])
    line = open(out).read().strip()
    pub, _, key_hex = line.partition(" # ")
    assert int(key_hex, 16) == 0x100000 + 2000
    assert pub.startswith(("02", "03")) and len(pub) == 66


def test_bsgs_finds_speed_targets_on_schedule():
    """At a toy claimed speed, the planted key must fall inside the keyspace
    the engine covers in the budget — found before max_keys runs out."""
    start = 1
    claimed = 4096.0                   # keys/s (toy)
    seconds = 4.0
    rows = make_speed_targets(start, [claimed], seconds=seconds)
    key, _ = rows[0]
    tbl = build_baby_table(64, pivots=2, width=16, steps=2)
    cfg = BsgsConfig(m=64, lanes=4, steps=2)
    tmp = tempfile.mkdtemp()
    sink = ResultSink(path=os.path.join(tmp, "f.txt"), quiet=True)
    eng = BsgsEngine(cfg, tbl, [ecc.pubkey(key)], start, 1 << 20,
                     sink=sink, quiet=True)
    # budget = claimed speed * seconds (with one dispatch of slack)
    budget = int(claimed * seconds) + cfg.keys_per_call(1)
    found = eng.run(max_keys=budget)
    assert found.get(0) == key
