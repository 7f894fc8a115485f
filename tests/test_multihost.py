"""Multi-process (multi-host analog) dry run: 2 jax.distributed CPU
processes x 4 virtual devices, one global mesh, sharded walker step with
cross-process psum — the DCN story of SURVEY.md §5."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_dryrun_two_processes():
    # covers walker AND BSGS engine phases; XLA:CPU pays minutes for the
    # BSGS graph when the persistent compile cache is cold
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_dryrun.py"),
         "--procs", "2", "--port", "12731"],
        cwd=ROOT, timeout=900, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout
    assert proc.stdout.count("bsgs OK") == 2
