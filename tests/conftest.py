"""Test harness config.

Two backends cooperate:
- the ambient accelerator (the 'axon' TPU tunnel when present) runs the
  compile-heavy kernels — XLA:CPU pathologically explodes on the hash
  graphs (one sha256 compile >7 min on CPU vs ~1 min on the TPU
  toolchain, and results are persistently cached across runs);
- a virtual 8-device CPU mesh backs the multi-device sharding tests
  (`jax.devices("cpu")` — the platform pin 'axon,cpu' keeps both alive).

Sharding tests therefore use hash-free (xpoint) walker configs so their
graphs compile quickly on CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

from keyhunt_tpu import runtime  # noqa: E402

runtime.setup()

REFERENCE_DIR = "/root/reference"


def cpu_devices(n: int):
    devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} cpu devices, have {len(devs)}"
    return devs[:n]


def reference_fixture(name: str) -> str | None:
    """Path to an upstream test fixture, or None if unavailable."""
    path = os.path.join(REFERENCE_DIR, "tests", name)
    return path if os.path.exists(path) else None
