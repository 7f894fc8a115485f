"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
tests exercise real collectives without TPU hardware. Must set env vars
before the first `import jax` anywhere in the test process."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str | None:
    """Path to an upstream test fixture, or None if unavailable."""
    path = os.path.join(REFERENCE_DIR, "tests", name)
    return path if os.path.exists(path) else None
