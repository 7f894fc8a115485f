"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
tests exercise real collectives without TPU hardware.

The environment pins jax_platforms to the 'axon' TPU tunnel at import time
(env JAX_PLATFORMS is ignored), so the override must go through
jax.config.update BEFORE any backend initialisation."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from keyhunt_tpu import runtime  # noqa: E402

runtime.setup()

REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str | None:
    """Path to an upstream test fixture, or None if unavailable."""
    path = os.path.join(REFERENCE_DIR, "tests", name)
    return path if os.path.exists(path) else None
