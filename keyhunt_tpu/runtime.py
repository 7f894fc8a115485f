"""Runtime configuration helpers.

The walker/BSGS graphs are large (hundreds of inlined 256-bit muls);
XLA:TPU compiles them in minutes. A persistent compilation cache makes
that a one-time cost per (shape, config) across process restarts.

Multi-host: `setup(coordinator=..., num_processes=..., process_id=...)`
(or the KEYHUNT_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID env vars)
initializes `jax.distributed` before any device query, so `jax.devices()`
spans every host's chips and one global mesh covers the slice — the
replacement for the reference's TCP daemon + host fan-out client
(`bsgsd_client.py:284-404`): collectives ride ICI/DCN instead of a
Python socket pool.
"""

from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str | None = None, coordinator: str | None = None,
          num_processes: int | None = None,
          process_id: int | None = None) -> None:
    """Enable the persistent XLA compilation cache and (when coordinator
    info is given via args or env) the multi-process runtime. Idempotent."""
    global _DONE
    if _DONE:
        return
    import jax

    coordinator = coordinator or os.environ.get("KEYHUNT_TPU_COORDINATOR")
    if coordinator:
        if num_processes is None:
            num_processes = int(os.environ["KEYHUNT_TPU_NUM_PROCESSES"])
        if process_id is None:
            process_id = int(os.environ["KEYHUNT_TPU_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    if cache_dir is None:
        cache_dir = os.environ.get(
            "KEYHUNT_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "keyhunt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
