"""Runtime configuration helpers.

The walker/BSGS graphs are large (hundreds of inlined 256-bit muls);
XLA:TPU compiles them in minutes. A persistent compilation cache makes
that a one-time cost per (shape, config) across process restarts.
"""

from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache. Idempotent."""
    global _DONE
    if _DONE:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "KEYHUNT_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "keyhunt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
