"""Persistent XLA compilation cache setup.

The fused detector compiles once per (image shape, static config); XLA
compile times dominate cold starts (tens of seconds per shape on some
backends), so the framework enables JAX's persistent compilation cache by
default. Disable with MAGNIFY_TPU_DISABLE_CACHE=1 or point elsewhere with
MAGNIFY_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os

_configured = False


def ensure_compilation_cache() -> None:
    global _configured
    if _configured or os.environ.get("MAGNIFY_TPU_DISABLE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "MAGNIFY_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "magnify_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _configured = True


ensure_compilation_cache()
