"""Compilation-cache helper."""

from __future__ import annotations

import os


def _enable_compilation_cache():
    """Persist XLA compilations across CLI invocations: the SNV net takes
    tens of seconds to compile; a warm cache makes repeat train/predict
    runs start in seconds."""
    try:
        import jax
        cache_dir = os.environ.get(
            "MURAL_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "mural_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


