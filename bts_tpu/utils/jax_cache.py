"""Persistent XLA compile cache (TPU only).

On this class of deployment the big jit programs (train step, full-res
eval forwards) take tens of seconds to minutes to compile; the persistent
cache makes every CLI after the first start in seconds. CPU is excluded:
XLA:CPU AOT cache entries bake in host CPU features and can hang or SIGILL
when loaded on a host that reports differently.
"""

from __future__ import annotations

import jax

DEFAULT_CACHE_DIR = "/tmp/jax_cache_tpu"


def enable_persistent_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR):
    """Enable the on-disk compile cache when running on TPU. No-op on CPU."""
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
