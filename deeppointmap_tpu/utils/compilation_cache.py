"""Persistent XLA compilation cache.

First compiles of the production-size programs take minutes on this
toolchain (remote compile service); the persistent cache makes every
subsequent process start from compiled binaries. Enabled by the engine
and the CLIs."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT = os.environ.get("DPM_JAX_CACHE",
                          os.path.expanduser("~/.cache/dpm_jax_cache"))


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("compilation cache unavailable: %s", e)
