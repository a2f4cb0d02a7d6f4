"""Persistent XLA compilation cache.

First compiles of the production-size programs take minutes on this
toolchain (remote compile service); the persistent cache makes every
subsequent process start from compiled binaries. Enabled by the engine
and the CLIs.

Determinism is the load-bearing part: the Mosaic/Pallas custom-call
payloads serialize the FULL jax source-location stack, including the
`<module>` frame of the ENTRY SCRIPT, so the same program lowered from
two different harnesses (bench.py vs scale_run.py vs pipeline/infer.py)
produced byte-different HLO — and byte-different HLO misses BOTH the
local persistent cache (~10 s recompile) and the remote toolchain's
executable cache (~2-3 min server-side compile, the round-4 "143 s
extract" symptom). `jax_include_full_tracebacks_in_locations=False`
keeps only the op's own frame (inside this package — stable), which
measured: identical HLO across entry scripts, AOT compile 10 s -> 0.4 s,
first execution 118 s -> 0.0 s (2026-08-19, /tmp/diag A-E runs; see
BASELINE.md round-5 compile-tax entry)."""

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
        # Single-frame locations make lowered HLO deterministic across
        # entry scripts (see module docstring). Opt out for debugging
        # with DPM_FULL_LOCATIONS=1 (costs a full recompile of every
        # program: the location strings change the program bytes).
        if not os.environ.get("DPM_FULL_LOCATIONS"):
            jax.config.update(
                "jax_include_full_tracebacks_in_locations", False)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("compilation cache unavailable: %s", e)
