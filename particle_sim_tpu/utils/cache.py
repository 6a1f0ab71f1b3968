"""Persistent XLA compilation cache.

The sorted rasterizer and the variadic 1M-element sort cost minutes of
Mosaic/XLA compile time on first use (see README perf notes). Enabling
JAX's persistent compilation cache makes that a once-per-machine cost:
subsequent processes load the compiled executable from disk.

Called by every entry point (cli, server, bench); opt out with
``PSIM_NO_COMPILE_CACHE=1`` or override the location with
``PSIM_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "particle_sim_tpu", "xla")


def enable(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compile cache; returns the dir (None if off)."""
    if os.environ.get("PSIM_NO_COMPILE_CACHE"):
        return None
    import jax

    path = (cache_dir or os.environ.get("PSIM_COMPILE_CACHE_DIR")
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
