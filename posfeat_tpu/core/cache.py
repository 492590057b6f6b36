"""Persistent XLA compilation cache.

The axon relay's remote compile costs minutes per program; the
persistent cache turns repeat compiles (re-runs of bench/train/extract,
driver checks) into sub-second loads. Safe everywhere — the cache key
covers program, flags, and platform.
"""

from __future__ import annotations

import os

_DEFAULT = os.environ.get(
    "POSFEAT_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
)


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
