"""Persistent JAX compilation cache.

Cold XLA compiles through the axon remote-compile relay cost 1-2 minutes;
enabling the on-disk cache makes repeat program shapes near-instant across
processes.  Called from the CLI, bench harness, and graft entry.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    try:
        import jax

        cache_dir = path or os.environ.get(
            "FQTK_JAX_CACHE", os.path.expanduser("~/.cache/fqtk_jax_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
