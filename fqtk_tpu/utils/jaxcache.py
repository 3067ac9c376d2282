"""Persistent JAX compilation cache.

Cold XLA compiles through the axon remote-compile relay cost 1-2 minutes;
enabling the on-disk cache makes repeat program shapes near-instant across
processes.  Called from the CLI, bench harness, and graft entry.

Deliberately does NOT import jax when it isn't loaded yet: the demux hot
path may never touch a device (host-matcher policies), and importing jax
costs ~1s of CLI cold start.  JAX reads these settings from the
environment at import time, so seeding ``os.environ`` configures any
later import; an already-imported jax is configured directly.
"""

from __future__ import annotations

import os
import sys


def enable_compilation_cache(path: str | None = None) -> None:
    try:
        cache_dir = path or os.environ.get(
            "FQTK_JAX_CACHE", os.path.expanduser("~/.cache/fqtk_jax_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        if "jax" in sys.modules:
            jax = sys.modules["jax"]
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        else:
            os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass
