"""Persistent XLA compilation cache setup.

This JAX build ignores the JAX_COMPILATION_CACHE_DIR environment variable
(config reports None / "cache is disabled"); only jax.config.update works.
Encoder graphs compile in minutes on small hosts, so the cache matters.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parents[2] / "build" / "jax_cache"


def enable(cache_dir: str | os.PathLike | None = None) -> None:
    import jax

    path = Path(cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or _DEFAULT)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_enable_compilation_cache", True)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
