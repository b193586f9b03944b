"""Persistent XLA compilation cache.

Every entry point (train CLI, evalkit CLI, serve worker, bench) calls
:func:`enable` so recompiles of identical programs are served from disk —
on the tunneled-TPU setup a 32k-context program costs minutes to compile
and long-context programs much more, so cross-run reuse matters. The
reference has no analogue (torch eager). No-op on the CPU backend (jax's
persistent cache doesn't engage there) and when ``V2PE_COMPILE_CACHE=0``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.expanduser("~/.cache/v2pe_jax")


def enable(cache_dir: str | None = None,
           min_compile_time_secs: float = 2.0) -> str | None:
    """Point jax's compilation cache at a disk directory. Returns the dir
    (or None when disabled via V2PE_COMPILE_CACHE=0)."""
    env = os.environ.get("V2PE_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = env or cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
    except Exception as e:  # never fail an entry point over caching
        logger.warning("compilation cache disabled: %s", e)
        return None
    return cache_dir
