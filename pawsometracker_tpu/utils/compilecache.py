"""Persistent XLA compilation cache setup.

Every fresh Python process pays the full XLA compile for the tracker's scan
engines (tens of seconds on a 1-core host; worse over a slow TPU tunnel).
JAX's persistent compilation cache amortizes that across processes: the
second process deserializes the compiled executable in ~0.1 s. The reference
has no analog (Julia caches natively via precompilation); for this framework
the cache is the difference between a usable CLI and a 30-second startup.

Enabled automatically on import of :mod:`pawsometracker_tpu` unless the user
opted out (``PAWS_TPU_NO_COMPILE_CACHE=1``) or already configured a cache
themselves (``JAX_COMPILATION_CACHE_DIR`` env or ``jax.config``).
"""

from __future__ import annotations

import logging
import os

#: set by :func:`enable_persistent_cache` to the directory in use (or None)
cache_dir: str | None = None


def default_cache_dir() -> str:
    """``$PAWSOMETRACKER_CACHE/xla`` (shared root with the engine-decision
    cache, pipeline.py) or ``~/.cache/pawsometracker_tpu/xla``."""
    root = os.environ.get(
        "PAWSOMETRACKER_CACHE", os.path.expanduser("~/.cache/pawsometracker_tpu")
    )
    return os.path.join(root, "xla")


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at the package cache dir.

    No-op (returns None) when the user opted out, already configured a cache
    dir, or JAX predates the config knob. Safe to call repeatedly.
    """
    global cache_dir
    if cache_dir is not None:
        return cache_dir
    if os.environ.get("PAWS_TPU_NO_COMPILE_CACHE", "") not in ("", "0"):
        return None
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return None
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return None  # user configured one programmatically
        d = default_cache_dir()
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
    except Exception as e:
        # missing the cache means every process pays the full XLA recompile:
        # don't fail, but do say WHY (unwritable dir, old jax, ...)
        logging.getLogger(__name__).warning(
            "persistent XLA compilation cache disabled: %s", e
        )
        return None
    cache_dir = d
    return d
