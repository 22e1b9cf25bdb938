"""Persistent XLA compilation cache wiring (utils/compilecache.py).

The cache itself is JAX machinery; these tests pin OUR wiring: the package
enables it on import, respects user opt-out and pre-existing configuration,
and points it at the shared PAWSOMETRACKER_CACHE root.
"""

import os

import jax

import pawsometracker_tpu  # noqa: F401  (import triggers enable)
from pawsometracker_tpu.utils import compilecache


def test_enabled_on_package_import():
    # the suite's import of the package flipped the config (unless a user
    # env already configured a cache — not the case in CI)
    assert compilecache.cache_dir is not None
    assert jax.config.jax_compilation_cache_dir == compilecache.cache_dir
    assert os.path.isdir(compilecache.cache_dir)


def test_default_dir_under_shared_cache_root(monkeypatch):
    monkeypatch.setenv("PAWSOMETRACKER_CACHE", "/tmp/pawscache_test_root")
    assert compilecache.default_cache_dir() == "/tmp/pawscache_test_root/xla"
    monkeypatch.delenv("PAWSOMETRACKER_CACHE")
    assert compilecache.default_cache_dir().endswith(
        ".cache/pawsometracker_tpu/xla"
    )


def test_opt_out_env(monkeypatch):
    monkeypatch.setattr(compilecache, "cache_dir", None)
    monkeypatch.setenv("PAWS_TPU_NO_COMPILE_CACHE", "1")
    assert compilecache.enable_persistent_cache() is None
    assert compilecache.cache_dir is None


def test_user_env_config_respected(monkeypatch):
    monkeypatch.setattr(compilecache, "cache_dir", None)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/users_own")
    assert compilecache.enable_persistent_cache() is None


def test_idempotent():
    d1 = compilecache.enable_persistent_cache()
    d2 = compilecache.enable_persistent_cache()
    assert d1 == d2 == compilecache.cache_dir


def test_programmatic_jax_config_respected(monkeypatch):
    """A cache dir the user set via jax.config (not env) must be left alone."""
    import jax

    from pawsometracker_tpu.utils import compilecache as cc

    monkeypatch.setattr(cc, "cache_dir", None)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("PAWS_TPU_NO_COMPILE_CACHE", raising=False)
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/user-owned-cache")
        assert cc.enable_persistent_cache() is None
        assert getattr(jax.config, "jax_compilation_cache_dir") == "/tmp/user-owned-cache"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_unwritable_dir_degrades_with_warning(monkeypatch, caplog):
    """An unwritable cache root must not fail import-time setup — it logs WHY
    and returns None (every process then just pays the XLA recompile)."""
    import logging

    from pawsometracker_tpu.utils import compilecache as cc

    monkeypatch.setattr(cc, "cache_dir", None)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("PAWS_TPU_NO_COMPILE_CACHE", raising=False)

    def boom(*a, **k):
        raise PermissionError("read-only filesystem")

    monkeypatch.setattr(cc.os, "makedirs", boom)
    # clear the package-import-time jax.config setting so the call reaches
    # the makedirs attempt instead of the already-configured early return
    import jax

    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        with caplog.at_level(logging.WARNING,
                             logger="pawsometracker_tpu.utils.compilecache"):
            assert cc.enable_persistent_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    assert any("persistent XLA compilation cache disabled" in r.getMessage()
               for r in caplog.records)
