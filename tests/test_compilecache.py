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
