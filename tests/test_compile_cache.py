"""Persistent compilation cache (util.compile_cache).

A cold CLI/serving start pays 20-40 s of XLA compilation per pipeline
shape; pointing STARDIS_COMPILE_CACHE (or --compile-cache) at a
directory persists the executables across processes.  These tests pin
the wiring: the env var populates the cache through the public
run_stardis surface, explicit paths win over the env var, and unset
means strictly no-op.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from stardis_tpu.util.compile_cache import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """Leave the global cache config as we found it."""
    old_dir = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_size)


def test_noop_without_env(monkeypatch):
    monkeypatch.delenv("STARDIS_COMPILE_CACHE", raising=False)
    before = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_path_beats_env(tmp_path, monkeypatch):
    monkeypatch.setenv("STARDIS_COMPILE_CACHE", str(tmp_path / "env"))
    explicit = tmp_path / "explicit"
    assert enable_compilation_cache(explicit) == str(explicit)
    assert explicit.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(explicit)

    # a later env-default call (the run_stardis/serving wiring) must NOT
    # re-point the explicitly configured cache back to the env var
    assert enable_compilation_cache() == str(explicit)
    assert jax.config.jax_compilation_cache_dir == str(explicit)


def test_cache_populated_and_hit(tmp_path, monkeypatch):
    """A jit compile lands an entry in the cache directory, and the same
    program in a 'new process' (cache re-pointed after clearing jax's
    in-memory caches) reuses it."""
    cache = tmp_path / "xla_cache"
    monkeypatch.setenv("STARDIS_COMPILE_CACHE", str(cache))
    assert enable_compilation_cache(min_compile_secs=0.0) == str(cache)

    import jax.numpy as jnp

    def program(x):
        return jnp.sin(x) @ jnp.cos(x).T

    jax.jit(program)(np.ones((41, 59))).block_until_ready()
    entries = list(cache.iterdir())
    assert entries, "compile should persist a cache entry"

    # second compile of the identical program must not add a second entry
    jax.clear_caches()
    jax.jit(program)(np.ones((41, 59))).block_until_ready()
    assert len(list(cache.iterdir())) == len(entries)
