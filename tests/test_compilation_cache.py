"""Persistent compilation cache: entries land on disk and are reused.

CPU caches the full executable (on directly-attached TPUs likewise; the
axon tunnel compiles terminal-side, so there it trims only client-side
lowering — utils/cache.py docstring).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from nerfmlp_tpu.utils.cache import (
    add_compilation_cache_flag, enable_compilation_cache,
    maybe_enable_from_args,
)


@pytest.fixture
def cache_off():
    """Restore the no-cache default afterwards (other tests must not
    accidentally share compiled programs through a deleted tmp dir)."""
    yield
    jax.config.update("jax_compilation_cache_dir", None)
    from jax.experimental.compilation_cache import compilation_cache

    compilation_cache.reset_cache()


def test_cache_writes_and_hits(tmp_path, cache_off):
    cache = enable_compilation_cache(str(tmp_path / "xla"),
                                     min_compile_secs=0.0)
    assert os.path.isdir(cache)

    def make():
        @jax.jit
        def f(x):
            return jnp.sin(x) @ jnp.cos(x)

        return f

    x = jnp.ones((64, 64), jnp.float32)
    make()(x).block_until_ready()
    entries = os.listdir(cache)
    assert entries, "no cache entry persisted"

    # A FRESH jit instance of the same program (what a new process
    # compiles) must HIT the cache, not add an entry.
    make()(x).block_until_ready()
    assert len(os.listdir(cache)) == len(entries)


def test_cli_flag_roundtrip(tmp_path, cache_off):
    import argparse

    p = argparse.ArgumentParser()
    add_compilation_cache_flag(p)
    args = p.parse_args([])
    maybe_enable_from_args(args)  # default None: no-op
    assert jax.config.jax_compilation_cache_dir is None

    args = p.parse_args(["--compilation_cache", str(tmp_path / "c")])
    maybe_enable_from_args(args)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
