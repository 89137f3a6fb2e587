"""Persistent XLA compilation cache — faster cold starts across processes.

The reference has no compilation step at all (eager torch); on TPU every
new process re-traces and re-compiles each program shape (tens of
seconds per shape). JAX's persistent compilation cache serializes
compiled executables to disk keyed by (HLO, compile options, backend),
so a render server, eval CLI, or resumed training run that compiles the
same shapes again starts in seconds instead.

Scope notes for THIS environment: the axon tunnel compiles terminal-side,
so the local cache only removes the client-side tracing/lowering share;
on directly-attached TPU hardware it removes the whole compile. CPU test
runs cache fully.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's on-disk compilation cache at ``cache_dir``.

    Call any time before the compiles you want cached (jax.config
    updates apply to subsequent compiles). Programs that took less than
    ``min_compile_secs`` to compile are not persisted (not worth the
    disk round-trip).

    Returns the absolute cache directory (created if missing).
    """
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    try:
        # The cache object is created lazily at the first compile and
        # latches the dir it saw then — a process that already compiled
        # something (a warm library import, a test session) would
        # silently keep caching disabled without this reset.
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    except (ImportError, AttributeError):  # future jax: lazy re-read
        pass
    return cache_dir


def add_compilation_cache_flag(parser) -> None:
    """``--compilation_cache DIR`` on a CLI parser (shared help text)."""
    parser.add_argument(
        "--compilation_cache", type=str, default=None, metavar="DIR",
        help="persist compiled XLA programs to DIR so later processes "
             "skip recompiling the same shapes (cold-start fix)")


def maybe_enable_from_args(args) -> None:
    if getattr(args, "compilation_cache", None):
        path = enable_compilation_cache(args.compilation_cache)
        print(f"compilation cache: {path}")
