"""Health-probe behavior of the persistent TPU job worker (tools/).

The worker is environment tooling, but its wait_healthy logic guards
every real-chip job this repo runs, and its failure modes were learned
the hard way (CLAUDE.md r4): a probe op can ERROR fast (poisoned/blipped
backend — retry then give up) or HANG indefinitely (hard tunnel outage —
wait it out, visibly). These tests pin both paths with a stubbed
jax.numpy so no backend is touched.
"""

import importlib.util
import sys
import time
import types

import numpy as np
import pytest


@pytest.fixture()
def worker_module(monkeypatch, tmp_path):
    """tools/tpu_worker.py loaded against a stubbed jax.numpy."""
    # Module top-level treats argv[1] as the queue dir (and mkdirs it).
    monkeypatch.setattr(sys, "argv", ["tpu_worker.py", str(tmp_path / "q")])
    jnp = types.ModuleType("jax.numpy")
    jnp.ones = np.ones
    jax = types.ModuleType("jax")
    jax.numpy = jnp
    monkeypatch.setitem(sys.modules, "jax", jax)
    monkeypatch.setitem(sys.modules, "jax.numpy", jnp)
    spec = importlib.util.spec_from_file_location(
        "_tpu_worker_under_test", "tools/tpu_worker.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, jnp


def test_wait_healthy_returns_fast_on_healthy_backend(worker_module):
    mod, _ = worker_module
    t0 = time.time()
    mod.wait_healthy()
    assert time.time() - t0 < 2.0


def test_wait_healthy_gives_up_on_erroring_backend(worker_module, capsys):
    """Fast-failing ops (the INVALID_ARGUMENT poisoning mode) are retried
    on a 15 s cadence and abandoned after max_wait_s so the job fails
    loudly instead of the queue wedging."""
    mod, jnp = worker_module
    calls = {"n": 0}

    def bad(shape):
        calls["n"] += 1
        raise RuntimeError("INVALID_ARGUMENT: TPU backend error")

    jnp.ones = bad
    t0 = time.time()
    mod.wait_healthy(max_wait_s=16)
    elapsed = time.time() - t0
    assert calls["n"] >= 2  # retried at least once
    assert elapsed < 60
    out = capsys.readouterr().out
    assert "unhealthy" in out and "still unhealthy" in out


def test_wait_healthy_waits_out_a_hanging_probe(worker_module):
    """A HANGING op (hard-outage mode, observed 90+ min on 2026-08-19)
    must not abort wait_healthy: the probe runs in a daemon thread and
    the worker returns as soon as the op completes on recovery."""
    mod, jnp = worker_module
    state = {"first": True}

    def hangs_once(shape):
        if state["first"]:
            state["first"] = False
            time.sleep(7)  # longer than the 5 s poll slice
        return np.ones(shape)

    jnp.ones = hangs_once
    t0 = time.time()
    mod.wait_healthy(max_wait_s=5)  # max_wait only bounds ERROR retries
    elapsed = time.time() - t0
    assert 6 < elapsed < 30
