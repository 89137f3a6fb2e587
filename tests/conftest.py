"""Test session setup: run everything on CPU with 8 fake devices.

This is the idiomatic stand-in for multi-chip testing without a TPU slice
(SURVEY §4 item 6): all Mesh/sharding tests execute real XLA collectives
across 8 host-platform devices. Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-selects "axon,cpu" via
# jax.config at import time, overriding JAX_PLATFORMS — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_scene(tmp_path_factory):
    """A small procedural Blender-format scene shared across tests."""
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene

    outdir = tmp_path_factory.mktemp("scene")
    make_synthetic_scene(
        str(outdir), n_train=6, n_val=2, n_test=2, img_wh=(40, 40)
    )
    return str(outdir)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(0)
