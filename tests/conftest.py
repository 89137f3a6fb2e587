"""Test session setup: run everything on CPU with 8 fake devices.

This is the idiomatic stand-in for multi-chip testing without a TPU slice
(SURVEY §4 item 6): all Mesh/sharding tests execute real XLA collectives
across 8 host-platform devices. Must run before the first ``import jax``.
"""

import os
import sys

# One repo-root insert for every test module (they import scripts.* and
# nerfmlp_tpu.*); per-test inserts previously grew sys.path on every call.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


# ---- Fast lane (`pytest -m "not slow"`, <5 min) ------------------------- #
# Everything below ~9s measured wall-clock gets the fast lane; end-to-end
# CLI trainings, Trainer loops, and the heaviest multi-device suites are
# marked slow centrally here (pytest.ini declares the marker). The FULL
# suite remains the CI gate.

_SLOW_MODULES = {
    "test_cli",          # end-to-end CLI trainings
    "test_train_loop",   # Trainer end-to-end loops
    "test_multi_scene",  # 8-fake-device multi-scene suites
    "test_aabb",         # quality A/B trainings
}
_SLOW_TESTS = {
    "test_fp32_fusion_diagnostic_runs",  # 2x262k-pt MLP, ~20s
    "test_synthetic_llff_360_scene_learns",
    "test_occupancy_training_end_to_end",
    "test_occupancy_cli_flag",
    "test_occupancy_resume_rebuilds_grid",
    "test_render_with_occupancy_shapes",
    "test_train_step_with_pallas_converges",
    "test_full_render_with_pallas_matches_reference_path",
    "test_graft_entry_contract",
    "test_tensorboard_writes_events",
    "test_remat_matches_plain",
    "test_gradients_flow",
    "test_deterministic_when_no_perturb",
    "test_render_image_tiling_matches_direct",
    "test_separate_fine_net",
    "test_full_render_parity",
    "test_export_roundtrip_through_reference",
    "test_i_embed_identity",
    "test_train_cli_deepvoxels_smoke",
    # Trainer loops in test_device_pool (its unit tests stay fast).
    "test_trainer_device_pool_end_to_end",
    "test_trainer_device_pool_learns_like_host",
    "test_trainer_device_pool_resume_epoch",
    "test_device_pool_ignored_with_no_batching",
    # r4 pooled-scan equality A/Bs: each trains two 30-iter runs.
    "test_device_pool_scan_dispatch_matches_single_step",
    "test_device_pool_scan_occupancy_refresh_cadence",
    # r4 budget re-true (VERDICT item 7): heaviest remaining fast-lane
    # tests, measured with --durations on the full run.
    "test_golden_lego_fast_recipe_on_synthetic",  # 2 trainings + 4 renders
    "test_tensor_parallel_matches_single_device",
    "test_reuse_gradients_flow_through_merge",
    "test_sharded_matches_single_device",
    "test_cli_llff_ndc_and_background",
    "test_pool_step_matches_host_step",
    "test_pool_step_sharded_matches_local",
    "test_perturb_changes_output",
    "test_render_rays_routes_fp32_high_to_pallas",
    "test_output_keys_and_shapes",
    "test_total_loss_includes_coarse_term",
    # r4 worker health-probe tests: real 15s-retry / hang-wait sleeps.
    "test_wait_healthy_gives_up_on_erroring_backend",
    "test_wait_healthy_waits_out_a_hanging_probe",
    # r5: trains BOTH frameworks (torch CPU + ours), ~1.5 min single-core.
    "test_head_to_head_convergence_beats_reference",
    # r5: subprocess SIGKILL/resume property loop, ~3 min.
    "test_kill_and_resume_property",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES or item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
