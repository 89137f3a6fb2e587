"""The official two-net + coarse-loss training scheme end-to-end
(example/run_nerf.py:397-403, 820-824), plus render_video CLI coverage."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__))))


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.normal(size=(n, 9)).astype(np.float32)
    b[:, 5] = -1.0
    b[:, 6:9] = np.abs(b[:, 6:9]) % 1.0
    return jnp.asarray(b)


def test_separate_fine_with_coarse_loss_trains():
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=True, separate_fine=True)
    tc = TrainConfig(batch_size=128, coarse_loss=True)
    state = create_train_state(rc, tc)
    assert "fine" in state.params  # two networks exist
    step = make_train_step(rc, tc)
    b = _batch(128)
    losses = []
    for _ in range(25):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # Both nets received gradient updates.
    init = create_train_state(rc, tc)
    for name in ("coarse", "fine"):
        before = np.asarray(init.params[name]["pts_0"]["kernel"])
        after = np.asarray(state.params[name]["pts_0"]["kernel"])
        assert np.abs(after - before).max() > 1e-5, name


def test_total_loss_includes_coarse_term():
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True)
    state = create_train_state(rc, TrainConfig(batch_size=64))
    b = _batch(64, seed=2)
    _, m_fine_only = make_train_step(rc, TrainConfig(batch_size=64))(state, b)
    state2 = create_train_state(rc, TrainConfig(batch_size=64, coarse_loss=True))
    _, m_both = make_train_step(rc, TrainConfig(batch_size=64, coarse_loss=True))(state2, b)
    assert float(m_both["total_loss"]) > float(m_both["loss"])  # coarse term added
    assert abs(float(m_fine_only["total_loss"]) - float(m_fine_only["loss"])) < 1e-9


def test_pallas_flag_with_no_viewdirs_falls_back():
    """use_pallas + use_viewdirs=False renders finite maps (late-r4 this
    routes through the fused kernel's single-output-head variant; before
    that it silently used the XLA path — either way the flag must not
    break the no-viewdirs architecture)."""
    rc = RenderConfig(N_samples=8, N_importance=0, perturb=False,
                      use_viewdirs=False, use_pallas=True,
                      compute_dtype="bfloat16")
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.render import render_rays

    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    o = jnp.zeros((4, 3)).at[:, 2].set(4.0)
    d = jnp.ones((4, 3)) * jnp.array([0.0, 0.0, -1.0])
    out = render_rays(params, o, d, None, rc)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_render_video_cli(synthetic_scene, tmp_path):
    from nerfmlp_tpu.train.checkpoint import save_checkpoint
    from nerfmlp_tpu.models.mlp import init_model
    from scripts.render_video import main as video_main

    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"coarse": init_model(jax.random.PRNGKey(0))})
    out = str(tmp_path / "video")
    video_main([
        "--datadir", synthetic_scene, "--ckpt", ckpt, "--out_dir", out,
        "--size", "24", "--n_frames", "3", "--N_samples", "8",
        "--N_importance", "0", "--no_pallas", "--render_factor", "1",
    ])
    frames = os.listdir(os.path.join(out, "frames"))
    assert len(frames) == 3
    import glob

    assert glob.glob(os.path.join(out, "path_rgb.*"))
    assert glob.glob(os.path.join(out, "path_disp.*"))
