"""Trainer end-to-end on the synthetic scene (CPU): learning, validation,
layered checkpoints, resume, metrics-JSON schema."""

import json
import os

import numpy as np
import jax

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.data.blender import BlenderDataset
from nerfmlp_tpu.train.checkpoint import (
    latest_checkpoint,
    load_params_any,
    save_params_npy,
)
from nerfmlp_tpu.train.loop import Trainer


def _mk_trainer(scene, save_dir, iters=60):
    ds = BlenderDataset(scene, "train", img_wh=(40, 40))
    val = BlenderDataset(scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far, perturb=True)
    tc = TrainConfig(
        batch_size=256, iters=iters, quick_val_interval=30,
        full_val_interval=0, quick_val_subset=1, log_interval=20,
        ckpt_interval=30,
    )
    return Trainer(rc, tc, ds, val, val, save_dir=save_dir, verbose=False)


def test_trainer_end_to_end(synthetic_scene, tmp_path):
    save_dir = str(tmp_path / "out")
    trainer = _mk_trainer(synthetic_scene, save_dir)
    metrics = trainer.train()

    # Learning: loss decreases over the run.
    assert metrics["train_losses"][-1] < 0.3
    assert metrics["final_val"]["psnr"] > 8.0
    assert len(metrics["quick_val_psnrs"]) == 2  # at steps 30 and 60

    # Layered checkpoints (reference naming contract).
    for name in ("model_final.ckpt", "metrics_latest.ckpt",
                 "metrics_latest.json", "model_30.ckpt", "model_60.ckpt",
                 "comprehensive_metrics.json"):
        assert os.path.exists(os.path.join(save_dir, name)), name

    # Metrics JSON schema keys (reference train.py:457-467).
    with open(os.path.join(save_dir, "metrics_latest.json")) as f:
        m = json.load(f)
    for key in ("step", "train_losses", "train_psnrs", "quick_val_losses",
                "quick_val_psnrs", "quick_val_ssims", "val_steps",
                "iteration_times", "best_val_psnr"):
        assert key in m, key


def test_resume_continues(synthetic_scene, tmp_path):
    save_dir = str(tmp_path / "out")
    t1 = _mk_trainer(synthetic_scene, save_dir, iters=30)
    t1.train()

    t2 = _mk_trainer(synthetic_scene, save_dir, iters=60)
    ok = t2.resume(os.path.join(save_dir, "metrics_latest.ckpt"))
    assert ok
    assert int(t2.history["step"]) == 30
    # Params actually restored (not fresh init).
    a = np.asarray(t1.state.params["coarse"]["pts_0"]["kernel"])
    b = np.asarray(t2.state.params["coarse"]["pts_0"]["kernel"])
    np.testing.assert_array_equal(a, b)
    t2.train()  # continues 30 -> 60
    assert int(t2.history["step"]) == 60


def test_resume_missing_file_warns_and_continues(synthetic_scene, tmp_path):
    t = _mk_trainer(synthetic_scene, str(tmp_path / "out2"), iters=30)
    assert t.resume(str(tmp_path / "nope.ckpt")) is False


def test_npy_roundtrip_and_latest_discovery(synthetic_scene, tmp_path):
    save_dir = str(tmp_path / "out3")
    t = _mk_trainer(synthetic_scene, save_dir, iters=30)
    t.train()
    # Export official-format .npy and reload it.
    npy_path = str(tmp_path / "weights.npy")
    save_params_npy(npy_path, t.state.params["coarse"])
    loaded = load_params_any(npy_path)  # -> {"coarse": ...}
    np.testing.assert_allclose(
        np.asarray(loaded["coarse"]["pts_0"]["kernel"]),
        np.asarray(t.state.params["coarse"]["pts_0"]["kernel"]),
        atol=1e-6,
    )
    assert latest_checkpoint(save_dir).endswith("metrics_latest.ckpt")
    assert latest_checkpoint(str(tmp_path / "missing")) is None
