"""Reference-documented CLI invocations must parse and behave here.

The reference README/README_plotting document exact commands; r3's
completeness audit found renamed flags and artifact names. These tests
pin the compatibility aliases (oracle commands drive this framework
verbatim) and the reference artifact naming."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def test_plot_tool_reference_flags(tmp_path):
    from scripts.plot_training_progress import main

    m = {"val_steps": [100, 200], "train_losses": [0.1, 0.05],
         "train_psnrs": [20.0, 23.0], "quick_val_losses": [0.2, 0.1],
         "quick_val_psnrs": [18.0, 21.0], "quick_val_ssims": [0.8, 0.9],
         "iteration_times": [0.01] * 10, "best_val_psnr": 21.0}
    mp = str(tmp_path / "metrics_latest.json")
    with open(mp, "w") as f:
        json.dump(m, f)
    # Reference flags: --metrics-file and --save-dir; the reference
    # artifact name training_progress.png must appear (README_plotting).
    main(["--metrics-file", mp, "--save-dir", str(tmp_path / "plots")])
    assert os.path.exists(str(tmp_path / "plots" / "training_progress.png"))


def test_view_progress_metrics_dir(tmp_path, capsys):
    from scripts.view_progress import main

    with open(tmp_path / "metrics_latest.json", "w") as f:
        json.dump({"step": 500, "best_val_psnr": 30.0,
                   "quick_val_psnrs": [30.0], "quick_val_losses": [0.001],
                   "quick_val_ssims": [0.95], "train_losses": [0.001],
                   "val_steps": [500], "iteration_times": [0.01]}, f)
    assert main(["--metrics-dir", str(tmp_path)]) == 0
    assert "500" in capsys.readouterr().out


def test_side_by_side_positional_and_panel_order(tmp_path):
    from scripts.side_by_side_compare import main

    red = np.zeros((8, 8, 3), np.uint8); red[..., 0] = 255
    green = np.zeros((8, 8, 3), np.uint8); green[..., 1] = 255
    rp = str(tmp_path / "rendered.png")
    gp = str(tmp_path / "gt.png")
    Image.fromarray(red).save(rp)
    Image.fromarray(green).save(gp)
    out = str(tmp_path / "side.png")
    # Reference positional interface: rendered.png output.png --gt_path
    main([rp, out, "--gt", gp])
    side = np.asarray(Image.open(out))
    assert side.shape == (8, 16, 3)
    # Reference panel convention: [ground truth | rendered].
    assert side[0, 0, 1] == 255   # left = GT (green)
    assert side[0, 8, 0] == 255   # right = rendered (red)


def test_step_from_latest_checkpoint_names():
    """model_{step}_latest.ckpt (the reference's per-1k layered weights,
    now written at quick-val cadence) resolves its step for resume."""
    from nerfmlp_tpu.train.checkpoint import step_from_filename

    assert step_from_filename("x/model_5000_latest.ckpt") == 5000
    assert step_from_filename("x/model_5000.ckpt") == 5000
    assert step_from_filename("x/model_best.ckpt") == 0


def test_latest_checkpoint_discovers_layered_weights(tmp_path):
    """Auto-resume discovery spans BOTH naming schemes — the newest step
    wins whether it was written as model_{step}.ckpt (i_weights) or
    model_{step}_latest.ckpt (quick-val layering) — and the step-less
    model_best/model_final names are never auto-resumed (they would
    silently renumber a finished run from step 0)."""
    from nerfmlp_tpu.train.checkpoint import latest_checkpoint

    for name in ("model_300.ckpt", "model_500_latest.ckpt",
                 "model_best.ckpt", "model_final.ckpt"):
        (tmp_path / name).write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)).endswith("model_500_latest.ckpt")

    # metrics_latest.ckpt (the full resumable TrainState) always wins.
    (tmp_path / "metrics_latest.ckpt").write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)).endswith("metrics_latest.ckpt")

    # Only step-less names present -> nothing to auto-resume.
    import os
    for name in ("model_300.ckpt", "model_500_latest.ckpt",
                 "metrics_latest.ckpt"):
        os.remove(tmp_path / name)
    assert latest_checkpoint(str(tmp_path)) is None


def test_render_example_reference_aliases(tmp_path):
    """--model_path/--gamma_correction/--out_prefix/--no_white_bkgd/
    --use_fine_weights parse (reference README.md:441-449 commands)."""
    import argparse

    from scripts import render_example

    # Parse-only: intercept before any rendering happens.
    captured = {}

    real_parse = argparse.ArgumentParser.parse_args

    def spy(self, argv=None):
        ns = real_parse(self, argv)
        captured.update(vars(ns))
        raise SystemExit(0)  # stop before device work

    argparse.ArgumentParser.parse_args = spy
    try:
        with pytest.raises(SystemExit):
            render_example.main([
                "--datadir", "/x", "--model_path", "w.npy",
                "--use_fine_weights", "--gamma_correction",
                "--no_white_bkgd", "--out_prefix", "lego",
            ])
    finally:
        argparse.ArgumentParser.parse_args = real_parse
    assert captured["ckpt"] == "w.npy"
    assert captured["apply_gamma"] is True
    assert captured["no_white_bkgd"] is True
    assert captured["out_prefix"] == "lego"
