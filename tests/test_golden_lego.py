"""North-star golden-image test: Lego test-view PSNR parity within 0.1 dB
between our framework and the torch reference, from the official
``model_fine_200000.npy`` weights at 800x800.

No Lego data or official weights ship in this environment, so this is a
skip-if-absent harness (VERDICT r1 item 4): it fires automatically the
moment ``nerf_synthetic/lego`` + the weight file are mounted (see the
search paths in scripts/golden_lego.py, overridable via the
NERF_SYNTHETIC_LEGO / LEGO_FINE_WEIGHTS env vars)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.golden_lego import find_inputs  # noqa: E402

_datadir, _weights = find_inputs()


@pytest.mark.slow
@pytest.mark.skipif(
    _datadir is None or _weights is None
    or not os.path.isdir("/root/reference/nerfmlp"),
    reason="nerf_synthetic/lego dataset, official fine weights, or the "
           "torch reference not mounted (all three are required for the "
           "delta-dB comparison)",
)
def test_golden_lego_psnr_parity(tmp_path):
    from scripts.golden_lego import main

    report = main([
        "--out", str(tmp_path / "golden.json"),
        # Full 800x800 through torch-CPU takes many minutes PER VIEW; the
        # pytest gate samples 2 views so the suite stays bounded when the
        # assets mount — the full all-views sweep is the standalone
        # harness's job (scripts/golden_lego.py, no cap by default).
        "--img_wh", "800", "800", "--max_views", "2",
    ])
    assert report["status"] == "ok"
    assert "max_delta_db" in report, "torch reference unavailable for comparison"
    assert report["within_tolerance"], (
        f"per-view PSNR gap up to {report['max_delta_db']} dB exceeds 0.1 dB "
        f"(ours {report['mean_psnr_ours_vs_gt']}, "
        f"reference {report['mean_psnr_reference_vs_gt']}; "
        f"per-view: {report['per_view']})"
    )


def test_golden_lego_fast_recipe_on_synthetic(tmp_path, monkeypatch):
    """--fast_recipe renders every view a second time through the
    occupancy + fp32-high path and reports its deltas; exercised here on a
    tiny synthetic stand-in for Lego (same transforms_test.json layout)
    with fabricated official-format weights, so the harness logic is
    CPU-testable before the real assets mount."""
    import json

    import numpy as np

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.train.checkpoint import save_params_npy
    from scripts import golden_lego

    import jax

    scene = tmp_path / "scene"
    make_synthetic_scene(str(scene), n_train=2, n_val=1, n_test=2,
                         img_wh=(40, 40))
    # Official-weights format: the npy object array golden_lego loads via
    # load_params_any (N_importance=64 semantics -> single shared net).
    cfg = RenderConfig(N_samples=8, N_importance=64, near=2.0, far=6.0)
    params = init_model(jax.random.PRNGKey(0), cfg.model_config())
    wpath = tmp_path / "model_fine.npy"
    save_params_npy(str(wpath), params)

    report = golden_lego.main([
        "--datadir", str(scene), "--weights", str(wpath),
        "--img_wh", "40", "40", "--skip_reference", "--fast_recipe",
        "--fast_samples", "8", "16",
        "--out", str(tmp_path / "g.json"),
    ])
    assert report["status"] == "ok"
    assert report["fast_recipe"]["N_samples"] == 8
    for row in report["per_view"]:
        assert np.isfinite(row["psnr_fast_vs_gt"])
        assert np.isfinite(row["psnr_fast_vs_golden"])
    assert "mean_fast_delta_db" in report
    on_disk = json.loads((tmp_path / "g.json").read_text())
    assert on_disk["mean_psnr_fast_vs_gt"] == report["mean_psnr_fast_vs_gt"]
    assert (tmp_path / "g_fast.png").exists()


def test_golden_lego_skips_cleanly_without_data(tmp_path, monkeypatch):
    """The harness itself must not crash when inputs are missing."""
    from scripts import golden_lego

    monkeypatch.setattr(golden_lego, "DATA_CANDIDATES", ["/nonexistent"])
    monkeypatch.setattr(golden_lego, "WEIGHT_CANDIDATES", ["/nonexistent"])
    report = golden_lego.main(["--out", str(tmp_path / "g.json")])
    assert report["status"] == "skipped"
