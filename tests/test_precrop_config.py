"""Precrop / per-image sampling / --config file expansion."""

import os

import numpy as np

from nerfmlp_tpu.data.pipeline import RayBatchLoader


class _FakeDs:
    def __init__(self, n_images=3, H=10, W=10):
        n = n_images * H * W
        self.n_images, self.H, self.W = n_images, H, W
        # Encode the flat index into the ray origin so tests can decode it.
        idx = np.arange(n, dtype=np.float32)
        self.all_rays_o = np.stack([idx, idx, idx], -1)
        self.all_rays_d = np.ones((n, 3), np.float32)
        self.all_rgbs = np.zeros((n, 3), np.float32)


def test_precrop_restricts_to_center():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=64, seed=0)
    loader.set_precrop(0.5)
    for _ in range(5):
        b = loader.next_batch()
        flat = b[:, 0].astype(int)
        img = flat // 100
        row = (flat % 100) // 10
        col = flat % 10
        assert (img == img[0]).all()  # one image per batch under precrop
        # central 50% of a 10-wide image: dh = int(5 * 0.5) = 2 ->
        # rows/cols in [5-2, 5+2) = {3..6} exactly (run_nerf.py:776-792)
        assert row.min() >= 3 and row.max() <= 6
        assert col.min() >= 3 and col.max() <= 6


def test_image_mode_single_image_batches():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=32, seed=1, image_mode=True)
    imgs = set()
    for _ in range(10):
        b = loader.next_batch()
        img = set((b[:, 0].astype(int) // 100).tolist())
        assert len(img) == 1
        imgs |= img
    assert len(imgs) > 1  # different images across batches


def test_precrop_off_restores_global_sampling():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=64, seed=0)
    loader.set_precrop(0.5)
    loader.next_batch()
    loader.set_precrop(1.0)
    b = loader.next_batch()
    assert len(set((b[:, 0].astype(int) // 100).tolist())) > 1  # global again


def test_config_file_expansion(tmp_path):
    from scripts.train import parse_args

    cfg = tmp_path / "lego.cfg"
    cfg.write_text(
        "batch_size = 512\n"
        "iters = 777\n"
        "# a comment\n"
        "lindisp = true\n"
        "img_wh = 64 64\n"
        "coarse_loss = false\n"
    )
    args = parse_args(["--config", str(cfg), "--datadir", "/x", "--iters", "999"])
    assert args.batch_size == 512
    assert args.iters == 999          # explicit CLI flag wins
    assert args.lindisp is True
    assert args.coarse_loss is False  # 'false' values are dropped
    assert args.img_wh == [64, 64]


def test_config_file_falsy_disables_default_true_flags(tmp_path):
    """'use_pallas = False' in a --config file must actually disable
    pallas (default True): the expander emits the --no_pallas opt-out
    instead of silently dropping the line."""
    from scripts.train import parse_args

    cfg = tmp_path / "opt_out.cfg"
    cfg.write_text("use_pallas = False\nuse_viewdirs = 0\n")
    args = parse_args(["--config", str(cfg), "--datadir", "/x"])
    assert args.use_pallas is False
    assert args.use_viewdirs is False
    # Explicit CLI still wins over the config file.
    args2 = parse_args(["--config", str(cfg), "--datadir", "/x", "--use_viewdirs"])
    assert args2.use_viewdirs is True


def test_canonical_oracle_configs_parse(tmp_path):
    """The two canonical bmild/nerf config files (blender lego + llff
    fern), verbatim, must expand and parse — every key is an accepted
    flag or alias (the oracle's configargparse surface,
    example/run_nerf.py:461-572)."""
    from scripts.train import parse_args

    lego = tmp_path / "lego.txt"
    lego.write_text(
        "expname = blender_paper_lego\n"
        "basedir = ./logs\n"
        "datadir = ./data/nerf_synthetic/lego\n"
        "dataset_type = blender\n"
        "no_batching = True\n"
        "use_viewdirs = True\n"
        "white_bkgd = True\n"
        "lrate_decay = 500\n"
        "N_samples = 64\n"
        "N_importance = 128\n"
        "N_rand = 1024\n"
        "precrop_iters = 500\n"
        "precrop_frac = 0.5\n"
        "half_res = True\n"
    )
    a = parse_args(["--config", str(lego)])
    assert a.expname == "blender_paper_lego"
    assert a.batch_size == 1024 and a.no_batching and a.half_res
    assert a.lrate_decay == 500 and a.precrop_iters == 500

    fern = tmp_path / "fern.txt"
    fern.write_text(
        "expname = fern_test\n"
        "basedir = ./logs\n"
        "datadir = ./data/nerf_llff_data/fern\n"
        "dataset_type = llff\n"
        "factor = 8\n"
        "llffhold = 8\n"
        "N_rand = 1024\n"
        "N_samples = 64\n"
        "N_importance = 64\n"
        "use_viewdirs = True\n"
        "raw_noise_std = 1e0\n"
    )
    a = parse_args(["--config", str(fern)])
    assert a.dataset_type == "llff" and a.factor == 8
    assert a.raw_noise_std == 1.0 and a.batch_size == 1024


def test_oracle_flag_surface_complete(tmp_path):
    """Every flag the oracle's config_parser defines (run_nerf.py:461-572)
    is accepted by our train CLI — parsed programmatically from the
    reference source so new oracle flags can't silently go missing."""
    import re
    import pytest

    ref_path = "/root/reference/example/run_nerf.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not mounted")
    from scripts.train import build_parser

    oracle = set(re.findall(r'parser\.add_argument\("--([A-Za-z_]+)"',
                            open(ref_path).read()))
    ours = {o.lstrip("-") for a in build_parser()._actions
            for o in a.option_strings}
    assert oracle - ours == set(), sorted(oracle - ours)


def test_i_embed_identity(tmp_path):
    """--i_embed -1 selects identity embeddings for both branches
    (run_nerf_helpers.py:59-62 via run_nerf.py:381-387): a short train run
    must work with pos_enc_L = dir_enc_L = 0."""
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene
    from scripts.train import main

    scene = str(tmp_path / "sc")
    make_synthetic_scene(scene, n_train=3, n_val=1, n_test=1, img_wh=(24, 24))
    out = str(tmp_path / "out")
    main([
        "--datadir", scene, "--img_wh", "24", "24",
        "--batch_size", "64", "--iters", "8", "--save_dir", out,
        "--quick_val_interval", "8", "--full_val_interval", "0",
        "--quick_val_res", "24", "24", "--quick_val_subset", "1",
        "--N_samples", "4", "--N_importance", "0", "--i_embed", "-1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--i_print", "8",
    ])
    import json

    args_txt = open(os.path.join(out, "args.txt")).read()
    assert "pos_enc_L = 0" in args_txt and "dir_enc_L = 0" in args_txt
    assert os.path.exists(os.path.join(out, "metrics_latest.json"))


def test_config_value_flags_pass_literal_text(tmp_path):
    """Bool-literal text is presence/absence ONLY for boolean flags; a
    value-typed flag's text passes through verbatim (r3 review:
    `perturb = false` was silently dropped, training with perturb=1)."""
    import pytest

    from scripts.train import parse_args

    cfg = tmp_path / "v.cfg"
    cfg.write_text("perturb = 0\nraw_noise_std = 0\n")
    args = parse_args(["--config", str(cfg), "--datadir", "/x"])
    assert args.perturb == 0.0          # reached the float flag as a value
    assert args.raw_noise_std == 0.0

    # --config with no path exits with a clear message, not IndexError.
    with pytest.raises(SystemExit):
        parse_args(["--datadir", "/x", "--config"])


def test_multi_scene_name_dedup_no_collision():
    """Checkpoint-name dedup must not collide a rename with a literal
    pre-existing name (dirs a_0, a, a once produced two a_0 entries)."""
    from scripts.train_multi_scene import unique_scene_names

    assert unique_scene_names(["a_0", "a", "a"]) == ["a_0", "a_1", "a_2"]
    assert unique_scene_names(["lego", "lego"]) == ["lego_0", "lego_1"]
    assert unique_scene_names(["x", "y"]) == ["x", "y"]


def test_shipped_configs_parse():
    """Every config file shipped in configs/ must parse through the train
    CLI — they are user-facing recipes (the canonical bmild pair plus the
    r4 certified/turbo occupancy recipes, docs/RESULTS.md)."""
    import glob

    from scripts.train import parse_args

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "*.txt")))
    assert len(files) >= 4, f"expected shipped configs in {root}"
    for f in files:
        a = parse_args(["--config", f])
        assert a.datadir  # every recipe names its dataset
    fast = parse_args(
        ["--config", os.path.join(root, "lego_fast_fp32.txt")])
    assert fast.use_occupancy and fast.compute_dtype == "float32"
    assert fast.fp32_precision == "high" and len(fast.aabb) == 6
    turbo = parse_args(
        ["--config", os.path.join(root, "lego_turbo_bf16.txt")])
    # --occ_dense_samples is the turbo recipe's defining knob; it must
    # exist on the TRAINER (it was once inference-CLI-only).
    assert turbo.occ_dense_samples == 64 and turbo.use_occupancy
