"""CLI scripts driven through their argv entry points on a tiny scene."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def cli_scene(tmp_path_factory):
    from scripts.make_synthetic_scene import main as make_main

    d = str(tmp_path_factory.mktemp("cliscene"))
    make_main(["--outdir", d, "--img_wh", "32", "32",
               "--n_train", "4", "--n_val", "2", "--n_test", "2"])
    return d


@pytest.fixture(scope="module")
def trained(cli_scene, tmp_path_factory):
    from scripts.train import main as train_main

    out = str(tmp_path_factory.mktemp("cliout"))
    train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "256", "--iters", "60", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "30", "--full_val_interval", "0",
        "--quick_val_res", "32", "32", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
    ])
    return out


def test_train_cli_outputs(trained):
    assert os.path.exists(os.path.join(trained, "model_final.ckpt"))
    assert os.path.exists(os.path.join(trained, "metrics_latest.json"))
    assert os.path.exists(os.path.join(trained, "training_report.png"))


def _copy_run(trained, tmp_path, name):
    """Private copy of the trained fixture so resume tests can't mutate
    the shared module-scoped checkpoint (order independence)."""
    import shutil

    dst = str(tmp_path / name)
    shutil.copytree(trained, dst)
    return dst


def test_train_cli_resume(cli_scene, trained, tmp_path):
    from scripts.train import main as train_main

    run = _copy_run(trained, tmp_path, "resume")
    m = train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "256", "--iters", "90", "--save_dir", run,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "30", "--full_val_interval", "0",
        "--quick_val_res", "32", "32", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--resume", os.path.join(run, "metrics_latest.ckpt"),
    ])
    assert m["step"] == 90


def test_train_cli_auto_resume(cli_scene, trained, tmp_path, capsys):
    """Without --resume, the newest checkpoint in save_dir is discovered
    and resumed automatically (oracle run_nerf.py:439-456)."""
    from scripts.train import main as train_main

    run = _copy_run(trained, tmp_path, "auto")
    m = train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "256", "--iters", "120", "--save_dir", run,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "30", "--full_val_interval", "0",
        "--quick_val_res", "32", "32", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
    ])
    out = capsys.readouterr().out
    assert "Auto-discovered checkpoint" in out
    assert "resumed from" in out
    assert m["step"] == 120


def test_train_cli_no_resume_opt_out(cli_scene, trained, tmp_path, capsys):
    from scripts.train import main as train_main

    run = _copy_run(trained, tmp_path, "noresume")
    train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "256", "--iters", "30", "--save_dir", run,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "30", "--full_val_interval", "0",
        "--quick_val_res", "32", "32", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--no_resume",
    ])
    out = capsys.readouterr().out
    assert "Auto-discovered checkpoint" not in out


def test_config_file_bool_and_value_flags(tmp_path):
    """configargparse-style files spell booleans as 1/0 too; numeric
    values of value flags must stay values (ADVICE round 1)."""
    from scripts.train import parse_args

    cfg = tmp_path / "run.cfg"
    cfg.write_text(
        "no_batching = 1\nlindisp = 0\ntestskip = 2\nbatch_size = 512\n"
    )
    args = parse_args(["--config", str(cfg), "--datadir", "/x"])
    assert args.no_batching is True
    assert args.lindisp is False
    assert args.testskip == 2
    assert args.batch_size == 512


def test_train_cli_default_flags_smoke(cli_scene, tmp_path):
    """Drive the CLI with its SHIPPED defaults (bf16 + pallas kernel, which
    interprets on CPU) — catches default-path-only breakage that the
    fp32/no-pallas CLI tests cannot."""
    from scripts.train import main as train_main

    out = str(tmp_path / "defaults")
    m = train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "128", "--iters", "6", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "3", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--n_devices", "1",
    ])
    assert np.isfinite(m["train_losses"][-1])
    assert os.path.exists(os.path.join(out, "model_final.ckpt"))


def test_render_video_cli(cli_scene, trained, tmp_path):
    """Trajectory + test-set rendering with rgb/disp videos and per-frame
    PSNR (oracle render_path semantics, run_nerf.py:339-375)."""
    import glob

    from scripts.render_video import main as rv_main

    out = str(tmp_path / "vid")
    rv_main([
        "--datadir", cli_scene, "--ckpt",
        os.path.join(trained, "model_final.ckpt"),
        "--out_dir", out, "--size", "32", "--n_frames", "2",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
    ])
    assert glob.glob(os.path.join(out, "path_rgb.*"))
    assert glob.glob(os.path.join(out, "path_disp.*"))
    assert os.path.exists(os.path.join(out, "frames", "001.png"))

    out2 = str(tmp_path / "vidtest")
    rv_main([
        "--datadir", cli_scene, "--ckpt",
        os.path.join(trained, "model_final.ckpt"),
        "--out_dir", out2, "--size", "32", "--render_test",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
    ])
    with open(os.path.join(out2, "psnr.json")) as f:
        rep = json.load(f)
    assert len(rep["per_frame_psnr"]) == 2  # test split has 2 views
    assert np.isfinite(rep["mean_psnr"])


def test_render_video_cli_shard_render(cli_scene, trained, tmp_path):
    """--shard_render threads the 8-fake-device mesh through render_path;
    the sharded orbit frames match the local run's to 8-bit rounding."""
    import glob

    from PIL import Image

    from scripts.render_video import main as rv_main

    outs = {}
    for tag, extra in (("local", []), ("shard", ["--shard_render"])):
        out = str(tmp_path / tag)
        rv_main([
            "--datadir", cli_scene, "--ckpt",
            os.path.join(trained, "model_final.ckpt"),
            "--out_dir", out, "--size", "32", "--n_frames", "2",
            "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        ] + extra)
        assert glob.glob(os.path.join(out, "path_rgb.*"))
        outs[tag] = out
    for i in range(2):
        a = np.asarray(Image.open(
            os.path.join(outs["local"], "frames", f"{i:03d}.png")), np.int16)
        b = np.asarray(Image.open(
            os.path.join(outs["shard"], "frames", f"{i:03d}.png")), np.int16)
        assert np.abs(a - b).max() <= 1


def test_render_example_cli(cli_scene, trained, tmp_path):
    from scripts.render_example import main as render_main

    out = str(tmp_path / "renders")
    render_main([
        "--datadir", cli_scene, "--split", "val", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out_dir", out, "--num_views", "1", "--dynamic_bounds",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--tile", "256",
    ])
    from PIL import Image

    img = Image.open(os.path.join(out, "render_val_0.png"))
    assert img.size == (32, 32)


def test_compare_and_side_by_side_cli(cli_scene, trained, tmp_path):
    from scripts.compare_single_view import main as cmp_main
    from scripts.side_by_side_compare import main as sbs_main

    out = str(tmp_path / "cmp.png")
    cmp_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--view_idx", "0", "--out", out,
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
    ])
    from PIL import Image

    assert Image.open(out).size == (64, 32)  # gt | render (reference panel order)

    out2 = str(tmp_path / "sbs.png")
    sbs_main(["--rendered", out,
              "--datadir", cli_scene, "--index", "0", "--out", out2])
    assert os.path.exists(out2)


def test_view_progress_and_plot_cli(trained, capsys, tmp_path):
    from scripts.plot_training_progress import main as plot_main
    from scripts.view_progress import main as view_main

    rc = view_main(["--metrics", os.path.join(trained, "metrics_latest.json")])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "TRAINING STATUS" in cap and "best quick-val PSNR" in cap

    out = str(tmp_path / "plot.png")
    plot_main(["--metrics", os.path.join(trained, "metrics_latest.json"),
               "--out", out])
    assert os.path.exists(out)

    rc2 = view_main(["--metrics", str(tmp_path / "missing.json")])
    assert rc2 == 1


def test_train_only_cli(cli_scene, tmp_path):
    from scripts.train_only import main as to_main

    out = str(tmp_path / "to")
    losses, psnrs = to_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "128", "--iters", "200", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--compute_dtype", "float32", "--no_pallas",
    ])
    assert losses[-1] < losses[0]  # it learns
    assert os.path.exists(os.path.join(out, "model_final.ckpt"))
    assert os.path.exists(os.path.join(out, "final_metrics.json"))


def test_zoom_cli(cli_scene, trained, tmp_path, monkeypatch):
    import zoom_example

    out = str(tmp_path / "zoom")
    monkeypatch.setattr(
        zoom_example, "SCENARIOS", [("normal", (3.0, -3.0, 2.0), 1.0)]
    )
    zoom_example.main([
        "--datadir", cli_scene,
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out_dir", out, "--size", "32",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
    ])
    assert os.path.exists(os.path.join(out, "normal.png"))


def test_compare_and_zoom_cli_occupancy(cli_scene, trained, tmp_path,
                                        monkeypatch):
    """compare_single_view and zoom_example speak the occupancy render
    protocol (docs/RESULTS.md caveat: occ-trained checkpoints must render
    with their grid) via the shared inference flags (utils/cli.py)."""
    import zoom_example
    from scripts.compare_single_view import main as cmp_main

    occ = ["--use_occupancy", "--aabb", "-2", "-2", "-2", "2", "2", "2",
           "--occ_grid_size", "8", "--occ_dense_samples", "16"]
    out = str(tmp_path / "cmp_occ.png")
    cmp_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--view_idx", "0", "--out", out,
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", *occ,
    ])
    from PIL import Image

    assert Image.open(out).size == (64, 32)

    zdir = str(tmp_path / "zoom_occ")
    monkeypatch.setattr(
        zoom_example, "SCENARIOS", [("normal", (3.0, -3.0, 2.0), 1.0)]
    )
    zoom_example.main([
        "--datadir", cli_scene,
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out_dir", zdir, "--size", "32",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas", *occ,
    ])
    assert os.path.exists(os.path.join(zdir, "normal.png"))


def test_eval_cli(cli_scene, trained, tmp_path):
    from scripts.eval import main as eval_main

    report = eval_main([
        "--datadir", cli_scene, "--split", "test", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out", str(tmp_path / "eval.json"),
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", "--tile", "256",
    ])
    assert report["n_views"] == 2
    assert np.isfinite(report["mean_psnr"])
    assert len(report["per_view"]) == 2
    assert os.path.exists(str(tmp_path / "eval.json"))


def test_eval_cli_lpips_degrades_gracefully(cli_scene, trained, tmp_path):
    """--lpips without the optional `lpips` package (this image has none
    and no egress to fetch weights): the eval must complete and report
    mean_lpips as null, not crash."""
    from scripts.eval import main as eval_main

    report = eval_main([
        "--datadir", cli_scene, "--split", "test", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out", str(tmp_path / "eval_lpips.json"),
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", "--tile", "256", "--lpips",
    ])
    assert np.isfinite(report["mean_psnr"])
    try:
        import lpips  # noqa: F401

        assert report["mean_lpips"] is not None
    except ImportError:
        assert report["mean_lpips"] is None


def test_eval_cli_shard_render(cli_scene, trained, tmp_path):
    """--shard_render (utils/cli.py::render_frame): the same eval over the
    8-fake-device mesh reproduces the local renderer's per-view metrics
    (sharding is placement, not math)."""
    from scripts.eval import main as eval_main

    base_args = [
        "--datadir", cli_scene, "--split", "test", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", "--tile", "256",
    ]
    local = eval_main(base_args + ["--out", str(tmp_path / "local.json")])
    sharded = eval_main(base_args + ["--out", str(tmp_path / "shard.json"),
                                     "--shard_render"])
    assert sharded["n_views"] == local["n_views"] == 2
    for lv, sv in zip(local["per_view"], sharded["per_view"]):
        assert abs(lv["psnr"] - sv["psnr"]) < 0.05, (lv, sv)


def test_eval_cli_occupancy(cli_scene, trained, tmp_path):
    """eval.py shares the inference occupancy flags (utils/cli.py):
    grid rebuilt from the checkpoint, metrics stay finite."""
    from scripts.eval import main as eval_main

    report = eval_main([
        "--datadir", cli_scene, "--split", "test", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out", str(tmp_path / "eval_occ.json"),
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", "--tile", "256",
        "--use_occupancy", "--aabb", "-2", "-2", "-2", "2", "2", "2",
        "--occ_grid_size", "8", "--occ_dense_samples", "16",
    ])
    assert report["n_views"] == 2
    assert np.isfinite(report["mean_psnr"])


def test_custom_arch_train_and_render_only(cli_scene, tmp_path):
    """Oracle --netdepth/--netwidth(_fine) + --render_only/--render_test
    (run_nerf.py:467-474, 682-702): a non-canonical two-net architecture
    trains, checkpoints, auto-resumes, and renders without training."""
    import glob

    from scripts.train import main as train_main

    out = str(tmp_path / "arch")
    common = [
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "128", "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "20", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--netdepth", "3", "--netwidth", "32",
        "--netdepth_fine", "4", "--netwidth_fine", "48",
        "--separate_fine", "--save_dir", out,
    ]
    m = train_main(common + ["--iters", "20", "--i_print", "10",
                             "--chunk", "256", "--perturb", "0"])
    assert m["step"] == 20
    # The two nets really have distinct shapes in the checkpoint.
    from flax import serialization

    with open(os.path.join(out, "model_final.ckpt"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    assert raw["coarse"]["pts_0"]["kernel"].shape[1] == 32
    assert raw["fine"]["pts_0"]["kernel"].shape[1] == 48
    assert "pts_3" in raw["fine"] and "pts_3" not in raw["coarse"]

    # --render_only --render_test: test-split renders with per-frame PSNR.
    m = train_main(common + ["--iters", "20", "--render_only", "--render_test"])
    ro = m["render_only"]
    assert ro.endswith("renderonly_test_000020")
    assert os.path.exists(os.path.join(ro, "001.png"))

    # --render_only trajectory: frames + rgb/disp videos.
    m = train_main(common + ["--iters", "20", "--render_only",
                             "--video_frames", "2"])
    assert glob.glob(os.path.join(m["render_only"], "video_rgb.*"))
    assert glob.glob(os.path.join(m["render_only"], "video_disp.*"))


def test_render_example_occupancy(cli_scene, trained, tmp_path):
    """--use_occupancy rebuilds a density grid from the checkpoint and
    renders through the single-pass occupancy path (trainer parity:
    scripts/train.py --use_occupancy)."""
    from scripts.render_example import main as render_main

    out = str(tmp_path / "occ_renders")
    render_main([
        "--datadir", cli_scene, "--split", "val", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--out_dir", out, "--num_views", "1", "--dynamic_bounds",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--tile", "256",
        "--use_occupancy", "--aabb", "-2", "-2", "-2", "2", "2", "2",
        "--occ_grid_size", "8", "--occ_dense_samples", "16",
    ])
    from PIL import Image

    img = Image.open(os.path.join(out, "render_val_0.png"))
    assert img.size == (32, 32)


def test_render_example_shard_render(cli_scene, trained, tmp_path):
    """render_example --shard_render writes a PNG that matches the local
    renderer's output to 8-bit rounding."""
    from PIL import Image

    from scripts.render_example import main as render_main

    base = [
        "--datadir", cli_scene, "--split", "val", "--img_wh", "32", "32",
        "--ckpt", os.path.join(trained, "model_final.ckpt"),
        "--num_views", "1", "--dynamic_bounds",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--compute_dtype", "float32", "--tile", "256",
    ]
    render_main(base + ["--out_dir", str(tmp_path / "local")])
    render_main(base + ["--out_dir", str(tmp_path / "shard"),
                        "--shard_render"])
    a = np.asarray(Image.open(tmp_path / "local" / "render_val_0.png"), np.int16)
    b = np.asarray(Image.open(tmp_path / "shard" / "render_val_0.png"), np.int16)
    assert np.abs(a - b).max() <= 1


def test_render_example_occupancy_requires_aabb(cli_scene, trained, tmp_path):
    from scripts.render_example import main as render_main

    with pytest.raises(SystemExit):
        render_main([
            "--datadir", cli_scene, "--split", "val", "--img_wh", "32", "32",
            "--ckpt", os.path.join(trained, "model_final.ckpt"),
            "--use_occupancy", "--no_pallas",
        ])


def test_render_example_custom_arch(cli_scene, tmp_path):
    """render_example loads a custom-architecture separate-fine checkpoint
    via the shared --netdepth/--netwidth flags (utils/cli.py)."""
    from scripts.render_example import main as render_main
    from scripts.train import main as train_main

    out = str(tmp_path / "arch2")
    train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "128", "--iters", "10", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "10", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--netdepth", "2", "--netwidth", "32", "--netwidth_fine", "48",
        "--separate_fine",
    ])
    rdir = str(tmp_path / "arch2render")
    render_main([
        "--datadir", cli_scene, "--split", "val", "--img_wh", "32", "32",
        "--ckpt", os.path.join(out, "model_final.ckpt"),
        "--out_dir", rdir, "--num_views", "1", "--dynamic_bounds",
        "--N_samples", "8", "--N_importance", "8", "--no_pallas",
        "--netdepth", "2", "--netwidth", "32", "--netwidth_fine", "48",
        "--separate_fine", "--tile", "256",
    ])
    assert os.path.exists(os.path.join(rdir, "render_val_0.png"))


def test_oracle_flag_aliases_and_halfres(cli_scene, tmp_path, capsys):
    """Oracle flag spellings parse onto the same knobs: --lrate/--ft_path/
    --no_reload/--random_seed/--use_viewdirs/--lrate_decay; --half_res
    derives img_wh from the images' native size."""
    from scripts.train import main as train_main, parse_args

    a = parse_args([
        "--datadir", "/x", "--lrate", "1e-4", "--random_seed", "3",
        "--no_reload", "--use_viewdirs", "--ft_path", "/some.ckpt",
        "--lrate_decay", "500", "--expname", "exp1", "--basedir", "/logs",
        "--netchunk", "65536", "--white_bkgd",
    ])
    assert a.lr == 1e-4 and a.seed == 3 and a.no_resume is True
    assert a.use_viewdirs is True and a.resume == "/some.ckpt"
    assert a.lrate_decay == 500 and a.expname == "exp1"

    out = str(tmp_path / "halfres")
    train_main([
        "--datadir", cli_scene, "--half_res",
        "--batch_size", "64", "--iters", "4", "--save_dir", out,
        "--N_samples", "4", "--N_importance", "0",
        "--quick_val_interval", "4", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
    ])
    assert "--half_res: training at 16x16" in capsys.readouterr().out


def test_train_cli_tensor_parallel(cli_scene, tmp_path):
    """--tensor_parallel 2 trains on a (data=4, model=2) mesh end-to-end
    through the Trainer (TP state shardings, checkpoint save, quick val),
    including a resume that re-applies the TP layout."""
    from scripts.train import main as train_main

    out = str(tmp_path / "tp_out")
    argv = [
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "256", "--iters", "40", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "20", "--full_val_interval", "0",
        "--quick_val_res", "32", "32", "--quick_val_subset", "1",
        "--compute_dtype", "float32",
        "--tensor_parallel", "2",
    ]  # note: NO --no_pallas — covers the TP auto-disable of the kernel
    train_main(argv)
    assert os.path.exists(os.path.join(out, "model_final.ckpt"))
    import json

    h = json.load(open(os.path.join(out, "metrics_latest.json")))
    assert h["quick_val_psnrs"] and h["quick_val_psnrs"][-1] > 5.0
    # Auto-resume continues under the same TP layout.
    argv2 = list(argv)
    argv2[argv2.index("--iters") + 1] = "60"
    m2 = train_main(argv2)
    assert m2["step"] == 60
    h2 = json.load(open(os.path.join(out, "metrics_latest.json")))
    assert h2["step"] == 60  # snapshot written AT the quick-val step


def test_make_timelapse_cli(tmp_path):
    """scripts/make_timelapse.py compiles val_{step}.png dumps into a
    video (the reference's planned training-evolution time-lapse)."""
    from nerfmlp_tpu.utils.image import save_png
    from scripts.make_timelapse import main

    run = tmp_path / "run"
    run.mkdir()
    rng = np.random.default_rng(0)
    for step in (1000, 2000, 10000):
        save_png(str(run / f"val_{step:06d}.png"),
                 rng.uniform(size=(16, 16, 3)).astype(np.float32))
    out = main(["--run_dir", str(run), "--fps", "5"])
    assert out is not None and os.path.exists(out)
    # Empty dir -> graceful no-op.
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main(["--run_dir", str(empty)]) is None


def test_train_cli_fp32_high_pallas(cli_scene, tmp_path):
    """The fp32-grade kernel path at the CLI (--compute_dtype float32
    --fp32_precision high with pallas on): the renderer routes it through
    the bf16x3 fused kernel (interpreted on CPU) instead of falling back."""
    from scripts.train import main as train_main

    out = str(tmp_path / "hi")
    m = train_main([
        "--datadir", cli_scene, "--img_wh", "32", "32",
        "--batch_size", "128", "--iters", "6", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "3", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--fp32_precision", "high",
        "--n_devices", "1",
    ])
    assert np.isfinite(m["train_losses"][-1])
    assert os.path.exists(os.path.join(out, "model_final.ckpt"))


def test_tile_default_is_sampling_mode_aware():
    """--tile left unset resolves to the measured per-mode optimum
    (docs/RESULTS.md r4 tile A/B): 4096 dense, 16384 with occupancy;
    an explicit value always wins."""
    import argparse

    from nerfmlp_tpu.utils.cli import (
        add_occupancy_flags, add_tile_flag, resolve_tile,
    )

    p = argparse.ArgumentParser()
    add_occupancy_flags(p)
    add_tile_flag(p)
    assert resolve_tile(p.parse_args([])) == 4096
    assert resolve_tile(p.parse_args(["--use_occupancy"])) == 16384
    assert resolve_tile(p.parse_args(
        ["--use_occupancy", "--tile", "256"])) == 256
    assert resolve_tile(p.parse_args(["--chunk", "512"])) == 512
