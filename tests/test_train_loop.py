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


def test_in_training_render_events(synthetic_scene, tmp_path):
    """i_video/i_testset events (oracle run_nerf.py:845-872): a spiral
    rgb+disp video and a per-frame-PSNR test-set sweep mid-training."""
    import glob

    from nerfmlp_tpu.config import RenderConfig, TrainConfig

    save_dir = str(tmp_path / "ev")
    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    test = BlenderDataset(synthetic_scene, "test", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                      perturb=True, aabb=(-1.5,) * 3 + (1.5,) * 3)
    tc = TrainConfig(
        batch_size=256, iters=60, quick_val_interval=30,
        full_val_interval=0, quick_val_subset=1, log_interval=20,
        ckpt_interval=30, i_video=30, i_testset=30, i_img=30,
        render_factor=2, i_mesh=30, mesh_resolution=10, mesh_threshold=5.0,
    )
    t = Trainer(
        rc, tc, ds, val, val, save_dir=save_dir, verbose=False,
        render_poses=ds.render_poses(n_frames=2), test_ds=test,
    )
    t.train()

    # Spiral video: rgb + disp files at step 30 (60 == iters is skipped).
    vids = glob.glob(os.path.join(save_dir, "*_spiral_000030_rgb.*"))
    assert vids, os.listdir(save_dir)
    assert glob.glob(os.path.join(save_dir, "*_spiral_000030_disp.*"))
    assert not glob.glob(os.path.join(save_dir, "*_spiral_000060_*"))

    # Test-set sweep: per-view frames + mean PSNR history. render_factor=2
    # exercises the strided-GT path: frames are 20x20 previews yet PSNR is
    # still recorded (unlike the oracle, which skips PSNR when downscaled).
    tdir = os.path.join(save_dir, "testset_000030")
    assert os.path.exists(os.path.join(tdir, "000.png"))
    assert os.path.exists(os.path.join(tdir, "001.png"))
    from PIL import Image

    assert Image.open(os.path.join(tdir, "000.png")).size == (20, 20)
    assert t.history["testset_steps"] == [30]

    # Geometry snapshot (framework superset --i_mesh): a structurally
    # valid .ply at step 30 only (possibly empty this early in training).
    meshes = glob.glob(os.path.join(save_dir, "*_mesh_000030.ply"))
    assert meshes, os.listdir(save_dir)
    assert not glob.glob(os.path.join(save_dir, "*_mesh_000060.ply"))
    with open(meshes[0], "rb") as f:
        head = f.read(200)
    assert head.startswith(b"ply\n") and b"element vertex" in head
    assert np.isfinite(t.history["testset_psnrs"][0])

    # i_img holdout dumps: mid-training frame AND the final-model frame
    # (the time-lapse must end on the converged model, VIDEOS.md:24-31).
    assert os.path.exists(os.path.join(save_dir, "val_000030.png"))
    assert os.path.exists(os.path.join(save_dir, "val_000060.png"))


def test_iteration_times_ring_buffer(synthetic_scene, tmp_path, monkeypatch):
    monkeypatch.setattr(Trainer, "_ITER_TIMES_CAP", 40)
    t = _mk_trainer(synthetic_scene, str(tmp_path / "rb"), iters=60)
    t.train()
    h = t.history
    # 60 steps with a cap of 40: one fold of 20 at step 41.
    assert len(h["iteration_times"]) == 40
    assert h["iteration_times_dropped"] == 20
    assert h["iteration_times_dropped_sum"] > 0.0


def test_metrics_step_snapshots_written_and_pruned(synthetic_scene, tmp_path):
    save_dir = str(tmp_path / "snap")
    t = _mk_trainer(synthetic_scene, save_dir, iters=60)
    t.train()
    # Per-step snapshots at each quick-val (reference train.py:480-495).
    assert os.path.exists(os.path.join(save_dir, "metrics_30_latest.json"))
    assert os.path.exists(os.path.join(save_dir, "metrics_60_latest.json"))
    # Pruning keeps only the newest N.
    for s in range(100, 800, 100):
        with open(os.path.join(save_dir, f"metrics_{s}_latest.json"), "w") as f:
            f.write("{}")
    t._prune_step_snapshots(keep=5)
    import glob

    left = sorted(
        int(os.path.basename(p).split("_")[1])
        for p in glob.glob(os.path.join(save_dir, "metrics_*_latest.json"))
    )
    # 30, 60, 100..700 = 9 snapshots -> the 5 newest survive.
    assert left == [300, 400, 500, 600, 700]


def test_params_only_resume(synthetic_scene, tmp_path):
    """Auto-discovery can land on a params-only model_{step}.ckpt; resume
    restores weights, takes the step from the filename, resets Adam."""
    from nerfmlp_tpu.train.checkpoint import step_from_filename

    save_dir = str(tmp_path / "po")
    t1 = _mk_trainer(synthetic_scene, save_dir, iters=30)
    t1.train()
    path = os.path.join(save_dir, "model_30.ckpt")
    assert step_from_filename(path) == 30
    assert step_from_filename("whatever/metrics_latest.ckpt") == 0

    t2 = _mk_trainer(synthetic_scene, save_dir, iters=60)
    assert t2.resume(path)
    assert int(t2.state.step) == 30
    # The fresh optimizer's LR schedule must be fast-forwarded to the
    # resumed step (not restart at the initial LR); Adam's own count stays
    # 0 for fresh-moment bias correction.
    flat = jax.tree.leaves(
        t2.state.opt_state,
        is_leaf=lambda s: type(s).__name__ in
        ("ScaleByScheduleState", "ScaleByAdamState"),
    )
    scheds = [s for s in flat if type(s).__name__ == "ScaleByScheduleState"]
    adams = [s for s in flat if type(s).__name__ == "ScaleByAdamState"]
    assert scheds and all(int(s.count) == 30 for s in scheds)
    assert adams and all(int(a.count) == 0 for a in adams)
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["coarse"]["pts_0"]["kernel"]),
        np.asarray(t2.state.params["coarse"]["pts_0"]["kernel"]),
    )
    t2.train()
    assert int(t2.history["step"]) == 60


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


def test_resume_corrupt_checkpoint_starts_fresh(synthetic_scene, tmp_path):
    """A truncated/corrupt checkpoint must warn + start fresh, not raise
    (crash-mid-write recovery; saves are atomic now but old files exist)."""
    save_dir = str(tmp_path / "cc")
    t = _mk_trainer(synthetic_scene, save_dir, iters=30)
    bad = os.path.join(save_dir, "metrics_latest.ckpt")
    os.makedirs(save_dir, exist_ok=True)
    with open(bad, "wb") as f:
        f.write(b"\x93truncated-not-msgpack")
    assert t.resume(bad) is False
    assert int(t.history["step"]) == 0  # fresh


def test_validate_empty_subset_returns_none(synthetic_scene, tmp_path):
    """quick_val_subset=0 / empty split: validation returns None instead
    of NaN metrics that would poison best-checkpoint selection."""
    t = _mk_trainer(synthetic_scene, str(tmp_path / "ev0"), iters=30)
    assert t._validate(t.quick_val_ds, n_images=0) is None
    assert t._last_val_render is None


def test_empty_full_val_still_checkpoints(synthetic_scene, tmp_path):
    """When full_validate() returns None (empty val split) at a step that
    is also a ckpt_interval multiple, the periodic model_{step}.ckpt must
    still land (regression: a `continue` used to skip it)."""
    save_dir = str(tmp_path / "efv")
    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far)
    tc = TrainConfig(
        batch_size=256, iters=60, quick_val_interval=60,
        full_val_interval=30, quick_val_subset=1, log_interval=60,
        ckpt_interval=30,
    )
    t = Trainer(rc, tc, ds, val, val, save_dir=save_dir, verbose=False)
    t.full_validate = lambda: None  # empty-split behavior, every call
    t.train()
    assert os.path.exists(os.path.join(save_dir, "model_30.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "model_60.ckpt"))
    assert t.history["full_val_psnrs"] == []


def test_resume_architecture_mismatch_raises(synthetic_scene, tmp_path):
    """Wrong --netdepth/--netwidth against an existing run must raise, not
    silently start fresh and overwrite the run's checkpoints (only
    corrupt/truncated files get the warn-and-fresh treatment)."""
    import pytest

    save_dir = str(tmp_path / "mm")
    t1 = _mk_trainer(synthetic_scene, save_dir, iters=30)
    t1.train()

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    # Different depth: checkpoint has pts_0..7, template expects pts_0..3.
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far, depth=4)
    tc = TrainConfig(batch_size=256, iters=60, quick_val_interval=30,
                     full_val_interval=0, quick_val_subset=1,
                     log_interval=20, ckpt_interval=30)
    t2 = Trainer(rc, tc, ds, val, val, save_dir=save_dir, verbose=False)
    with pytest.raises((ValueError, KeyError)):
        t2.resume(os.path.join(save_dir, "metrics_latest.ckpt"))

    # Different width: keys match, shapes differ — must ALSO raise.
    rc3 = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                       width=128)
    t3 = Trainer(rc3, tc, ds, val, val, save_dir=save_dir, verbose=False)
    with pytest.raises(ValueError, match="shape"):
        t3.resume(os.path.join(save_dir, "metrics_latest.ckpt"))


def test_netdepth5_warns():
    """--netdepth 5 diverges from the TF oracle (its trailing skip concat
    is inexpressible here) — must warn loudly, not just document."""
    import warnings

    from nerfmlp_tpu.config import RenderConfig

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        RenderConfig(depth=5).model_config()
    assert any("netdepth=5" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        RenderConfig(depth=8).model_config()
    assert not w


def test_empty_quick_val_ds_not_replaced(synthetic_scene, tmp_path):
    """A provided-but-empty quick-val dataset must NOT be silently swapped
    for the full-res val_ds (truthiness on __len__==0 did that, r3
    review) — quick-val should skip instead of full-res rendering every
    interval."""

    class _EmptyDs:
        n_images = 0
        H = W = 8

        def __len__(self):
            return 0

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far)
    tc = TrainConfig(batch_size=256, iters=10)
    empty = _EmptyDs()
    t = Trainer(rc, tc, ds, val, empty, save_dir=str(tmp_path / "eq"),
                verbose=False)
    assert t.quick_val_ds is empty
    assert t.quick_validate() is None  # skips, no full-res fallback
    # Omitting the argument still falls back to val_ds.
    t2 = Trainer(rc, tc, ds, val, save_dir=str(tmp_path / "eq2"),
                 verbose=False)
    assert t2.quick_val_ds is val


# ---- K-step scan dispatch (tc.steps_per_dispatch) ----------------------- #


def test_dispatch_window_math():
    from nerfmlp_tpu.train.loop import dispatch_window

    # Plain: no boundary inside -> full K.
    assert dispatch_window(1, 1000, 10, [100]) == 10
    # Window must END at the interval multiple.
    assert dispatch_window(95, 1000, 10, [100]) == 6
    assert dispatch_window(100, 1000, 10, [100]) == 1  # event AT the start
    # Tightest of several intervals wins.
    assert dispatch_window(13, 1000, 10, [100, 16]) == 4  # ends at 16
    # Run end bounds the window.
    assert dispatch_window(998, 1000, 10, [7000]) == 3
    # One-off stop (precrop transition): end exactly at it.
    assert dispatch_window(4, 1000, 10, [1000], stop_steps=(7,)) == 4
    assert dispatch_window(8, 1000, 10, [1000], stop_steps=(7,)) == 10
    # Zero/None entries ignored; floor at 1.
    assert dispatch_window(50, 50, 10, [0, None], stop_steps=(0,)) == 1


def _mk_scan_trainer(scene, save_dir, k, occupancy=False):
    ds = BlenderDataset(scene, "train", img_wh=(40, 40))
    val = BlenderDataset(scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    kw = {}
    if occupancy:
        kw = dict(aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
                  use_occupancy=True, occ_grid_size=16, occ_dense_samples=16,
                  occ_update_every=10)
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                      perturb=True, **kw)
    tc = TrainConfig(
        batch_size=256, iters=30, quick_val_interval=15,
        full_val_interval=0, quick_val_subset=1, log_interval=10,
        ckpt_interval=30, precrop_iters=7, precrop_frac=0.6,
        steps_per_dispatch=k,
    )
    return Trainer(rc, tc, ds, val, val, save_dir=save_dir, verbose=False)


def test_scan_dispatch_matches_single_step(synthetic_scene, tmp_path):
    """steps_per_dispatch=K runs the SAME math as K single dispatches:
    identical batch order, RNG folding, event cadence, and (to fp reorder
    noise) parameters/metrics — across log/val boundaries, a precrop
    transition mid-run, and a non-dividing interval (15 % 4 != 0)."""
    t1 = _mk_scan_trainer(synthetic_scene, str(tmp_path / "k1"), k=1)
    m1 = t1.train()
    t4 = _mk_scan_trainer(synthetic_scene, str(tmp_path / "k4"), k=4)
    m4 = t4.train()

    a = jax.device_get(t1.state.params)
    b = jax.device_get(t4.state.params)
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-6)

    # Histories line up: same validation steps, same metric cadence.
    assert m1["val_steps"] == m4["val_steps"]
    assert len(m1["iteration_times"]) == len(m4["iteration_times"]) == 30
    np.testing.assert_allclose(
        m1["train_losses"], m4["train_losses"], rtol=1e-3)
    np.testing.assert_allclose(
        m1["quick_val_psnrs"], m4["quick_val_psnrs"], rtol=1e-3)
    # Layered checkpoints still land on the same steps.
    assert os.path.exists(os.path.join(str(tmp_path / "k4"), "model_30.ckpt"))


def test_scan_dispatch_occupancy_matches(synthetic_scene, tmp_path):
    """Scan windows break at occ_update_every so the grid refresh fires on
    the same steps, with the same RNG fold, as single-step dispatch.

    (Params are compared only loosely: the binary occupied/empty threshold
    amplifies scan-vs-single compilation fp noise into discretely different
    sample depths, so bit-tight agreement is not the contract here — the
    refresh cadence is.)"""

    def spy_updates(t):
        folds, orig = [], t._occ_update

        def spy(grid, params, rng, decay):
            folds.append(np.asarray(rng))
            return orig(grid, params, rng, decay)

        t._occ_update = spy
        return folds

    t1 = _mk_scan_trainer(synthetic_scene, str(tmp_path / "o1"), k=1,
                          occupancy=True)
    f1 = spy_updates(t1)
    t1.train()
    t5 = _mk_scan_trainer(synthetic_scene, str(tmp_path / "o5"), k=5,
                          occupancy=True)
    f5 = spy_updates(t5)
    t5.train()

    # Same number of refreshes (iters=30, every 10 -> steps 1, 11, 21),
    # each with the identical per-step RNG fold.
    assert len(f1) == len(f5) == 3
    for a, b in zip(f1, f5):
        np.testing.assert_array_equal(a, b)
    a = np.asarray(t1.state.params["coarse"]["pts_0"]["kernel"])
    b = np.asarray(t5.state.params["coarse"]["pts_0"]["kernel"])
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_kill_and_resume_property(synthetic_scene, tmp_path):
    """SIGKILL a LIVE CLI training run at random points (including
    arbitrarily close to checkpoint writes), auto-resume, repeat, finish —
    and prove end-to-end continuity (VERDICT r4 item 6; reference resume
    semantics /root/reference/scripts/train.py:292-361):

      * the finished run reaches exactly --iters steps,
      * quick-val history has every interval step exactly once (no
        duplicates from replayed windows, no gaps from lost history),
      * every resume picked up at the last checkpoint (nothing lost
        beyond it, nothing replayed from 0),
      * the layered checkpoint files all exist and the final metrics
        JSON is self-consistent.
    """
    import random
    import signal
    import subprocess
    import sys
    import time

    save_dir = str(tmp_path / "killrun")
    iters, interval = 300, 50
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from scripts.train import main;"
        f"main(['--datadir', {synthetic_scene!r}, '--img_wh', '40', '40',"
        f"'--batch_size', '128', '--iters', '{iters}',"
        f"'--save_dir', {save_dir!r}, '--N_samples', '8',"
        f"'--N_importance', '8', '--quick_val_interval', '{interval}',"
        f"'--full_val_interval', '0', '--quick_val_res', '40', '40',"
        f"'--quick_val_subset', '1', '--i_weights', '{interval}',"
        "'--compute_dtype', 'float32', '--no_pallas', '--n_devices', '1'])"
    )
    rng = random.Random(1234)
    logs = []

    def launch():
        return subprocess.Popen(
            [sys.executable, "-c", code], cwd=os.path.dirname(__file__) + "/..",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    ckpt = os.path.join(save_dir, "metrics_latest.ckpt")
    n_kills = 0
    for attempt in range(6):  # 3 kills wanted; bail out via break
        proc = launch()
        # Wait for the first/next checkpoint write, then kill at a random
        # offset — sometimes landing mid-window, sometimes right on top
        # of the next checkpoint/atomic-rename.
        t0 = time.time()
        mtime0 = os.path.getmtime(ckpt) if os.path.exists(ckpt) else None
        changed = False
        while time.time() - t0 < 180:
            if proc.poll() is not None:
                break  # finished before we got to kill it
            m = os.path.getmtime(ckpt) if os.path.exists(ckpt) else None
            if m is not None and m != mtime0:
                changed = True
                break
            time.sleep(0.05)
        if proc.poll() is not None:
            logs.append(proc.stdout.read())
            break  # run completed
        assert changed, "no checkpoint appeared within 180s"
        time.sleep(rng.uniform(0.0, 1.5))
        if proc.poll() is None and n_kills < 3:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            logs.append(proc.stdout.read())
            n_kills += 1
            continue
        # Already killed 3 times: let this one run to completion.
        out, _ = proc.communicate(timeout=600)
        logs.append(out)
        break
    else:
        raise AssertionError("training never completed after 6 attempts")

    assert n_kills >= 1, "the run finished before any kill could land"
    full_log = "\n".join(logs)

    # Every restart resumed from a checkpoint at a step > 0 (auto-
    # discovery, not a silent restart from scratch).
    resumes = [ln for ln in full_log.splitlines() if "resumed from" in ln]
    assert len(resumes) == n_kills, (n_kills, resumes, full_log[-2000:])
    for ln in resumes:
        step = int(ln.split("at step")[1].split("(")[0].strip().replace(",", ""))
        assert step > 0 and step % interval == 0, ln
        assert step <= iters, ln

    # Final state: exactly --iters steps, complete layered checkpoints.
    with open(os.path.join(save_dir, "metrics_latest.json")) as f:
        m = json.load(f)
    assert m["step"] == iters
    for name in ("model_final.ckpt", "metrics_latest.ckpt",
                 "comprehensive_metrics.json"):
        assert os.path.exists(os.path.join(save_dir, name)), name

    # Quick-val history: every interval step exactly once, in order.
    assert m["val_steps"] == list(range(interval, iters + 1, interval)), (
        m["val_steps"]
    )
    assert len(m["quick_val_psnrs"]) == len(m["val_steps"])
    # Training made progress through the kills (not reset to init).
    assert m["train_losses"][-1] < m["train_losses"][0]
