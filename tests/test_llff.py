"""LLFF loader + NDC against a synthetic poses_bounds.npy fixture."""

import os

import numpy as np
import pytest

from nerfmlp_tpu.data.llff import LLFFDataset


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    """Fake forward-facing capture: 8 cameras near z=+4 looking down -z."""
    from PIL import Image

    d = tmp_path_factory.mktemp("llff")
    img_dir = d / "images"
    img_dir.mkdir()
    n, h, w, f = 8, 30, 40, 50.0
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.02 * i]
        # LLFF stores [down, right, back]: invert the loader's correction.
        m = np.concatenate(
            [-c2w[:3, 1:2], c2w[:3, 0:1], c2w[:3, 2:3], c2w[:3, 3:4]], axis=1
        )
        hwf = np.array([[h], [w], [f]], dtype=np.float32)
        rows.append(np.concatenate([np.concatenate([m, hwf], 1).ravel(), [2.0, 8.0]]))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"img_{i:03d}.png")
    np.save(d / "poses_bounds.npy", np.stack(rows).astype(np.float64))
    return str(d)


def test_llff_loads_and_splits(llff_scene):
    train = LLFFDataset(llff_scene, "train", img_wh=(40, 30), llffhold=4)
    val = LLFFDataset(llff_scene, "val", img_wh=(40, 30), llffhold=4)
    assert train.n_images == 6 and val.n_images == 2  # 8 with hold-4
    assert train.all_rays_o.shape == (6 * 30 * 40, 3)
    o, d, rgb = train.image_rays(0)
    assert rgb.shape == (30, 40, 3)


def test_llff_ndc_bounds(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=True)
    assert ds.dynamic_near_far() == (0.0, 1.0)
    # NDC rays terminate within the canonical cube along z.
    end = ds.all_rays_o + ds.all_rays_d
    assert np.isfinite(ds.all_rays_o).all()
    assert (end[:, 2] <= 1.0 + 1e-4).all()


def test_llff_metric_bounds(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=False)
    near, far = ds.dynamic_near_far()
    # Bounds [2, 8] scaled by 1/(2*0.75): near = (2*sc)*0.9, far = 8*sc.
    sc = 1.0 / (2.0 * 0.75)
    assert abs(near - 2.0 * sc * 0.9) < 1e-5
    assert abs(far - 8.0 * sc) < 1e-5


def test_llff_recentering_normalizes_rig(llff_scene):
    """After preprocessing the AVERAGE camera sits at the origin looking
    down -z — the frame NDC assumes."""
    # llffhold=0 keeps all poses in train (recentering is computed over
    # the FULL rig before the split, so only the full set averages to 0).
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), llffhold=0)
    center = ds.poses[:, :3, 3].mean(axis=0)
    np.testing.assert_allclose(center, 0.0, atol=1e-5)
    mean_back = ds.poses[:, :3, 2].mean(axis=0)
    mean_back /= np.linalg.norm(mean_back)
    np.testing.assert_allclose(mean_back, [0.0, 0.0, 1.0], atol=1e-4)


def test_llff_raw_frame_opt_out(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30),
                     bd_factor=0.0, recenter=False, use_ndc=False)
    near, far = ds.dynamic_near_far()
    assert abs(near - 1.8) < 1e-6 and abs(far - 8.0) < 1e-6  # unscaled


def test_llff_focal_rescaled(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(80, 60))
    assert abs(ds.focal - 100.0) < 1e-4  # 50 * 80/40


def test_llff_trains_a_step(llff_scene):
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.pipeline import RayBatchLoader
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=True)
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                      perturb=True, ndc=True, lindisp=False)
    tc = TrainConfig(batch_size=128)
    state = create_train_state(rc, tc)
    step = make_train_step(rc, tc)
    loader = RayBatchLoader.from_dataset(ds, 128)
    state, m = step(state, jnp.asarray(loader.next_batch()))
    assert np.isfinite(float(m["loss"]))


def test_llff_world_viewdirs_stored(llff_scene):
    """NDC datasets carry WORLD-space view directions separately (the
    oracle computes viewdirs before ndc_rays, run_nerf.py:297-312)."""
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=True)
    assert ds.all_viewdirs is not None
    assert ds.all_viewdirs.shape == ds.all_rays_d.shape
    # Unit norm, and NOT equal to the NDC directions.
    norms = np.linalg.norm(ds.all_viewdirs, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.abs(ds.all_viewdirs - ds.all_rays_d).max() > 0.1
    vd = ds.image_viewdirs(0)
    assert vd.shape == (30 * 40, 3)
    # Metric mode has no separate viewdirs.
    ds2 = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=False)
    assert ds2.all_viewdirs is None and ds2.image_viewdirs(0) is None


def test_llff_batches_carry_viewdirs(llff_scene):
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.pipeline import RayBatchLoader
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30), use_ndc=True)
    loader = RayBatchLoader.from_dataset(ds, 64)
    b = loader.next_batch()
    assert b.shape == (64, 12)  # [o | d_ndc | viewdir | rgb]
    np.testing.assert_allclose(np.linalg.norm(b[:, 6:9], axis=-1), 1.0, atol=1e-5)

    rc = RenderConfig(N_samples=8, N_importance=8, near=0.0, far=1.0,
                      perturb=True, ndc=True)
    tc = TrainConfig(batch_size=64)
    state = create_train_state(rc, tc)
    step = make_train_step(rc, tc)
    state, m = step(state, jnp.asarray(b))
    assert np.isfinite(float(m["loss"]))


@pytest.fixture(scope="module")
def llff_360_scene(tmp_path_factory):
    """Fake 360 capture: 10 cameras on a radius-5 ring looking inward."""
    from PIL import Image

    d = tmp_path_factory.mktemp("llff360")
    img_dir = d / "images"
    img_dir.mkdir()
    n, h, w, f = 10, 30, 40, 50.0
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.array([5 * np.cos(th), 5 * np.sin(th), 1.0], np.float32)
        back = pos / np.linalg.norm(pos)
        right = np.cross(np.array([0.0, 0.0, 1.0]), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.stack([right, up, back, pos], axis=1)
        m = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]], axis=1
        )
        hwf = np.array([[h], [w], [f]], dtype=np.float32)
        rows.append(np.concatenate([np.concatenate([m, hwf], 1).ravel(), [2.0, 9.0]]))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"img_{i:03d}.png")
    np.save(d / "poses_bounds.npy", np.stack(rows).astype(np.float64))
    return str(d)


def test_llff_spherify_loader(llff_360_scene):
    """--spherify: metric rays, unit-sphere rig normalization, circular
    render path (oracle --spherify, run_nerf.py:548)."""
    ds = LLFFDataset(llff_360_scene, "train", img_wh=(40, 30), llffhold=0,
                     spherify=True)
    assert ds.use_ndc is False  # spherify implies metric rays
    rad = np.sqrt(np.mean(np.sum(ds.poses[:, :3, 3] ** 2, axis=-1)))
    assert abs(rad - 1.0) < 1e-4
    near, far = ds.dynamic_near_far()
    assert 0 < near < far
    rp = ds.render_poses(n_frames=10)
    assert rp.shape == (10, 4, 4)
    # Circular path looks at the center.
    for p in rp:
        pos = p[:3, 3]
        np.testing.assert_allclose(p[:3, 2], pos / np.linalg.norm(pos),
                                   atol=1e-5)


def test_llff_render_poses_forward_facing(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30))
    rp = ds.render_poses(n_frames=12)
    assert rp.shape == (12, 4, 4)
    assert np.all(np.isfinite(rp))
    R = rp[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_llff_factor_dir_created_and_used(llff_scene):
    """--factor N minifies images/ into images_N/ once and loads from it
    (oracle --factor semantics)."""
    ds = LLFFDataset(llff_scene, "train", img_wh=(20, 15), factor=2)
    fdir = os.path.join(llff_scene, "images_2")
    assert os.path.isdir(fdir) and len(os.listdir(fdir)) == 8
    from PIL import Image

    with Image.open(os.path.join(fdir, sorted(os.listdir(fdir))[0])) as im:
        assert im.size == (20, 15)  # 40x30 / 2
    assert ds.images.shape == (7, 15, 20, 3)  # default llffhold=8 -> 7 train


def test_synthetic_llff_360_scene_learns(tmp_path):
    """End-to-end learnability of the spherify path: a procedural 360
    capture in LLFF layout trains and the loss drops."""
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.pipeline import RayBatchLoader
    from nerfmlp_tpu.data.synthetic import make_synthetic_llff_scene
    from nerfmlp_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )

    d = str(tmp_path / "llff360")
    make_synthetic_llff_scene(d, n_images=8, img_wh=(32, 24), style="360")
    ds = LLFFDataset(d, "train", img_wh=(32, 24), llffhold=8, spherify=True)
    near, far = ds.dynamic_near_far()
    assert 0 < near < far
    rc = RenderConfig(N_samples=12, N_importance=12, near=near, far=far,
                      perturb=True, white_bkgd=False)
    tc = TrainConfig(batch_size=256)
    state = create_train_state(rc, tc)
    step = make_train_step(rc, tc)
    loader = RayBatchLoader.from_dataset(ds, tc.batch_size)
    losses = []
    for _ in range(80):
        state, m = step(state, jnp.asarray(loader.next_batch()))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_factor_sets_native_resolution_via_cli(llff_scene, tmp_path):
    """Oracle --factor semantics: the training resolution comes from
    images_{factor}/'s native size when --img_wh is omitted
    (run_nerf.py:548-551 — load_llff returns minified images as-is)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.train import main

    out = str(tmp_path / "f2")
    main([
        "--datadir", llff_scene, "--dataset_type", "llff", "--factor", "2",
        "--batch_size", "64", "--iters", "4", "--save_dir", out,
        "--quick_val_interval", "4", "--full_val_interval", "0",
        "--quick_val_res", "20", "15", "--quick_val_subset", "1",
        "--N_samples", "4", "--N_importance", "0",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--i_print", "4",
    ])
    with open(os.path.join(out, "args.txt")) as f:
        args_txt = f.read()
    # images/ is 40x30 -> images_2/ native 20x15.
    assert "img_wh = [20, 15]" in args_txt


def test_llff_aspect_snap(llff_scene, capsys):
    """A square img_wh request against a 4:3 capture snaps the height so
    one scalar focal serves both axes (otherwise quick-val PSNR/SSIM
    compare aspect-squashed GT against unmatched-FOV renders)."""
    ds = LLFFDataset(llff_scene, "train", img_wh=(32, 32))
    # Capture is 40x30 (4:3) -> height snaps to 24.
    assert (ds.W, ds.H) == (32, 24)
    assert ds.images.shape[1:3] == (24, 32)
    # Matching aspect passes through untouched.
    ds2 = LLFFDataset(llff_scene, "train", img_wh=(40, 30))
    assert (ds2.W, ds2.H) == (40, 30)


def test_llff_aspect_snap_opt_out(llff_scene):
    """keep_aspect=False (CLI --no_aspect_snap) honors a deliberately
    non-native img_wh — warn-and-honor per ADVICE r2 — and the flag is
    actually threaded through dataset_kwargs."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = LLFFDataset(llff_scene, "train", img_wh=(32, 32),
                         keep_aspect=False)
    assert (ds.W, ds.H) == (32, 32)
    assert ds.images.shape[1:3] == (32, 32)
    assert any("non-native aspect" in str(x.message) for x in w)

    # The CLI flag reaches the loader kwargs (was dead API, r3 review).
    import argparse

    from nerfmlp_tpu.utils.cli import add_llff_flags, dataset_kwargs

    p = argparse.ArgumentParser()
    p.add_argument("--dataset_type", default="llff")
    add_llff_flags(p)
    kw = dataset_kwargs(p.parse_args(["--no_aspect_snap"]))
    assert kw["keep_aspect"] is False
    kw = dataset_kwargs(p.parse_args([]))
    assert kw["keep_aspect"] is True


def test_llffhold_zero_clear_error(llff_scene):
    import pytest

    with pytest.raises(ValueError, match="llffhold"):
        LLFFDataset(llff_scene, "val", img_wh=(20, 15), llffhold=0)
    # train split with llffhold=0 is fine (all images train).
    ds = LLFFDataset(llff_scene, "train", img_wh=(20, 15), llffhold=0)
    assert ds.n_images == 8


def test_partial_factor_dir_detected(llff_scene):
    """A killed minify run must not poison later loads: an images_{factor}/
    with a different image count than images/ raises an actionable error
    (never a silent rmtree — the dir may hold an official downsample);
    our own minification is crash-safe (tmp dir + rename), and stale
    .tmp dirs are invisible to the image-dir picker."""
    import shutil

    fdir = os.path.join(llff_scene, "images_4")
    shutil.rmtree(fdir, ignore_errors=True)
    # Simulate a crash: build it fully, then delete half the files.
    LLFFDataset._ensure_factor_dir(llff_scene, 4)
    files = sorted(os.listdir(fdir))
    assert len(files) == 8
    for f in files[4:]:
        os.remove(os.path.join(fdir, f))
    with pytest.raises(ValueError, match="Delete"):
        LLFFDataset._ensure_factor_dir(llff_scene, 4)
    shutil.rmtree(fdir)  # the error's prescribed fix
    out = LLFFDataset._ensure_factor_dir(llff_scene, 4)
    assert out == fdir and len(os.listdir(fdir)) == 8
    assert not os.path.isdir(fdir + ".tmp")
    # A stale .tmp dir is never picked as an image dir (factor=0 path).
    os.makedirs(os.path.join(llff_scene, "images_9.tmp"), exist_ok=True)
    with open(os.path.join(llff_scene, "images_9.tmp", "a.png"), "wb") as f:
        f.write(b"junk")
    picked = LLFFDataset._pick_image_dir(llff_scene, 40)
    assert picked is None or not picked.endswith(".tmp")
    shutil.rmtree(os.path.join(llff_scene, "images_9.tmp"))


def test_llff_rgb_pool_zero_copy(llff_scene):
    """all_rgbs must be a view over the image stack, not a copy (the copy
    doubles RGB host RAM; blender.py:115 sets the convention)."""
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30))
    assert ds.all_rgbs.base is ds.images or np.shares_memory(
        ds.all_rgbs, ds.images
    )
    np.testing.assert_array_equal(
        ds.all_rgbs.reshape(ds.images.shape), ds.images
    )
