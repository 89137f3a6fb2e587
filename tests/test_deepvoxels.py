"""DeepVoxels loader tests (nerfmlp_tpu/data/deepvoxels.py).

The reference's ``load_deepvoxels.py`` is absent from its tree (imported
at example/run_nerf.py:13 but never shipped, SURVEY §2.3), so the oracle
here is the *integration contract* (run_nerf.py:630-642: return shapes,
hemisphere near/far) plus the public DeepVoxels release layout, which the
fixture below reproduces.
"""

import os

import numpy as np
import pytest

from nerfmlp_tpu.data.deepvoxels import (
    DeepVoxelsDataset,
    load_pose,
    parse_intrinsics,
)


def _write_scene(root, scene="cube", n_train=4, n_test=3, side=16):
    """A miniature DeepVoxels-format capture: cameras on a hemisphere of
    radius 2.5 looking at the origin, flat-colored images."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for mode, n in (("train", n_train), ("validation", 2), ("test", n_test)):
        base = os.path.join(root, mode, scene)
        os.makedirs(os.path.join(base, "pose"))
        os.makedirs(os.path.join(base, "rgb"))
        with open(os.path.join(base, "intrinsics.txt"), "w") as f:
            # f cx cy 0 / barycenter / near / scale / height width
            f.write(f"{side * 2.0} {side / 2} {side / 2} 0.\n")
            f.write("0. 0. 0.\n1.0\n1.0\n")
            f.write(f"{side} {side}\n")
        for i in range(n):
            theta = 2 * np.pi * i / max(n, 1)
            eye = 2.5 * np.array(
                [np.cos(theta) * 0.8, np.sin(theta) * 0.8, 0.6]
            )
            # OpenCV c2w: z-forward toward the origin, y down.
            fwd = -eye / np.linalg.norm(eye)
            right = np.cross(np.array([0.0, 0.0, 1.0]), fwd)
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
                right, down, fwd, eye,
            )
            np.savetxt(
                os.path.join(base, "pose", f"{i:06d}.txt"),
                c2w.reshape(1, 16),
            )
            img = np.full((side, side, 3), 255, np.uint8)
            img[4:12, 4:12] = rng.integers(0, 255, 3, dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(base, "rgb", f"{i:06d}.png")
            )
    return root


@pytest.fixture(scope="module")
def dv_root(tmp_path_factory):
    return _write_scene(str(tmp_path_factory.mktemp("dv")), scene="cube")


def test_parse_intrinsics(dv_root):
    intr = parse_intrinsics(
        os.path.join(dv_root, "train", "cube", "intrinsics.txt")
    )
    assert intr["focal"] == 32.0
    assert intr["width"] == 16 and intr["height"] == 16
    assert intr["barycenter"].shape == (3,)


def test_pose_convention_flip(dv_root):
    """Loaded poses must be OpenGL/NeRF convention: the camera's -z axis
    (viewing direction) points at the origin."""
    raw = load_pose(
        os.path.join(dv_root, "train", "cube", "pose", "000000.txt")
    )
    ds = DeepVoxelsDataset(dv_root, "train", img_wh=(16, 16), shape="cube")
    c2w = ds.poses[0]
    eye = c2w[:3, 3]
    np.testing.assert_allclose(eye, raw[:3, 3], atol=1e-6)
    view_dir = -c2w[:3, 2]  # NeRF cameras look along -z
    to_origin = -eye / np.linalg.norm(eye)
    np.testing.assert_allclose(view_dir, to_origin, atol=1e-5)
    # Rotation stays orthonormal after the axes flip.
    np.testing.assert_allclose(
        c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-5
    )


def test_splits_and_testskip(dv_root):
    train = DeepVoxelsDataset(dv_root, "train", img_wh=(16, 16), shape="cube")
    val = DeepVoxelsDataset(dv_root, "val", img_wh=(16, 16), shape="cube")
    test = DeepVoxelsDataset(
        dv_root, "test", img_wh=(16, 16), shape="cube", testskip=2
    )
    assert train.n_images == 4
    assert val.n_images == 2  # "validation" dir maps to split "val"
    assert test.n_images == 2  # 3 test images, every 2nd
    assert train.images.shape == (4, 16, 16, 3)
    assert len(train) == 4 * 16 * 16
    o, d, gt = train.image_rays(1)
    assert o.shape == (256, 3) and gt.shape == (16, 16, 3)
    assert np.isfinite(d).all()


def test_hemisphere_near_far(dv_root):
    """near/far = mean(||t||) -/+ 1 (example/run_nerf.py:640-642)."""
    ds = DeepVoxelsDataset(dv_root, "train", img_wh=(16, 16), shape="cube")
    hemi_r = float(np.linalg.norm(ds.poses[:, :3, 3], axis=-1).mean())
    near, far = ds.dynamic_near_far()
    assert near == pytest.approx(hemi_r - 1.0)
    assert far == pytest.approx(hemi_r + 1.0)
    assert abs(hemi_r - 2.5) < 1e-4  # fixture cameras sit at radius 2.5


def test_focal_rescales_with_img_wh(dv_root):
    ds16 = DeepVoxelsDataset(dv_root, "train", img_wh=(16, 16), shape="cube")
    ds8 = DeepVoxelsDataset(dv_root, "train", img_wh=(8, 8), shape="cube")
    assert ds16.focal == pytest.approx(32.0)
    assert ds8.focal == pytest.approx(16.0)
    assert ds8.images.shape == (4, 8, 8, 3)


def test_render_poses_orbit(dv_root):
    ds = DeepVoxelsDataset(dv_root, "train", img_wh=(16, 16), shape="cube")
    rp = ds.render_poses(n_frames=6)
    assert rp.shape == (6, 4, 4)
    radii = np.linalg.norm(rp[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii, 2.5, atol=1e-4)


def test_train_cli_deepvoxels_smoke(dv_root, tmp_path):
    """End-to-end: train a few steps on the DV fixture through the CLI
    (hemisphere bounds, no white-bkgd compositing needed)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.train import main

    out = str(tmp_path / "dv_out")
    main([
        "--datadir", dv_root, "--dataset_type", "deepvoxels",
        "--shape", "cube", "--img_wh", "16", "16",
        "--batch_size", "64", "--iters", "12", "--save_dir", out,
        "--quick_val_interval", "6", "--full_val_interval", "0",
        "--quick_val_res", "16", "16", "--quick_val_subset", "1",
        "--N_samples", "8", "--N_importance", "8",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--i_print", "6",
    ])
    assert os.path.exists(os.path.join(out, "metrics_latest.json"))
