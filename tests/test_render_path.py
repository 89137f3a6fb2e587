"""Trajectory rendering (nerfmlp_tpu/render_path.py) + pose generators:
parity surface of the oracle's render_path (example/run_nerf.py:339-375)
and its render-pose trajectories (:845-863)."""

import os

import numpy as np
import jax
import pytest

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.rays import (
    blender_render_poses,
    get_rays_np,
    ndc_rays,
    pose_spherical,
)
from nerfmlp_tpu.render_path import rays_for_pose, render_path, save_path_videos


def _params(cfg):
    return {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}


def _rot_orthonormal(c2w):
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


# --------------------------------------------------------------------- #
# Pose generators


def test_pose_spherical_geometry():
    for theta, phi, r in [(0.0, 0.0, 4.0), (45.0, -30.0, 4.0), (170.0, -30.0, 2.5)]:
        c2w = pose_spherical(theta, phi, r)
        _rot_orthonormal(c2w)
        pos = c2w[:3, 3]
        assert np.linalg.norm(pos) == pytest.approx(r, abs=1e-5)
        # Camera -z axis looks at the origin: +z (back) == normalize(pos).
        np.testing.assert_allclose(
            c2w[:3, 2], pos / np.linalg.norm(pos), atol=1e-5
        )


def test_blender_render_poses_orbit():
    poses = blender_render_poses(n_frames=40, radius=4.0)
    assert poses.shape == (40, 4, 4)
    d = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 4.0, atol=1e-4)
    # Elevation -30 deg => z = r * sin(-30) = -2... in the z-up world the
    # original convention puts the camera ABOVE the scene: z = +2.
    np.testing.assert_allclose(poses[:, 2, 3], 2.0, atol=1e-4)
    # Azimuths distinct (it actually orbits).
    assert np.std(poses[:, 0, 3]) > 1.0


def test_llff_spiral_render_poses():
    from nerfmlp_tpu.data.llff import spiral_render_poses

    # Forward-facing rig near identity with small offsets.
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    poses[:, :3, 3] = rng.normal(scale=0.1, size=(10, 3))
    bounds = np.array([[1.0, 10.0]] * 10)
    rp = spiral_render_poses(poses, bounds, n_frames=30)
    assert rp.shape == (30, 4, 4)
    for p in rp[:5]:
        _rot_orthonormal(p)
    assert np.all(np.isfinite(rp))
    # The spiral stays near the rig (radii from the 90th percentile of
    # camera offsets, so ~0.1 scale).
    assert np.abs(rp[:, :3, 3]).max() < 1.0


def test_spherify_poses_normalizes_radius():
    from nerfmlp_tpu.data.llff import spherify_poses

    # Cameras on a sphere of radius 3 around (1, 2, 3), looking inward
    # (camera +z = away from the center).
    rng = np.random.default_rng(1)
    center = np.array([1.0, 2.0, 3.0])
    poses = []
    for _ in range(12):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        pos = center + 3.0 * v
        back = v
        right = np.cross(np.array([0.0, 0.0, 1.0]), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        p = np.eye(4, dtype=np.float32)
        p[:3, 0], p[:3, 1], p[:3, 2], p[:3, 3] = right, up, back, pos
        poses.append(p)
    poses = np.stack(poses)
    bounds = np.array([[2.0, 6.0]] * 12)

    new_poses, render_poses, new_bounds, sc = spherify_poses(poses, bounds)
    # Mean camera radius normalized to 1.
    rad = np.sqrt(np.mean(np.sum(new_poses[:, :3, 3] ** 2, axis=-1)))
    assert rad == pytest.approx(1.0, abs=1e-4)
    assert render_poses.shape == (120, 4, 4)
    # Render cameras look at the center: back axis == normalize(position).
    for p in render_poses[::20]:
        pos = p[:3, 3]
        np.testing.assert_allclose(
            p[:3, 2], pos / np.linalg.norm(pos), atol=1e-5
        )
    # Bounds rescaled by the same factor.
    np.testing.assert_allclose(new_bounds, bounds * sc, atol=1e-6)


# --------------------------------------------------------------------- #
# rays_for_pose


def test_rays_for_pose_metric_matches_get_rays():
    cfg = RenderConfig(N_samples=4, N_importance=0, ndc=False)
    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d, vd = rays_for_pose(pose, 8, 8, 10.0, cfg)
    assert vd is None
    o_ref, d_ref = get_rays_np(8, 8, 10.0, pose)
    np.testing.assert_allclose(o, o_ref.reshape(-1, 3), atol=1e-6)
    np.testing.assert_allclose(d, d_ref.reshape(-1, 3), atol=1e-6)


def test_rays_for_pose_ndc_keeps_world_viewdirs():
    cfg = RenderConfig(N_samples=4, N_importance=0, ndc=True, near=0.0, far=1.0)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.0  # camera at z=1 looking down -z
    H = W = 8
    focal = 10.0
    o, d, vd = rays_for_pose(pose, H, W, focal, cfg)
    o_w, d_w = get_rays_np(H, W, focal, pose)
    o_w, d_w = o_w.reshape(-1, 3), d_w.reshape(-1, 3)
    # viewdirs are the pre-NDC world directions, normalized.
    np.testing.assert_allclose(
        vd, d_w / np.linalg.norm(d_w, axis=-1, keepdims=True), atol=1e-6
    )
    o_n, d_n = ndc_rays(H, W, focal, 1.0, o_w.copy(), d_w)
    np.testing.assert_allclose(o, np.asarray(o_n), atol=1e-5)
    np.testing.assert_allclose(d, np.asarray(d_n), atol=1e-5)


def test_rays_for_pose_device_matches_host():
    """The on-device ray generator (16-float pose upload, serving hot
    path) must produce the host twin's outputs in every mode: metric,
    NDC (pre-NDC world viewdirs), and staticcam viewdirs."""
    from nerfmlp_tpu.render_path import rays_for_pose_device

    H = W = 8
    focal = 10.0
    pose = pose_spherical(30.0, -30.0, 4.0)
    moving = pose_spherical(75.0, -10.0, 4.0)

    # Metric: no viewdirs.
    cfg = RenderConfig(N_samples=4, N_importance=0, ndc=False)
    ho, hd, hv = rays_for_pose(pose, H, W, focal, cfg)
    do, dd, dv = rays_for_pose_device(pose, H, W, focal, cfg)
    assert hv is None and dv is None
    np.testing.assert_allclose(np.asarray(do), ho, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-5)

    # Staticcam: geometry rays from `pose`, viewdirs from `moving`.
    ho, hd, hv = rays_for_pose(pose, H, W, focal, cfg, viewdirs_pose=moving)
    do, dd, dv = rays_for_pose_device(pose, H, W, focal, cfg,
                                      viewdirs_pose=moving)
    np.testing.assert_allclose(np.asarray(do), ho, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), hv, atol=1e-5)

    # NDC: reparameterized o/d + pre-NDC world viewdirs.
    ndc_pose = np.eye(4, dtype=np.float32)
    ndc_pose[2, 3] = 1.0
    cfg_ndc = RenderConfig(N_samples=4, N_importance=0, ndc=True,
                           near=0.0, far=1.0)
    ho, hd, hv = rays_for_pose(ndc_pose, H, W, focal, cfg_ndc)
    do, dd, dv = rays_for_pose_device(ndc_pose, H, W, focal, cfg_ndc)
    np.testing.assert_allclose(np.asarray(do), ho, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), hv, atol=1e-5)


# --------------------------------------------------------------------- #
# render_path end-to-end


def test_render_path_shapes_psnr_and_saves(tmp_path):
    cfg = RenderConfig(N_samples=6, N_importance=0, near=2.0, far=6.0)
    params = _params(cfg)
    poses = blender_render_poses(n_frames=3, radius=4.0)
    H = W = 12
    gt = np.zeros((3, H, W, 3), np.float32)
    out_dir = str(tmp_path / "frames")
    rgbs, disps, psnrs = render_path(
        params, poses, (H, W, 10.0), cfg,
        gt_images=gt, save_dir=out_dir, tile=64, verbose=False,
    )
    assert rgbs.shape == (3, H, W, 3)
    assert disps.shape == (3, H, W)
    assert len(psnrs) == 3 and all(np.isfinite(psnrs))
    for i in range(3):
        assert os.path.exists(os.path.join(out_dir, f"{i:03d}.png"))
    # PSNR is the standard -10 log10(mse) against the given gt.
    mse0 = float(np.mean((rgbs[0] - gt[0]) ** 2))
    assert psnrs[0] == pytest.approx(-10 * np.log10(mse0), abs=1e-3)


def test_render_path_render_factor_downscales():
    cfg = RenderConfig(N_samples=6, N_importance=0, near=2.0, far=6.0)
    params = _params(cfg)
    poses = blender_render_poses(n_frames=1, radius=4.0)
    rgbs, disps, psnrs = render_path(
        params, poses, (16, 16, 12.0), cfg,
        gt_images=np.zeros((1, 16, 16, 3), np.float32),
        render_factor=2, tile=64, verbose=False,
    )
    assert rgbs.shape == (1, 8, 8, 3)
    assert psnrs is None  # gt comparison skipped when downscaled


def test_save_path_videos_writes_rgb_and_disp(tmp_path):
    rgbs = np.random.default_rng(0).random((4, 8, 8, 3)).astype(np.float32)
    disps = np.random.default_rng(1).random((4, 8, 8)).astype(np.float32)
    rgb_path, disp_path = save_path_videos(str(tmp_path / "vid"), rgbs, disps)
    assert os.path.exists(rgb_path) and os.path.getsize(rgb_path) > 0
    assert os.path.exists(disp_path) and os.path.getsize(disp_path) > 0
    assert "_rgb" in rgb_path and "_disp" in disp_path


def test_render_image_maps_returns_requested_maps():
    import jax.numpy as jnp

    from nerfmlp_tpu.ops.render import render_image_maps

    cfg = RenderConfig(N_samples=6, N_importance=4, near=2.0, far=6.0)
    params = _params(cfg)
    pose = pose_spherical(0.0, -30.0, 4.0)
    o, d = get_rays_np(8, 8, 10.0, pose)
    out = render_image_maps(
        params, jnp.asarray(o.reshape(-1, 3).copy()),
        jnp.asarray(d.reshape(-1, 3)), 8, 8, cfg, tile=32,
        maps=("rgb_map", "disp_map", "acc_map"),
    )
    assert out["rgb_map"].shape == (8, 8, 3)
    assert out["disp_map"].shape == (8, 8)
    assert out["acc_map"].shape == (8, 8)
    assert np.all(np.isfinite(np.asarray(out["disp_map"])))


def test_static_cam_pose_fixes_geometry_varies_view():
    """c2w_staticcam rgb_still parity (run_nerf.py:299-302, 858-863):
    geometry rays come from the static camera (disp identical across
    frames), the view branch follows the trajectory (rgb varies)."""
    cfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0)
    params = _params(cfg)
    poses = np.stack([pose_spherical(t, -30.0, 4.0) for t in (0.0, 90.0, 180.0)])
    rgbs, disps, _ = render_path(
        params, poses, (8, 8, 10.0), cfg,
        static_cam_pose=poses[0], verbose=False, tile=32,
    )
    # Same geometry every frame -> identical disparity maps.
    np.testing.assert_allclose(disps[1], disps[0], atol=1e-5)
    np.testing.assert_allclose(disps[2], disps[0], atol=1e-5)
    # The view branch sees different directions -> rgb differs.
    assert np.abs(rgbs[1] - rgbs[0]).max() > 1e-4
    # Frame 0's viewdirs-pose IS the static cam -> identical to a plain
    # render of that pose.
    plain, _, _ = render_path(
        params, poses[:1], (8, 8, 10.0), cfg, verbose=False, tile=32
    )
    np.testing.assert_allclose(rgbs[0], plain[0], atol=1e-5)


def test_rays_for_pose_viewdirs_pose_ndc():
    """With NDC on, geometry rays are the static camera's NDC rays while
    viewdirs are the moving camera's world directions."""
    cfg = RenderConfig(ndc=True, near=0.0, far=1.0)
    static = pose_spherical(0.0, -5.0, 3.0)
    moving = pose_spherical(60.0, -5.0, 3.0)
    o_s, d_s, vd = rays_for_pose(static, 6, 6, 8.0, cfg, viewdirs_pose=moving)
    o_ref, d_ref, _ = rays_for_pose(static, 6, 6, 8.0, cfg)
    np.testing.assert_allclose(o_s, o_ref, atol=1e-6)
    np.testing.assert_allclose(d_s, d_ref, atol=1e-6)
    _, md = get_rays_np(6, 6, 8.0, moving)
    md = md.reshape(-1, 3)
    np.testing.assert_allclose(
        vd, md / np.linalg.norm(md, axis=-1, keepdims=True), atol=1e-6
    )


def test_flythrough_poses_loop_and_lookat():
    """The planned fly-through (reference VIDEOS.md:47-86): always looking
    at the target, altitude/distance varying with integer cycle counts so
    frame 0 continues seamlessly from frame n-1."""
    from nerfmlp_tpu.ops.rays import flythrough_poses

    n = 24
    poses = flythrough_poses(n_frames=n, radius=4.0)
    assert poses.shape == (n, 4, 4)
    eyes = poses[:, :3, 3]
    radii = np.linalg.norm(eyes, axis=-1)
    # Distance varies (3 cycles) around the base radius.
    assert radii.max() - radii.min() > 0.5
    assert abs(radii.mean() - 4.0) < 0.2
    # Altitude varies (2 cycles).
    assert eyes[:, 2].max() - eyes[:, 2].min() > 0.5
    # Look-at: camera -z axis points at the origin for every frame.
    for p in poses[::6]:
        view = -p[:3, 2]
        to_origin = -p[:3, 3] / np.linalg.norm(p[:3, 3])
        np.testing.assert_allclose(view, to_origin, atol=1e-5)
    # Seamless loop: the wrap step (last -> first) is the same size as an
    # interior step.
    interior = np.linalg.norm(eyes[1:] - eyes[:-1], axis=-1)
    wrap = np.linalg.norm(eyes[0] - eyes[-1])
    assert wrap < 2.0 * interior.max()

