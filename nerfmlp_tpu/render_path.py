"""Trajectory rendering: the TPU-side equivalent of the oracle's
``render_path`` (example/run_nerf.py:339-375).

Given a list of c2w poses, renders rgb + disparity frames, optionally
downscaled by ``render_factor`` (run_nerf.py:344-349), optionally saving
per-frame PNGs (:361-367) and logging per-frame PSNR against ground-truth
images when provided (:369-372). NDC scenes (``cfg.ndc``) get their rays
reprojected at render time with world-space view directions kept for the
view branch (run_nerf.py:297-312) — this is what lets LLFF novel cameras
(spiral videos, zoom) work at all.

Used by both the in-training i_video / i_testset events
(nerfmlp_tpu/train/loop.py) and the standalone scripts/render_video.py.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.ops.render import render_image_maps
from nerfmlp_tpu.utils.image import save_png, to8b


def rays_for_pose(
    pose: np.ndarray,
    H: int,
    W: int,
    focal: float,
    cfg: RenderConfig,
    viewdirs_pose: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """(rays_o, rays_d, viewdirs) flattened to (H*W, 3) for one camera.

    For NDC configs the returned o/d are NDC-reparameterized and viewdirs
    are the WORLD directions computed before the projection (the oracle
    conditions the view branch on pre-NDC directions, run_nerf.py:297-312);
    for metric configs viewdirs is None (render_rays normalizes rays_d).

    ``viewdirs_pose``: when given, the view branch is conditioned on THIS
    camera's ray directions while the geometry rays stay ``pose``'s — the
    oracle's ``c2w_staticcam`` view-dependence visualization
    (run_nerf.py:299-302: viewdirs from the moving pose, rays from the
    static one; callers pass pose=static, viewdirs_pose=moving).
    """
    from nerfmlp_tpu.ops.rays import get_rays_np, ndc_rays

    o, d = get_rays_np(H, W, focal, np.asarray(pose, dtype=np.float32))
    o = o.reshape(-1, 3).astype(np.float32).copy()
    d = d.reshape(-1, 3).astype(np.float32)
    vd_src = d
    if viewdirs_pose is not None:
        _, vd_src = get_rays_np(
            H, W, focal, np.asarray(viewdirs_pose, dtype=np.float32)
        )
        vd_src = vd_src.reshape(-1, 3).astype(np.float32)
    if not cfg.ndc and viewdirs_pose is None:
        return o, d, None
    vd = (vd_src / np.linalg.norm(vd_src, axis=-1, keepdims=True)).astype(
        np.float32
    )
    if not cfg.ndc:
        return o, d, vd
    o_n, d_n = ndc_rays(H, W, focal, 1.0, o, d)
    return np.asarray(o_n), np.asarray(d_n), vd


@functools.lru_cache(maxsize=16)
def _raygen_fn(H: int, W: int, ndc: bool, has_vd_pose: bool):
    """One compiled on-device ray generator per (H, W, mode)."""
    import jax

    from nerfmlp_tpu.ops.rays import get_rays, ndc_rays

    @jax.jit
    def gen(c2w, vd_c2w, focal):
        o, d = get_rays(H, W, focal, c2w)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        vd_src = d
        if has_vd_pose:
            _, vd_src = get_rays(H, W, focal, vd_c2w)
            vd_src = vd_src.reshape(-1, 3)
        if not ndc and not has_vd_pose:
            return o, d, None
        vd = vd_src / jnp.linalg.norm(vd_src, axis=-1, keepdims=True)
        if not ndc:
            return o, d, vd
        o_n, d_n = ndc_rays(H, W, focal, 1.0, o, d)
        return o_n, d_n, vd

    return gen


def rays_for_pose_device(
    pose: np.ndarray,
    H: int,
    W: int,
    focal: float,
    cfg: RenderConfig,
    viewdirs_pose: Optional[np.ndarray] = None,
):
    """Device-side twin of :func:`rays_for_pose` — same outputs as jnp
    arrays, generated ON the accelerator from the 16-float pose.

    The host variant uploads 2-3 full (H*W, 3) ray arrays per frame
    (~15 MB at 800²) before rendering can start; this one ships one 4x4
    matrix and a focal scalar, which measured ~0.55 s/frame faster at
    800² through the TPU tunnel (docs/RESULTS.md, serving study). Used by
    the serving hot path and the local (non-sharded) trajectory renderer;
    the sharded renderer keeps host rays (it places shards itself)."""
    gen = _raygen_fn(int(H), int(W), bool(cfg.ndc), viewdirs_pose is not None)
    c2w = jnp.asarray(np.asarray(pose, np.float32))
    vd_c2w = (jnp.asarray(np.asarray(viewdirs_pose, np.float32))
              if viewdirs_pose is not None else c2w)
    return gen(c2w, vd_c2w, jnp.float32(focal))


def render_path(
    params: Dict,
    poses: np.ndarray,
    hwf: Tuple[int, int, float],
    cfg: RenderConfig,
    gt_images: Optional[np.ndarray] = None,
    render_factor: int = 0,
    occ_grid=None,
    save_dir: Optional[str] = None,
    tile: int = 4096,
    verbose: bool = True,
    static_cam_pose: Optional[np.ndarray] = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, Optional[list]]:
    """Render every pose; returns (rgbs (N,H,W,3), disps (N,H,W), psnrs).

    * ``render_factor`` != 0 divides H/W/focal for fast previews and
      skips the ground-truth comparison — even for factor 1, matching the
      oracle exactly (run_nerf.py:344-349, 363-365).
    * ``gt_images`` (N,H,W,3): per-frame PSNR is computed and printed
      (run_nerf.py:369-372) and returned.
    * ``save_dir``: writes ``{i:03d}.png`` rgb frames (run_nerf.py:361-365).
    * ``static_cam_pose``: render every frame from THIS fixed camera while
      the view branch follows the trajectory poses — the oracle's
      ``c2w_staticcam`` rgb_still viewdirs visualization
      (run_nerf.py:858-863).
    * ``mesh``: a pure data-parallel mesh shards every frame's pixel grid
      over its devices (parallel/render_parallel.py); anything else —
      ``None``, a 1-device mesh, tensor parallelism — renders locally.
    """
    import jax.numpy as jnp

    from nerfmlp_tpu.parallel.render_parallel import (
        data_parallel_mesh, render_image_sharded,
    )

    mesh = data_parallel_mesh(mesh)

    H, W, focal = hwf
    if render_factor:
        # Oracle semantics: ANY non-zero render_factor (even 1) takes the
        # downscale branch and suppresses the gt comparison
        # (run_nerf.py:344-349, 363-365).
        H, W = H // render_factor, W // render_factor
        focal = focal / render_factor
        gt_images = None

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    rgbs, disps = [], []
    psnrs = [] if gt_images is not None else None
    for i, pose in enumerate(np.asarray(poses)):
        if mesh is not None:
            # The sharded renderer places ray shards itself — host rays.
            if static_cam_pose is not None:
                o, d, vd = rays_for_pose(
                    static_cam_pose, H, W, focal, cfg, viewdirs_pose=pose
                )
            else:
                o, d, vd = rays_for_pose(pose, H, W, focal, cfg)
            out = render_image_sharded(
                params, o, d, H, W, cfg, mesh,
                tile=max(256, -(-tile // mesh.shape["data"])),
                occ_grid=occ_grid, viewdirs=vd,
                maps=("rgb_map", "disp_map"),
            )
        else:
            # Local path: rays are generated ON device from the 16-float
            # pose (rays_for_pose_device) — uploading full ray arrays
            # costs ~0.55 s/frame at 800² through the tunnel.
            if static_cam_pose is not None:
                o, d, vd = rays_for_pose_device(
                    static_cam_pose, H, W, focal, cfg, viewdirs_pose=pose
                )
            else:
                o, d, vd = rays_for_pose_device(pose, H, W, focal, cfg)
            out = render_image_maps(
                params, o, d, H, W, cfg,
                tile=tile, occ_grid=occ_grid, viewdirs=vd,
                maps=("rgb_map", "disp_map"),
            )
        rgb = np.asarray(out["rgb_map"], dtype=np.float32)
        disp = np.asarray(out["disp_map"], dtype=np.float32)
        rgbs.append(rgb)
        disps.append(disp)
        line = f"render_path {i + 1}/{len(poses)}"
        if psnrs is not None:
            from nerfmlp_tpu.train.metrics import psnr_images

            p = psnr_images(rgb, gt_images[i])
            psnrs.append(p)
            line += f" | PSNR {p:.2f}"
        if save_dir:
            save_png(os.path.join(save_dir, f"{i:03d}.png"), rgb)
        if verbose:
            print(line, flush=True)
    if psnrs is not None and verbose and psnrs:
        print(f"render_path mean PSNR over {len(psnrs)} frames: "
              f"{float(np.mean(psnrs)):.2f}", flush=True)
    return np.stack(rgbs), np.stack(disps), psnrs


def save_path_videos(
    base: str, rgbs: np.ndarray, disps: np.ndarray, fps: int = 30
) -> Tuple[str, str]:
    """Write ``<base>_rgb`` and ``<base>_disp`` videos (the oracle writes
    both an rgb and a max-normalized disparity video, run_nerf.py:853-856).
    Returns the two paths written."""
    from nerfmlp_tpu.utils.image import write_video

    rgb_path = write_video(base + "_rgb", to8b(rgbs), fps=fps)
    disp_path = write_video(
        base + "_disp", to8b(disps / max(float(np.max(disps)), 1e-8)), fps=fps
    )
    return rgb_path, disp_path
