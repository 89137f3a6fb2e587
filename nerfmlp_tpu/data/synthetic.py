"""Procedural Blender-format test scene.

The reference repo ships no data (Lego must be downloaded separately), so
this module generates a self-contained scene in the exact
``transforms_{split}.json`` + PNG layout the loader expects: a small
analytic density field (colored spheres + a box) volume-rendered with the
same integration equations the framework implements. Because the images
come from a *smooth, well-posed radiance field*, a short training run must
drive PSNR up — this powers the learning smoke tests (the role
scripts/train_only.py plays in the reference, train_only.py:4).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from nerfmlp_tpu.data.blender import linear_to_srgb
from nerfmlp_tpu.ops.rays import get_rays_np, look_at_matrix


def _scene_density_color(pts: np.ndarray):
    """Analytic radiance field: density (N,) and albedo (N, 3) at points.

    Three soft spheres and one box, all inside |x| < 1.2.
    """
    f32 = np.float32
    blobs = [
        # (center, radius, color, peak density) — float32 end to end, or
        # numpy promotes every temporary to float64 (2x memory, ~2x time).
        (np.array([0.0, 0.0, 0.0], f32), f32(0.45),
         np.array([0.9, 0.25, 0.2], f32), f32(18.0)),
        (np.array([0.55, 0.3, 0.2], f32), f32(0.3),
         np.array([0.2, 0.8, 0.3], f32), f32(15.0)),
        (np.array([-0.45, -0.35, 0.3], f32), f32(0.25),
         np.array([0.25, 0.35, 0.95], f32), f32(15.0)),
    ]
    pts = pts.astype(f32)
    sigma = np.zeros(pts.shape[0], dtype=f32)
    color_acc = np.zeros((pts.shape[0], 3), dtype=f32)
    for center, radius, color, peak in blobs:
        d2 = np.sum((pts - center) ** 2, axis=-1)
        s = peak * np.exp(-d2 / (2.0 * (radius / 2.0) ** 2))
        sigma += s
        color_acc += s[:, None] * color
    # Box at the bottom (a "ground slab").
    inside = (
        (np.abs(pts[:, 0]) < 0.9)
        & (np.abs(pts[:, 1]) < 0.9)
        & (pts[:, 2] > -0.75)
        & (pts[:, 2] < -0.55)
    )
    s_box = np.where(inside, 25.0, 0.0).astype(np.float32)
    sigma += s_box
    color_acc += s_box[:, None] * np.array([0.85, 0.75, 0.4], dtype=np.float32)

    albedo = color_acc / np.maximum(sigma[:, None], 1e-8)
    albedo = np.where(sigma[:, None] > 1e-6, albedo, 1.0)
    return sigma, albedo.astype(np.float32)


def render_analytic(
    pose: np.ndarray, H: int, W: int, focal: float, n_samples: int = 192,
    near: float = 2.0, far: float = 6.0, chunk: int = 16384,
) -> np.ndarray:
    """Ground-truth render of the analytic field (linear RGB + white bkgd).

    Rays are processed in chunks: the naive all-at-once version allocates
    H*W x n_samples x 3 float64 temporaries (~1.4 GB at 400^2) and thrashes
    host memory — chunking keeps the working set cache-resident.
    """
    rays_o, rays_d = get_rays_np(H, W, focal, pose)
    rays_o = rays_o.reshape(-1, 3).astype(np.float32)
    rays_d = rays_d.reshape(-1, 3).astype(np.float32)
    t = np.linspace(near, far, n_samples, dtype=np.float32)
    dists_t = np.diff(t, append=np.float32(1e10)).astype(np.float32)

    out = np.empty((rays_o.shape[0], 3), dtype=np.float32)
    for s in range(0, rays_o.shape[0], chunk):
        o = rays_o[s : s + chunk]
        d = rays_d[s : s + chunk]
        pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
        sigma, albedo = _scene_density_color(pts.reshape(-1, 3))
        sigma = sigma.reshape(-1, n_samples)
        albedo = albedo.reshape(-1, n_samples, 3)

        dists = dists_t[None, :] * np.linalg.norm(d, axis=-1, keepdims=True)
        alpha = 1.0 - np.exp(-sigma * dists)
        trans = np.cumprod(
            np.concatenate(
                [np.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1] + 1e-10],
                axis=-1,
            ),
            axis=-1,
        )
        weights = alpha * trans
        rgb = np.sum(weights[..., None] * albedo, axis=1)
        acc = np.sum(weights, axis=-1, keepdims=True)
        out[s : s + chunk] = rgb + (1.0 - acc)  # white background
    return np.clip(out, 0.0, 1.0).reshape(H, W, 3)


def make_synthetic_scene(
    outdir: str,
    n_train: int = 12,
    n_val: int = 3,
    n_test: int = 3,
    img_wh: Tuple[int, int] = (64, 64),
    radius: float = 4.0,
    camera_angle_x: float = 0.6911112070083618,  # Lego's FOV
    seed: int = 0,
) -> str:
    """Write transforms_{train,val,test}.json + PNGs under ``outdir``."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    W, H = img_wh
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    splits = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in splits.items():
        os.makedirs(os.path.join(outdir, split), exist_ok=True)
        frames = []
        for k in range(n):
            theta = 2.0 * np.pi * (k / max(n, 1)) + rng.uniform(0, 0.3)
            phi = np.deg2rad(rng.uniform(20.0, 50.0))
            eye = radius * np.array(
                [
                    np.cos(theta) * np.cos(phi),
                    np.sin(theta) * np.cos(phi),
                    np.sin(phi),
                ]
            )
            pose = look_at_matrix(eye, np.zeros(3))
            img_linear = render_analytic(
                pose, H, W, focal, near=radius - 2.0, far=radius + 2.0
            )
            # Store as sRGB PNGs (the loader converts back to linear).
            img_srgb = (linear_to_srgb(img_linear) * 255.0).round().astype(np.uint8)
            name = f"r_{k}"
            Image.fromarray(img_srgb).save(
                os.path.join(outdir, split, name + ".png")
            )
            frames.append(
                {
                    "file_path": f"./{split}/{name}",
                    "transform_matrix": pose.tolist(),
                }
            )
        with open(os.path.join(outdir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return outdir


def make_synthetic_llff_scene(
    outdir: str,
    n_images: int = 12,
    img_wh: Tuple[int, int] = (64, 48),
    style: str = "360",
    radius: float = 4.0,
    seed: int = 0,
) -> str:
    """Write an LLFF-layout scene (``poses_bounds.npy`` + ``images/``) of
    the same analytic radiance field.

    ``style="360"`` places cameras on a ring around the object (the
    --spherify workload); ``style="forward"`` clusters them behind the
    object looking down -z (the NDC forward-facing workload). This gives
    the LLFF/spherify paths an honest end-to-end learnability check
    without real captured data (no LLFF scenes ship anywhere).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    W, H = img_wh
    focal = 1.2 * W  # long-ish lens, typical of captured LLFF scenes

    img_dir = os.path.join(outdir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for k in range(n_images):
        if style == "360":
            theta = 2.0 * np.pi * k / n_images
            phi = np.deg2rad(25.0 + 10.0 * rng.uniform())
            eye = radius * np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                np.sin(phi),
            ])
        else:  # forward-facing: small offsets around (0, 0, radius)
            eye = np.array([
                0.35 * rng.uniform(-1, 1),
                0.35 * rng.uniform(-1, 1),
                radius + 0.15 * rng.uniform(-1, 1),
            ])
        pose = look_at_matrix(eye, np.zeros(3))
        dist = float(np.linalg.norm(eye))
        near_k, far_k = dist - 1.5, dist + 1.5
        img = render_analytic(pose, H, W, focal, near=near_k, far=far_k)
        Image.fromarray((np.clip(img, 0, 1) * 255).round().astype(np.uint8)).save(
            os.path.join(img_dir, f"image{k:03d}.png")
        )
        # LLFF stores 3x5 [down | right | back | t | hwf] + 2 depth bounds
        # (the loader's axis correction inverts [right, up, back] to that).
        m = np.concatenate(
            [-pose[:3, 1:2], pose[:3, 0:1], pose[:3, 2:3], pose[:3, 3:4]],
            axis=1,
        )
        hwf = np.array([[H], [W], [focal]], dtype=np.float32)
        rows.append(np.concatenate(
            [np.concatenate([m, hwf], axis=1).ravel(), [near_k, far_k]]
        ))
    np.save(os.path.join(outdir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return outdir
