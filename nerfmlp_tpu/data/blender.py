"""Blender-synthetic dataset loader (NeRF ``transforms_{split}.json`` format).

Preprocessing parity with nerfmlp/data.py:24-104:
  * RGBA load, LANCZOS resize to ``img_wh``, /255,
  * white-background alpha compositing ``rgb*a + (1-a)`` (data.py:50-59),
  * sRGB -> linear gamma conversion (data.py:8-22) — this shifts PSNR by
    whole dB, so it is applied identically,
  * focal = 0.5 * W / tan(0.5 * camera_angle_x) (data.py:74),
  * all rays for all images pre-generated on host and flattened
    (data.py:76-94) — kept, because the whole Lego ray pool at 800^2 is
    ~1.2 GB of host RAM and streaming shuffled batches from it is exactly
    the access pattern TPU input pipelines want. MEASURED at full scale
    (r5, docs/RESULTS.md "800x800 full-scale run"): a 64-view 800^2 pool
    (40.96M rays, ~1.5 GB) sits device-resident through the device pool
    for a 50k-step certified-recipe run — 2.5 ms/iter median dispatch,
    flat host RSS, full-val 43.9 dB.

This is a plain-numpy class (no torch Dataset): batching is done by
:class:`nerfmlp_tpu.data.pipeline.RayBatchLoader`.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


def srgb_to_linear(img: np.ndarray) -> np.ndarray:
    """Standard sRGB -> linear transfer (data.py:8-22)."""
    img = img.astype(np.float32)
    return np.where(
        img <= 0.04045, img / 12.92, np.power((img + 0.055) / 1.055, 2.4)
    )


def linear_to_srgb(img: np.ndarray) -> np.ndarray:
    """Inverse transfer for display (render_example.py:12-26)."""
    img = np.clip(img.astype(np.float32), 0.0, 1.0)
    return np.where(
        img <= 0.0031308, img * 12.92, 1.055 * np.power(img, 1.0 / 2.4) - 0.055
    )


class BlenderDataset:
    """Images, poses, focal and flattened per-pixel rays for one split."""

    def __init__(
        self,
        datadir: str,
        split: str = "train",
        img_wh: Tuple[int, int] = (400, 400),
        white_bkgd: bool = True,
        apply_srgb_to_linear: bool = True,
        testskip: int = 1,
    ):
        self.datadir = datadir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.white_bkgd = white_bkgd

        with open(os.path.join(datadir, f"transforms_{split}.json")) as f:
            self.meta = json.load(f)

        frames = self.meta["frames"]
        if testskip > 1 and split != "train":
            frames = frames[::testskip]

        images, poses = [], []
        for frame in frames:
            name = frame["file_path"].split("/")[-1]
            fname = os.path.join(datadir, split, name + ".png")
            img = self._load_image(fname)
            images.append(img)
            poses.append(np.array(frame["transform_matrix"], dtype=np.float32))
        self.images = np.stack(images, axis=0)  # (N, H, W, 3)
        self.poses = np.stack(poses, axis=0)    # (N, 4, 4)
        self.apply_srgb_to_linear = apply_srgb_to_linear
        if apply_srgb_to_linear:
            self.images = srgb_to_linear(self.images)

        W, H = self.img_wh
        self.H, self.W = H, W
        self.focal = float(
            0.5 * W / np.tan(0.5 * self.meta["camera_angle_x"])
        )
        self._generate_rays()

    def _load_image(self, fname: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(fname).convert("RGBA")
        img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
        img = np.asarray(img, dtype=np.float32) / 255.0
        rgb, alpha = img[..., :3], img[..., 3:]
        if self.white_bkgd:
            rgb = rgb * alpha + (1.0 - alpha)
        else:
            rgb = rgb * alpha
        return rgb

    def _generate_rays(self) -> None:
        """Precompute all rays; pinhole math matches data.py:79-87."""
        from nerfmlp_tpu.ops.rays import get_rays_np

        n = len(self.images)
        ro, rd = [], []
        for k in range(n):
            o, d = get_rays_np(self.H, self.W, self.focal, self.poses[k])
            ro.append(o.reshape(-1, 3).astype(np.float32))
            rd.append(d.reshape(-1, 3).astype(np.float32))
        self.all_rays_o = np.concatenate(ro, axis=0)
        self.all_rays_d = np.concatenate(rd, axis=0)
        # Zero-copy view of the contiguous image stack (per-image flats
        # concatenated in order == one big reshape); a copy here doubles
        # RGB host RAM (~0.75 GB for Lego train at 800^2).
        self.all_rgbs = self.images.reshape(-1, 3)

    def __len__(self) -> int:
        return self.all_rays_o.shape[0]

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    def image_rays(self, idx: int):
        """(rays_o, rays_d, rgb) for one whole image — used by validation,
        which renders held-out images rather than shuffled ray subsets
        (deliberate fix of the reference's ray-subset SSIM, SURVEY §3.3)."""
        n = self.H * self.W
        sl = slice(idx * n, (idx + 1) * n)
        return (
            self.all_rays_o[sl],
            self.all_rays_d[sl],
            self.all_rgbs[sl].reshape(self.H, self.W, 3),
        )

    def render_poses(self, n_frames: int = 40) -> np.ndarray:
        """Orbit trajectory for video rendering (the oracle's i_video
        renders load_blender's 40-pose spherical orbit, run_nerf.py:845-851;
        elevation -30 deg). Radius is derived from the capture's mean
        camera distance (== the original's hardcoded 4.0 on real Blender
        scenes) so synthetic scenes at other scales orbit correctly."""
        from nerfmlp_tpu.ops.rays import blender_render_poses, mean_camera_radius

        return blender_render_poses(
            n_frames=n_frames, radius=mean_camera_radius(self.poses)
        )

    def dynamic_near_far(self) -> Tuple[float, float]:
        """Scene bounds heuristic with spherical-camera detection
        (scripts/train.py:233-253): if all camera distances from the origin
        are (nearly) equal, use [0.5R, 2R]; otherwise min/max -/+ 0.5."""
        positions = self.poses[:, :3, 3]
        dists = np.linalg.norm(positions, axis=-1)
        if dists.std() < 0.01:
            center = positions.mean(axis=0)
            radius = float(np.linalg.norm(positions - center, axis=-1).max())
            return max(0.1, 0.5 * radius), 2.0 * radius
        return max(0.1, float(dists.min()) - 0.5), float(dists.max()) + 0.5
