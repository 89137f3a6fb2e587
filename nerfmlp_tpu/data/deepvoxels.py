"""DeepVoxels dataset loader (Sitzmann et al. synthetic captures).

The oracle trains on ``--dataset_type deepvoxels`` via ``load_dv_data``
(example/run_nerf.py:630-642) with hemisphere bounds ``near/far =
mean(||t||) -/+ 1`` — but the loader module itself (``load_deepvoxels.py``)
is absent from the reference tree (imported at run_nerf.py:13, noted in
SURVEY §2.3), so this file implements the *public DeepVoxels release
format* from scratch against the oracle's integration contract:

  ``basedir/{train|validation|test}/{scene}/``
    ``intrinsics.txt``  — line 1: ``f cx cy 0``; line 2: grid barycenter;
                          line 3: near plane; line 4: scale;
                          line 5: ``height width`` of the stored images
    ``pose/*.txt``      — 16 whitespace-separated floats, row-major 4x4
                          camera-to-world in OpenCV axes (x right, y down,
                          z forward)
    ``rgb/*.png``       — RGB images (white background baked in — the
                          oracle's white_bkgd flag help says "always use
                          for dvoxels" precisely because no compositing is
                          needed, run_nerf.py:543-545)

Poses are converted OpenCV -> OpenGL/NeRF axes (y up, z backward) by
negating the y and z basis columns, which is what every NeRF-family
loader does for this dataset; ray generation then shares
``ops/rays.get_rays_np`` with the other loaders.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

# Split-name mapping: our CLI uses train/val/test everywhere; the
# DeepVoxels release names the middle split "validation".
_SPLIT_DIRS = {"train": "train", "val": "validation", "test": "test"}

# OpenCV -> OpenGL camera-axes flip (negate y/down -> y/up, z/forward ->
# z/backward), applied to the rotation+translation columns of c2w.
_CV_TO_GL = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


def parse_intrinsics(path: str) -> dict:
    """Parse a DeepVoxels ``intrinsics.txt`` (format in module docstring)."""
    with open(path) as f:
        f_cx_cy = [float(v) for v in f.readline().split()]
        barycenter = np.array(
            [float(v) for v in f.readline().split()], dtype=np.float32
        )
        near_plane = float(f.readline())
        scale = float(f.readline())
        hw = [float(v) for v in f.readline().split()]
    return {
        "focal": f_cx_cy[0],
        "cx": f_cx_cy[1],
        "cy": f_cx_cy[2],
        "barycenter": barycenter,
        "near_plane": near_plane,
        "scale": scale,
        "height": int(hw[0]),
        "width": int(hw[1]),
    }


def load_pose(path: str) -> np.ndarray:
    """One ``pose/*.txt``: 16 floats, row-major 4x4 c2w (OpenCV axes)."""
    vals = np.loadtxt(path, dtype=np.float32).reshape(4, 4)
    return vals


class DeepVoxelsDataset:
    """Same interface as :class:`BlenderDataset` (H/W/focal/poses/rays)."""

    def __init__(
        self,
        datadir: str,
        split: str = "train",
        img_wh: Tuple[int, int] = (512, 512),
        shape: str = "greek",
        white_bkgd: bool = True,  # accepted for interface parity; unused
        apply_srgb_to_linear: bool = False,
        testskip: int = 1,
    ):
        self.datadir = datadir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.shape = shape

        base = os.path.join(datadir, _SPLIT_DIRS[split], shape)
        if not os.path.isdir(base):
            # Some mirrors drop the scene level for single-scene dumps.
            alt = os.path.join(datadir, _SPLIT_DIRS[split])
            if os.path.isdir(os.path.join(alt, "rgb")):
                base = alt
            else:
                raise FileNotFoundError(base)

        intr = parse_intrinsics(os.path.join(base, "intrinsics.txt"))
        W, H = self.img_wh
        self.H, self.W = H, W
        # Focal was calibrated for the stored resolution; rescale to ours.
        self.focal = float(intr["focal"] * W / intr["width"])
        self.intrinsics = intr

        pose_files = sorted(glob.glob(os.path.join(base, "pose", "*.txt")))
        img_files = sorted(glob.glob(os.path.join(base, "rgb", "*.png")))
        if len(pose_files) != len(img_files):
            raise ValueError(
                f"pose/rgb count mismatch in {base}: "
                f"{len(pose_files)} poses vs {len(img_files)} images"
            )
        if testskip > 1 and split != "train":
            pose_files = pose_files[::testskip]
            img_files = img_files[::testskip]

        poses = [load_pose(p) @ _CV_TO_GL for p in pose_files]
        self.poses = np.stack(poses, axis=0).astype(np.float32)
        self.images = np.stack(
            [self._load_image(p) for p in img_files], axis=0
        )
        if apply_srgb_to_linear:
            from nerfmlp_tpu.data.blender import srgb_to_linear

            self.images = srgb_to_linear(self.images)
        self._generate_rays()

    def _load_image(self, fname: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(fname).convert("RGB")
        if img.size != self.img_wh:
            img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
        return np.asarray(img, dtype=np.float32) / 255.0

    def _generate_rays(self) -> None:
        from nerfmlp_tpu.ops.rays import get_rays_np

        ro, rd = [], []
        for k in range(len(self.images)):
            o, d = get_rays_np(self.H, self.W, self.focal, self.poses[k])
            ro.append(o.reshape(-1, 3).astype(np.float32))
            rd.append(d.reshape(-1, 3).astype(np.float32))
        self.all_rays_o = np.concatenate(ro, axis=0)
        self.all_rays_d = np.concatenate(rd, axis=0)
        self.all_rgbs = self.images.reshape(-1, 3)

    def __len__(self) -> int:
        return self.all_rays_o.shape[0]

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    def image_rays(self, idx: int):
        n = self.H * self.W
        sl = slice(idx * n, (idx + 1) * n)
        return (
            self.all_rays_o[sl],
            self.all_rays_d[sl],
            self.all_rgbs[sl].reshape(self.H, self.W, 3),
        )

    def render_poses(self, n_frames: int = 40) -> np.ndarray:
        """Hemisphere orbit at the capture's mean camera radius/elevation
        (the oracle renders load_dv_data's render_poses, which are the
        dataset's own trajectory; absent that file we synthesize the
        matching hemisphere orbit)."""
        from nerfmlp_tpu.ops.rays import blender_render_poses, mean_camera_radius

        t = self.poses[:, :3, 3]
        radius = mean_camera_radius(self.poses)
        elev = float(
            np.degrees(np.arcsin(np.clip(t[:, 2] / np.maximum(
                np.linalg.norm(t, axis=-1), 1e-8), -1, 1))).mean()
        )
        return blender_render_poses(
            n_frames=n_frames, radius=radius, phi_deg=-abs(elev)
        )

    def dynamic_near_far(self) -> Tuple[float, float]:
        """Hemisphere bounds: ``R -/+ 1`` with ``R = mean(||t||)``
        (example/run_nerf.py:640-642)."""
        from nerfmlp_tpu.ops.rays import mean_camera_radius

        hemi_r = mean_camera_radius(self.poses)
        return max(0.05, hemi_r - 1.0), hemi_r + 1.0
