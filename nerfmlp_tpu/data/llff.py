"""LLFF forward-facing real-scene loader with NDC ray parameterization.

The reference package has no LLFF support; it is the explicitly listed
extension surface (NOTES.md:164-170, BASELINE.json config 4) with behavior
defined by the vendored oracle (example/run_nerf.py:587-613: poses_bounds
loading, near/far from bounds * 0.9 / 1.0, or NDC [0, 1]).

Format: ``poses_bounds.npy`` of shape (N, 17) — 15 = 3x5 pose (R | t | hwf)
+ 2 depth bounds — alongside an ``images/`` (or ``images_{factor}/``)
directory, the de-facto LLFF layout produced by COLMAP2LLFF.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / (np.linalg.norm(v) + 1e-12)


def _viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Camera-to-world (3, 4) from a forward (+z back) axis, up hint, pos."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def _focus_point(poses: np.ndarray) -> np.ndarray:
    """Point minimizing summed squared distance to all camera optical axes
    (the 360-capture "center of attention"). Least-squares over the
    projectors perpendicular to each axis."""
    d = poses[:, :3, 2]
    d = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    proj = np.eye(3)[None] - d[:, :, None] * d[:, None, :]  # (N, 3, 3)
    lhs = proj.mean(axis=0)
    rhs = (proj @ poses[:, :3, 3:4]).mean(axis=0)[:, 0]
    # lstsq (not solve): parallel optical axes make lhs singular — the
    # min-norm solution picks the point on the shared axis nearest origin
    # instead of crashing on degenerate (e.g. forward-facing) rigs.
    return np.linalg.lstsq(lhs, rhs, rcond=None)[0]


def spherify_poses(poses: np.ndarray, bounds: np.ndarray):
    """360-capture normalization (oracle flag --spherify, run_nerf.py:548):
    recenters the rig on the point the cameras look at, rescales so the
    average camera sits on a unit sphere, and builds a circular render path
    at the rig's mean height looking at the center (behavioral parity with
    the original load_llff spherify; the generating load_llff.py is imported
    by the oracle but absent from its repo, run_nerf.py:12).

    Returns (poses (N,4,4), render_poses (120,4,4), bounds, scale).
    """
    center = _focus_point(poses)
    up_raw = (poses[:, :3, 3] - center).mean(axis=0)
    if np.linalg.norm(up_raw) < 1e-6:
        # Degenerate rig (cameras centered on the focus point — e.g. a
        # forward-facing capture fed through --spherify): fall back to the
        # cameras' own mean up axis instead of a zero vector.
        up_raw = poses[:, :3, 1].sum(axis=0)
    up = _normalize(up_raw)
    # World frame with z = up, origin at the center (the arbitrary seed
    # vector just needs to be non-parallel to up).
    x = _normalize(np.cross(np.array([0.1, 0.2, 0.3]), up))
    y = _normalize(np.cross(up, x))
    frame = np.eye(4, dtype=np.float32)
    frame[:3, 0], frame[:3, 1], frame[:3, 2], frame[:3, 3] = x, y, up, center
    poses = (np.linalg.inv(frame)[None] @ poses).astype(np.float32)

    rad = float(np.sqrt(np.mean(np.sum(poses[:, :3, 3] ** 2, axis=-1))))
    sc = 1.0 / rad
    poses[:, :3, 3] *= sc
    bounds = bounds * sc

    zh = float(poses[:, :3, 3].mean(axis=0)[2])
    radcircle = float(np.sqrt(max(1.0 - zh * zh, 1e-6)))
    render = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120, endpoint=False):
        pos = np.array(
            [radcircle * np.cos(th), radcircle * np.sin(th), zh],
            dtype=np.float32,
        )
        back = _normalize(pos)  # camera +z points away from the origin
        right = _normalize(np.cross(back, np.array([0.0, 0.0, -1.0])))
        upv = _normalize(np.cross(back, right))
        p = np.eye(4, dtype=np.float32)
        p[:3, 0], p[:3, 1], p[:3, 2], p[:3, 3] = right, upv, back, pos
        render.append(p)
    return poses, np.stack(render), bounds, sc


def spiral_render_poses(
    poses: np.ndarray,
    bounds: np.ndarray,
    n_frames: int = 120,
    n_rots: int = 2,
    zrate: float = 0.5,
) -> np.ndarray:
    """Forward-facing spiral path around the average (recentered) pose —
    the trajectory the oracle's LLFF i_video renders (run_nerf.py:845-851;
    path semantics from the original load_llff spiral: focus depth from
    the depth bounds, radii from the 90th percentile of camera offsets).
    """
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :4] = _viewmatrix(
        _normalize(poses[:, :3, 2].sum(axis=0)),
        poses[:, :3, 1].sum(axis=0),
        poses[:, :3, 3].mean(axis=0),
    )
    up = _normalize(poses[:, :3, 1].sum(axis=0))
    close, far = float(bounds.min()) * 0.9, float(bounds.max()) * 5.0
    dt = 0.75
    focus = 1.0 / ((1.0 - dt) / close + dt / far)
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0)

    out = []
    for th in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames, endpoint=False):
        offset = np.array(
            [np.cos(th), -np.sin(th), -np.sin(th * zrate)], dtype=np.float32
        ) * rads
        pos = c2w[:3, 3] + c2w[:3, :3] @ offset
        look = c2w[:3, 3] + c2w[:3, :3] @ np.array([0.0, 0.0, -focus], np.float32)
        back = _normalize(pos - look)
        p = np.eye(4, dtype=np.float32)
        p[:3, :4] = _viewmatrix(back, up, pos)
        out.append(p)
    return np.stack(out)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Rigidly transform all (N, 4, 4) c2w poses so their AVERAGE pose is
    the identity (cameras centered at the origin, mean view along -z).

    COLMAP world frames are arbitrary; the NDC projection (and the [0,1]
    depth convention) assumes the forward-facing rig looks down -z, so this
    recentering is a correctness prerequisite, not cosmetics (behavioral
    parity with the original load_llff recentering).
    """
    center = poses[:, :3, 3].mean(axis=0)
    vec2 = _normalize(poses[:, :3, 2].sum(axis=0))
    up = poses[:, :3, 1].sum(axis=0)
    avg = np.eye(4, dtype=np.float32)
    avg[:3, :4] = _viewmatrix(vec2, up, center)
    return (np.linalg.inv(avg)[None] @ poses).astype(np.float32)


class LLFFDataset:
    """Forward-facing scene; same surface as BlenderDataset
    (all_rays_*, image_rays, n_images, H/W, focal, dynamic_near_far)."""

    def __init__(
        self,
        datadir: str,
        split: str = "train",
        img_wh: Tuple[int, int] = (504, 378),
        white_bkgd: bool = False,  # real photos: no alpha
        llffhold: int = 8,          # every Nth image is val/test (run_nerf.py:600)
        use_ndc: bool = True,
        apply_srgb_to_linear: bool = False,
        bd_factor: float = 0.75,    # depth-bound rescale (load_llff semantics)
        recenter: bool = True,
        spherify: bool = False,     # 360 capture (oracle --spherify)
        factor: int = 0,            # explicit images_{factor}/ dir (oracle --factor)
        keep_aspect: bool = True,   # snap H to the capture's aspect; pass
                                    # False to honor a deliberately
                                    # non-native img_wh (rays/GT then use
                                    # the squashed vertical FOV as-is)
        **_,
    ):
        self.datadir = datadir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.spherify = spherify
        # NDC assumes a forward-facing rig looking down -z; a spherified
        # 360 capture violates that, so spherify implies metric rays
        # (the oracle pairs --spherify with --no_ndc).
        self.use_ndc = use_ndc and not spherify
        W, H = img_wh
        self.H, self.W = H, W

        pb = np.load(os.path.join(datadir, "poses_bounds.npy"))  # (N, 17)
        poses = pb[:, :15].reshape(-1, 3, 5)
        self.bounds = pb[:, 15:17]

        # LLFF poses are [down, right, back] — rotate to [right, up, back]
        # (the correction the original load_llff.py applies).
        poses = np.concatenate(
            [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2
        )
        hwf = poses[0, :, 4]
        orig_h, orig_w, orig_f = hwf
        # One scalar focal serves both axes, so the requested resolution
        # must preserve the capture's aspect ratio — otherwise the
        # vertical FOV of the rays stops matching the (squashed) resized
        # GT images and every PSNR/SSIM computed against them is wrong.
        # Snap height rather than erroring: callers commonly pass square
        # defaults (e.g. --quick_val_res 256 256) to 4:3 captures.
        if abs(H / W - orig_h / orig_w) > 0.01:
            if keep_aspect:
                H = max(1, int(round(W * orig_h / orig_w)))
                self.img_wh = (W, H)
                self.H = H
                print(f"(llff: snapped height to preserve the capture's "
                      f"aspect: {W}x{H}; pass keep_aspect=False to force "
                      f"the requested size)")
            else:
                import warnings

                warnings.warn(
                    f"llff: honoring non-native aspect {W}x{H} "
                    f"(capture is {int(orig_w)}x{int(orig_h)}) — vertical "
                    f"FOV will not match the resized GT"
                )
        self.focal = float(orig_f * W / orig_w)

        c2w = np.tile(np.eye(4, dtype=np.float32), (poses.shape[0], 1, 1))
        c2w[:, :3, :4] = poses[:, :, :4]

        # Rescale so the nearest depth bound sits at 1/bd_factor, then
        # recenter the rig so the average pose is identity — both are
        # prerequisites for the NDC projection's -z/[0,1] conventions.
        if bd_factor:
            sc = 1.0 / (float(self.bounds.min()) * bd_factor)
            c2w[:, :3, 3] *= sc
            self.bounds = self.bounds * sc
        if recenter:
            c2w = recenter_poses(c2w)
        self._spherify_render_poses = None
        if spherify:
            c2w, self._spherify_render_poses, self.bounds, _ = spherify_poses(
                c2w, self.bounds
            )
        self.poses = c2w.astype(np.float32)
        # Metric near/far must come from the FULL capture's bounds, before
        # the train/val holdout split — the oracle derives them from all
        # bds (run_nerf.py:608-610), so train and test agree. The full
        # (pre-split) poses feed the spiral render path.
        self._full_bounds = self.bounds.copy()
        self._full_poses = self.poses.copy()

        # --factor selects images_{factor}/ explicitly (oracle semantics:
        # the original load_llff minifies images/ into that directory when
        # absent); otherwise pick the smallest pre-downsampled set that
        # still covers the requested resolution (LLFF scenes ship images/
        # at ~12MP alongside images_2/4/8 — decoding full-res to
        # downsample to 504px wastes 10-60x the IO).
        if factor and factor > 1:
            img_dir = self._ensure_factor_dir(datadir, factor)
        else:
            img_dir = self._pick_image_dir(datadir, W)
        if img_dir is None:
            raise FileNotFoundError(f"no images*/ directory under {datadir}")
        files = sorted(
            f for f in os.listdir(img_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if len(files) != self.poses.shape[0]:
            raise ValueError(
                f"{len(files)} images vs {self.poses.shape[0]} poses"
            )

        idxs = np.arange(len(files))
        if llffhold <= 0 and split != "train":
            raise ValueError(
                f"llffhold={llffhold} leaves the '{split}' split empty — "
                f"holdout views come from every Nth image "
                f"(run_nerf.py:600); use llffhold >= 1"
            )
        hold = idxs[::llffhold] if llffhold > 0 else idxs[:0]
        keep = (
            np.setdiff1d(idxs, hold) if split == "train" else hold
        )
        self.poses = self.poses[keep]
        self.bounds = self.bounds[keep]

        from PIL import Image

        imgs = []
        for i in keep:
            img = Image.open(os.path.join(img_dir, files[i])).convert("RGB")
            img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
            imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
        self.images = np.stack(imgs, axis=0)
        if apply_srgb_to_linear:
            from nerfmlp_tpu.data.blender import srgb_to_linear

            self.images = srgb_to_linear(self.images)

        self._generate_rays()

    @staticmethod
    def _ensure_factor_dir(datadir: str, factor: int) -> str:
        """images_{factor}/ path, minifying from images/ with PIL when it
        does not exist yet (the original load_llff's _minify shells out to
        imagemagick; PIL-LANCZOS is the dependency-free equivalent)."""
        out_dir = os.path.join(datadir, f"images_{factor}")
        src_dir = os.path.join(datadir, "images")

        def _n_imgs(d):
            return sum(
                f.lower().endswith((".png", ".jpg", ".jpeg"))
                for f in os.listdir(d)
            )

        if os.path.isdir(out_dir) and _n_imgs(out_dir):
            # Complete = same image count as the source; with no images/
            # source it is a pre-minified capture — trust it. On a
            # MISMATCH, never silently delete: images_{N}/ may hold an
            # official downsample (imagemagick) that a PIL rebuild would
            # irreversibly replace with different pixels. Error with the
            # fix instead.
            if not os.path.isdir(src_dir) or _n_imgs(out_dir) == _n_imgs(src_dir):
                return out_dir
            raise ValueError(
                f"{out_dir} has {_n_imgs(out_dir)} images but {src_dir} "
                f"has {_n_imgs(src_dir)} — the downsample dir looks "
                f"incomplete (killed minify run?) or images/ changed. "
                f"Delete {out_dir} to rebuild it, or fix images/."
            )
        if not os.path.isdir(src_dir):
            raise FileNotFoundError(
                f"--factor {factor}: neither {out_dir} nor {src_dir} exists"
            )
        from PIL import Image

        # Minify into a temp dir and rename on completion: a killed run
        # must not leave a partial images_{factor}/ that every later load
        # would treat as complete (it would fail the images-vs-poses count
        # check with no hint that deleting the dir fixes it).
        import shutil

        tmp_dir = out_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.isdir(out_dir):
            # Only a truly empty out_dir may be replaced: non-image
            # contents (e.g. an official downsample in an extension
            # _n_imgs doesn't count, like .tif) must never be silently
            # deleted and re-minified with different pixels.
            if os.listdir(out_dir):
                raise ValueError(
                    f"{out_dir} exists but holds no recognized images "
                    f"(.png/.jpg/.jpeg) — delete it to rebuild from "
                    f"{src_dir}, or convert its contents"
                )
            shutil.rmtree(out_dir)
        os.makedirs(tmp_dir)
        for f in sorted(os.listdir(src_dir)):
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            with Image.open(os.path.join(src_dir, f)) as im:
                im = im.resize(
                    (im.size[0] // factor, im.size[1] // factor),
                    Image.Resampling.LANCZOS,
                )
                im.save(os.path.join(tmp_dir, f))
        os.replace(tmp_dir, out_dir)
        return out_dir

    def render_poses(self, n_frames: int = 120) -> np.ndarray:
        """Video trajectory: circular orbit for spherified 360 captures,
        spiral around the average pose for forward-facing rigs — computed
        from the FULL capture (pre-holdout), like the oracle's
        render_poses (run_nerf.py:593-599)."""
        if self._spherify_render_poses is not None:
            rp = self._spherify_render_poses
            if n_frames != rp.shape[0]:
                idx = np.linspace(0, rp.shape[0], n_frames, endpoint=False)
                rp = rp[idx.astype(int)]
            return rp
        return spiral_render_poses(
            self._full_poses, self._full_bounds, n_frames=n_frames
        )

    @staticmethod
    def _pick_image_dir(datadir: str, want_w: int):
        """Smallest images*/ directory whose width covers ``want_w``;
        falls back to the largest available."""
        from PIL import Image

        cands = []
        for name in sorted(os.listdir(datadir)):
            # Exclude in-flight/stale minify temp dirs (images_N.tmp from
            # a killed _ensure_factor_dir run) — picking one up would
            # resurrect the partial-dir poisoning tmp+rename prevents.
            if name.endswith(".tmp"):
                continue
            if name == "images" or name.startswith("images_"):
                d = os.path.join(datadir, name)
                if not os.path.isdir(d):
                    continue
                files = [f for f in os.listdir(d)
                         if f.lower().endswith((".png", ".jpg", ".jpeg"))]
                if not files:
                    continue
                with Image.open(os.path.join(d, sorted(files)[0])) as im:
                    cands.append((im.size[0], d))
        if not cands:
            return None
        big_enough = [c for c in cands if c[0] >= want_w]
        return min(big_enough)[1] if big_enough else max(cands)[1]

    def _generate_rays(self) -> None:
        from nerfmlp_tpu.ops.rays import get_rays_np, ndc_rays

        ro, rd, rgb, vds = [], [], [], []
        for k in range(self.poses.shape[0]):
            o, d = get_rays_np(self.H, self.W, self.focal, self.poses[k])
            o = o.reshape(-1, 3).astype(np.float32)
            d = d.reshape(-1, 3).astype(np.float32)
            if self.use_ndc:
                import jax.numpy as jnp

                # View directions must be the WORLD-space directions,
                # captured BEFORE the NDC reparameterization — the oracle
                # computes viewdirs first (example/run_nerf.py:297-312).
                vds.append(
                    (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
                        np.float32
                    )
                )
                o_n, d_n = ndc_rays(
                    self.H, self.W, self.focal, 1.0,
                    jnp.asarray(o.copy()), jnp.asarray(d),
                )
                o, d = np.asarray(o_n), np.asarray(d_n)
            ro.append(o)
            rd.append(d)
        self.all_rays_o = np.concatenate(ro, axis=0)
        self.all_rays_d = np.concatenate(rd, axis=0)
        # Zero-copy view over the contiguous float32 stack (same layout as
        # the ray pool) — a copy here doubles RGB host RAM (blender.py:115).
        self.all_rgbs = self.images.reshape(-1, 3)
        # World-space view directions (None when rays are already metric).
        self.all_viewdirs = np.concatenate(vds, axis=0) if vds else None

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

    def image_viewdirs(self, idx: int):
        """World-space view directions for one image (None for metric rays)."""
        if self.all_viewdirs is None:
            return None
        n = self.H * self.W
        return self.all_viewdirs[idx * n : (idx + 1) * n]

    def dynamic_near_far(self) -> Tuple[float, float]:
        """NDC: [0, 1] (run_nerf.py:606-608); else FULL-capture bounds
        * 0.9 / 1.0 (identical for every split)."""
        if self.use_ndc:
            return 0.0, 1.0
        return (
            float(self._full_bounds.min() * 0.9),
            float(self._full_bounds.max() * 1.0),
        )
