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


def _scene_density_color(pts: np.ndarray, xp=np):
    """Analytic radiance field: density (N,) and albedo (N, 3) at points.

    Three soft spheres and one box, all inside |x| < 1.2. ``xp`` selects
    the array backend (numpy default; pass ``jax.numpy`` for the jitted
    GT fast path in ``render_analytic``).
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
    sigma = xp.zeros(pts.shape[0], dtype=f32)
    color_acc = xp.zeros((pts.shape[0], 3), dtype=f32)
    for center, radius, color, peak in blobs:
        d2 = xp.sum((pts - center) ** 2, axis=-1)
        s = peak * xp.exp(-d2 / (2.0 * (radius / 2.0) ** 2))
        sigma = sigma + s
        color_acc = color_acc + s[:, None] * color
    # Box at the bottom (a "ground slab").
    inside = (
        (xp.abs(pts[:, 0]) < 0.9)
        & (xp.abs(pts[:, 1]) < 0.9)
        & (pts[:, 2] > -0.75)
        & (pts[:, 2] < -0.55)
    )
    s_box = xp.where(inside, 25.0, 0.0).astype(np.float32)
    sigma = sigma + s_box
    color_acc = color_acc + s_box[:, None] * np.array(
        [0.85, 0.75, 0.4], dtype=np.float32
    )

    albedo = color_acc / xp.maximum(sigma[:, None], 1e-8)
    albedo = xp.where(sigma[:, None] > 1e-6, albedo, 1.0)
    return sigma, albedo.astype(np.float32)


def _hard_density_color(pts: np.ndarray, xp=np):
    """Hard benchmark field (r5): density (N,) and albedo (N, 3).

    The default scene (``_scene_density_color``) is three smooth blobs and
    a box — every training configuration saturates 40+ dB on it, which
    compresses real quality differences into tenths of a dB. This field
    de-saturates the benchmark with the three ingredients real content's
    difficulty comes from (cf. the reference's own 20-25+ dB expectation
    for real scenes, /root/reference/README.md:223): high-frequency
    albedo, thin repeated geometry, hard edges. Final operating points
    at 400^2/20k steps: golden 36.9 dB, grid-less same-budget 25.7 — an
    11 dB discrimination range where the smooth scene gives tenths.

    Contents, all inside |x| < 1.2 (same AABB as the default scene so the
    occupancy-grid protocol carries over unchanged):
      * a checkered sphere (r 0.55) — 3-D checker albedo with steep tanh
        edges (w=20: half-period ~0.16 world units ~ 22 px from the
        radius-4 cameras at 400^2),
      * thin vertical rods (radius 0.03 ~ 8 px diameter) on a 0.9 grid
        with striped coloring — the classic thin-structure stressor,
      * a ground slab with two-octave sinusoid "noise" texture and a
        sharp-edged top surface for hard occlusion boundaries.

    The parameters are the product of an on-chip calibration loop (r5,
    docs/RESULTS.md "hard-scene certification"): v1 (w=40, 16
    radius-0.02 rods, AA2 ground truth) measured 21.1 dB at 3k steps /
    22.3 at 20k with a flat trajectory; the error map showed ~all
    residual on ROD SILHOUETTES — silhouette error scales with rod count
    x edge length, not edge sharpness, and the AA2 ground truth
    additionally imposed a 29.1 dB point-sampling ceiling a PERFECT
    model cannot beat (measured; aa=1 GT is exactly 3D-consistent and
    removes it). Softening texture alone (v2-v4: w 40->16, thicker rods)
    moved <2 dB; halving the rod count (0.6 -> 0.9 grid) moved +2.8 dB;
    and bounding the previously INFINITE modulo rod lattice to the
    documented scene box (v6 — the unbounded lattice put visible rods
    outside every AABB, deflating all box-restricted samplers by up to
    10 dB) set the final operating points: golden 64+128 = 36.9 dB at
    20k; same-budget 16+48 WITHOUT a grid = 25.7 (the 11 dB spread the
    benchmark exists to expose); occupancy recipes 35.6-37.0. Generate
    with aa=1 and n_samples=512 (thin geometry needs the dense GT
    march).
    """
    f32 = np.float32
    pts = pts.astype(f32)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]

    # (a) Checkered sphere: steep shell, near-binary checker albedo.
    r = xp.sqrt(x * x + y * y + z * z)
    s_sph = (f32(60.0) * xp.exp(-((r / f32(0.55)) ** 8))).astype(f32)
    w = f32(20.0)
    edge = xp.tanh(f32(4.0) * xp.sin(w * x) * xp.sin(w * y) * xp.sin(w * z))
    t = (f32(0.5) + f32(0.5) * edge)[:, None].astype(f32)
    c_sph = t * np.array([0.9, 0.15, 0.1], f32) + (1 - t) * np.array(
        [0.95, 0.85, 0.1], f32
    )
    sigma = s_sph
    color_acc = s_sph[:, None] * c_sph

    # (b) Thin vertical rods on a 0.9 grid, outside the sphere.
    gx = (x + f32(1.35)) % f32(0.9) - f32(0.45)
    gy = (y + f32(1.35)) % f32(0.9) - f32(0.45)
    d_rod = xp.sqrt(gx * gx + gy * gy)
    rod_core = f32(0.5) - f32(0.5) * xp.tanh(
        (d_rod - f32(0.03)) * f32(300.0)
    )  # ~1 inside radius 0.03 (~8 px at 400^2), ~0 outside
    # |x|,|y| < 1.15: the modulo lattice repeats FOREVER without this
    # mask, planting visible rods OUTSIDE the documented |x| < 1.2 scene
    # bound — which silently made every AABB-restricted sampler unable
    # to represent parts of the image (r5: the entire 4-10 dB "occupancy
    # collapse" on this scene was THIS, diagnosed via the
    # hier-with-aabb-but-no-grid control matching the occ scores).
    in_lattice = (xp.abs(x) < 1.15) & (xp.abs(y) < 1.15)
    s_rod = (
        f32(160.0) * rod_core * in_lattice * (xp.abs(z) < 0.85) * (r > 0.62)
    ).astype(f32)
    stripe = (f32(0.5) + f32(0.5) * xp.tanh(
        f32(4.0) * xp.sin(f32(20.0) * z)
    )).astype(f32)
    c_rod = xp.stack(
        [f32(0.05) + f32(0.9) * stripe, f32(0.9) - f32(0.8) * stripe,
         xp.full_like(stripe, f32(0.55))], axis=-1,
    )
    sigma = sigma + s_rod
    color_acc = color_acc + s_rod[:, None] * c_rod

    # (c) Textured ground slab with a sharp top edge.
    in_xy = (xp.abs(x) < 1.05) & (xp.abs(y) < 1.05)
    edge_top = f32(0.5) - f32(0.5) * xp.tanh((z + f32(0.62)) * f32(150.0))
    edge_bot = f32(0.5) + f32(0.5) * xp.tanh((z + f32(0.8)) * f32(150.0))
    s_slab = (f32(120.0) * in_xy * edge_top * edge_bot).astype(f32)
    n1 = xp.sin(f32(13.7) * x + f32(1.3)) * xp.sin(f32(17.9) * y + f32(0.7))
    n2 = xp.sin(f32(31.4) * x - f32(2.1)) * xp.sin(f32(27.2) * y + f32(1.9))
    tex = xp.clip(
        f32(0.55) + f32(0.3) * n1 + f32(0.08) * n2, 0.0, 1.0
    ).astype(f32)
    c_slab = xp.stack(
        [tex, f32(0.55) * tex + f32(0.2), f32(0.35) + f32(0.25) * (1 - tex)],
        axis=-1,
    )
    sigma = sigma + s_slab
    color_acc = color_acc + s_slab[:, None] * c_slab

    # Guard at 1e-3 (not the default field's 1e-6): the steep tanh tails
    # differ between numpy and jax in their last ulps, and dividing by a
    # sub-1e-3 sigma amplifies that into O(1) albedo noise. Density below
    # 1e-3 contributes alpha < 1e-5 per sample — invisible either way.
    albedo = color_acc / xp.maximum(sigma[:, None], 1e-8)
    albedo = xp.where(sigma[:, None] > 1e-3, albedo, 1.0)
    return sigma.astype(f32), albedo.astype(np.float32)


FIELDS = {"default": _scene_density_color, "hard": _hard_density_color}


def _integrate_chunk_np(o, d, t, dists_t, field, xp):
    """One chunk of analytic GT: march ``t`` along rays, composite.

    Backend-agnostic body shared by the numpy path and the jitted jax
    fast path (same equations as ops/integrate.py::composite_rays)."""
    n_samples = t.shape[0]
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    sigma, albedo = field(pts.reshape(-1, 3), xp=xp)
    sigma = sigma.reshape(-1, n_samples)
    albedo = albedo.reshape(-1, n_samples, 3)

    dists = dists_t[None, :] * xp.linalg.norm(d, axis=-1, keepdims=True)
    alpha = 1.0 - xp.exp(-sigma * dists)
    trans = xp.cumprod(
        xp.concatenate(
            [xp.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1] + 1e-10],
            axis=-1,
        ),
        axis=-1,
    )
    weights = alpha * trans
    rgb = xp.sum(weights[..., None] * albedo, axis=1)
    acc = xp.sum(weights, axis=-1, keepdims=True)
    return rgb + (1.0 - acc)  # white background


def render_analytic(
    pose: np.ndarray, H: int, W: int, focal: float, n_samples: int = 192,
    near: float = 2.0, far: float = 6.0, chunk: int = 16384,
    field=None, use_jax: bool = False,
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

    field = field or _scene_density_color
    out = np.empty((rays_o.shape[0], 3), dtype=np.float32)
    if use_jax:
        # Jitted path: ~2 orders of magnitude faster than the numpy loop
        # (the hard field's trig at 400^2 x AA2 x 512 samples costs ~11
        # min/view in numpy). Fixed chunk shape -> one compile; the tail
        # chunk is padded. Runs on whatever backend jax resolved (CPU in
        # tests, the TPU inside a worker job).
        import functools

        import jax
        import jax.numpy as jnp

        fn = jax.jit(functools.partial(
            _integrate_chunk_np, field=field, xp=jnp
        ))
        tj, dj = jnp.asarray(t), jnp.asarray(dists_t)
        for s in range(0, rays_o.shape[0], chunk):
            o = rays_o[s : s + chunk]
            d = rays_d[s : s + chunk]
            n = o.shape[0]
            if n < chunk:
                o = np.pad(o, ((0, chunk - n), (0, 0)))
                d = np.pad(d, ((0, chunk - n), (0, 0)), constant_values=1.0)
            out[s : s + n] = np.asarray(
                fn(jnp.asarray(o), jnp.asarray(d), tj, dj)
            )[:n]
    else:
        for s in range(0, rays_o.shape[0], chunk):
            o = rays_o[s : s + chunk]
            d = rays_d[s : s + chunk]
            out[s : s + chunk] = _integrate_chunk_np(
                o, d, t, dists_t, field, np
            )
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
    field: str = "default",
    aa: int = 1,
    n_samples: int = 192,
    use_jax: bool = False,
) -> str:
    """Write transforms_{train,val,test}.json + PNGs under ``outdir``.

    ``field`` selects the analytic radiance field ("default" smooth scene
    or the "hard" high-frequency benchmark field). ``aa`` supersamples the
    ground truth aa x aa per pixel (box-downsampled in linear RGB) —
    recommended 2 for the hard field so the benchmark measures model
    quality, not point-sampling aliasing in the GT. ``n_samples`` is the
    GT ray-march density (raise for thin geometry)."""
    from PIL import Image

    field_fn = FIELDS[field]
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
                pose, H * aa, W * aa, focal * aa,
                near=radius - 2.0, far=radius + 2.0,
                field=field_fn, n_samples=n_samples, use_jax=use_jax,
            )
            if aa > 1:  # box-downsample in LINEAR RGB (then sRGB-encode)
                img_linear = img_linear.reshape(H, aa, W, aa, 3).mean(
                    axis=(1, 3)
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
