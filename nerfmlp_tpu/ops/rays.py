"""Camera ray generation: pinhole, NDC reparameterization, look-at poses.

Pinhole math matches the reference bit-for-bit (nerfmlp/data.py:79-87 and
example/run_nerf_helpers.py:123-141): for pixel (i, j) with i along width,

  dir_cam = [(i - W/2) / focal, -(j - H/2) / focal, -1]
  rays_d  = dir_cam @ R^T,   rays_o = t   (c2w = [R | t])

NDC follows the original NeRF appendix-C projection for forward-facing
scenes (behavior of example/run_nerf_helpers.py:143-178).

These are pure functions over jnp arrays; numpy arrays work too (they are
coerced), so data loaders can call them on host.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_rays(
    H: int, W: int, focal: float, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All rays of an HxW image. Returns (rays_o, rays_d), each (H, W, 3)."""
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=c2w.dtype), jnp.arange(H, dtype=c2w.dtype), indexing="xy"
    )
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)], axis=-1
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, focal: float, c2w: np.ndarray):
    """Host-side numpy twin of :func:`get_rays` for dataset preprocessing."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], axis=-1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(
    H: int,
    W: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project into NDC space.

    For forward-facing (LLFF) captures: after this transform, sampling z
    linearly in [0, 1] corresponds to sampling disparity linearly between
    the near plane and infinity (original NeRF appendix C; behavioral
    parity with example/run_nerf_helpers.py:143-178).
    """
    # Shift ray origins to the z = -near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    sx = -1.0 / (W / (2.0 * focal))
    sy = -1.0 / (H / (2.0 * focal))

    o0 = sx * rays_o[..., 0] / rays_o[..., 2]
    o1 = sy * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = sx * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = sy * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def intersect_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    box_min,
    box_max,
    near: float,
    far: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [near, far] tightened to the scene's axis-aligned box.

    Slab test; rays that miss the box keep the global bounds (their samples
    see empty space and integrate to background). The reference uses one
    global [near, far] for every ray (renderer.py:52-53), wasting samples
    on empty space — this is an opt-in sample-efficiency improvement
    (``RenderConfig.aabb``), exact for the same rendering equations.
    """
    box_min = jnp.asarray(box_min, dtype=rays_o.dtype)
    box_max = jnp.asarray(box_max, dtype=rays_o.dtype)
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
    t0 = (box_min - rays_o) * inv_d
    t1 = (box_max - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = t_far > jnp.maximum(t_near, 0.0)
    ray_near = jnp.where(hit, jnp.clip(t_near, near, far), near)
    ray_far = jnp.where(hit, jnp.clip(t_far, near, far), far)
    # Guard degenerate intervals (grazing hits).
    ray_far = jnp.maximum(ray_far, ray_near + 1e-3)
    return ray_near, ray_far


def look_at_matrix(
    eye: np.ndarray, target: np.ndarray, up: np.ndarray = None
) -> np.ndarray:
    """Camera-to-world 4x4 for a camera at ``eye`` looking at ``target``.

    NeRF convention: camera looks down its -Z axis (zoom_example.py:21-39).
    """
    eye = np.asarray(eye, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    up = np.asarray([0.0, 0.0, 1.0] if up is None else up, dtype=np.float32)

    forward = eye - target  # camera +Z points away from the target
    forward = forward / (np.linalg.norm(forward) + 1e-12)
    right = np.cross(up, forward)
    if np.linalg.norm(right) < 1e-6:
        # View direction parallel to up (straight top-down/bottom-up
        # camera): fall back to the coordinate axis LEAST aligned with
        # the view direction (a fixed fallback axis could itself be
        # parallel, reproducing the degenerate zero-column rotation).
        up = np.zeros(3, dtype=np.float32)
        up[int(np.argmin(np.abs(forward)))] = 1.0
        right = np.cross(up, forward)
    right = right / (np.linalg.norm(right) + 1e-12)
    true_up = np.cross(forward, right)

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = eye
    return c2w


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """c2w on a sphere: azimuth ``theta``, elevation ``phi`` (degrees),
    distance ``radius`` from the origin, camera looking at the origin.

    This is the camera parameterization of the original NeRF's Blender
    ``render_poses`` (the oracle renders them for its i_video trajectory,
    example/run_nerf.py:845-863; the generating loader load_blender.py is
    imported at run_nerf.py:13 but absent from the repo — behavior follows
    the published NeRF convention: translate by radius along +z, rotate by
    elevation about x, by azimuth about y, then swap into the z-up world).
    """
    theta = np.deg2rad(theta_deg)
    phi = np.deg2rad(phi_deg)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius  # camera at (0, 0, r), -z looks at origin
    rot_x = np.eye(4, dtype=np.float32)
    rot_x[1, 1] = rot_x[2, 2] = np.cos(phi)
    rot_x[1, 2], rot_x[2, 1] = -np.sin(phi), np.sin(phi)
    rot_y = np.eye(4, dtype=np.float32)
    rot_y[0, 0] = rot_y[2, 2] = np.cos(theta)
    rot_y[0, 2], rot_y[2, 0] = -np.sin(theta), np.sin(theta)
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return flip @ rot_y @ rot_x @ c2w


def blender_render_poses(
    n_frames: int = 40, phi_deg: float = -30.0, radius: float = 4.0
) -> np.ndarray:
    """The standard Blender-synthetic orbit: ``n_frames`` azimuths in
    [-180, 180) at elevation ``phi``, distance ``radius`` — the trajectory
    the oracle's i_video events render (run_nerf.py:845-851)."""
    return np.stack(
        [
            pose_spherical(th, phi_deg, radius)
            for th in np.linspace(-180.0, 180.0, n_frames, endpoint=False)
        ],
        axis=0,
    )


def mean_camera_radius(poses: np.ndarray) -> float:
    """Mean distance of (N, 4, 4) c2w camera centers from the origin —
    the shared orbit-radius heuristic (Blender captures sit at 4.0)."""
    return float(np.linalg.norm(poses[:, :3, 3], axis=-1).mean())


def flythrough_poses(
    n_frames: int = 120,
    radius: float = 4.0,
    phi_base_deg: float = -30.0,
    phi_amp_deg: float = 15.0,
    radius_amp: float = 0.12,
    speed_amp: float = 0.15,
    target: np.ndarray = None,
) -> np.ndarray:
    """Seamlessly-looping fly-through: a full orbit with sinusoidal
    altitude (2 cycles), distance (3 cycles), and angular-speed
    (2 cycles, ``speed_amp``) variation, always looking at ``target`` —
    the reference's planned "Interactive Fly-through Demo" (VIDEOS.md:
    47-86: orbital motion, altitude variation, look-at center, speed
    variation, matching start/end for continuous playback), which that
    repo never implemented. Integer cycle counts (and a pure-sinusoid
    phase offset on theta) make frame 0 follow continuously from frame
    n-1.
    """
    target = np.zeros(3, dtype=np.float32) if target is None else np.asarray(target)
    ks = np.arange(n_frames) / n_frames
    poses = []
    for k in ks:
        # theta(0..1) advances one full turn; the sin term modulates the
        # angular velocity (slow/fast phases) without breaking the loop.
        theta = 2.0 * np.pi * k + speed_amp * np.sin(2.0 * np.pi * 2 * k)
        phi = np.deg2rad(phi_base_deg + phi_amp_deg * np.sin(2.0 * np.pi * 2 * k))
        r = radius * (1.0 + radius_amp * np.sin(2.0 * np.pi * 3 * k))
        eye = target + r * np.array(
            [
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                -np.sin(phi),
            ],
            dtype=np.float32,
        )
        poses.append(look_at_matrix(eye, target))
    return np.stack(poses, axis=0)


def spiral_poses(
    radius: float,
    n_frames: int = 120,
    height: float = 0.0,
    target: np.ndarray = None,
    n_rots: float = 1.0,
) -> np.ndarray:
    """Circular/spiral camera trajectory for video rendering.

    TPU-side equivalent of the official pose-path rendering driver
    (example/run_nerf.py:339-375 renders ``render_poses`` trajectories).
    Returns (n_frames, 4, 4) c2w matrices orbiting ``target``.
    """
    target = np.zeros(3, dtype=np.float32) if target is None else np.asarray(target)
    poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames, endpoint=False):
        eye = np.array(
            [radius * np.cos(theta), radius * np.sin(theta), height], dtype=np.float32
        )
        poses.append(look_at_matrix(eye, target))
    return np.stack(poses, axis=0)
