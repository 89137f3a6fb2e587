"""Volume integration: raw network outputs -> pixel values.

Behavioral parity with nerfmlp/renderer.py:114-163 (_raw2outputs), which is
itself the official raw2outputs (example/run_nerf.py:48-112):

  dists_i = z_{i+1} - z_i  (last = 1e10), scaled by ||rays_d||
  rgb     = sigmoid(raw[..., :3])
  alpha   = 1 - exp(-relu(sigma + noise) * dists)
  T_i     = prod_{j<i} (1 - alpha_j + 1e-10)      (exclusive cumprod)
  w_i     = alpha_i * T_i
  rgb_map = sum w_i rgb_i  (+ (1 - acc) white background)

All ops are elementwise/VPU except the cumprod scan; XLA fuses the whole
composite into the surrounding kernel. ``disp_map`` is the official extra
(example/run_nerf.py:96-98) the reference package dropped.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def composite_rays(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = True,
    far_cap: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """raw: (N, S, 4), z_vals: (N, S), rays_d: (N, 3) -> map dict.

    Returns rgb_map (N,3), depth_map (N,), disp_map (N,), acc_map (N,),
    weights (N,S).

    ``far_cap``: optional scalar or (N,)/(N,1) depth bounding the LAST
    sample's interval instead of the reference's semi-infinite 1e10
    (renderer.py:121). The 1e10 convention assumes the last sample sits
    at scene infinity; under per-ray AABB tightening it sits at the BOX
    EXIT, where it amplifies any trailing density noise into an opaque
    backdrop that the white-background composite then has to fight —
    measured r5: this alone cost the 16+48-aabb config 4.2 dB held-out
    on the hard scene (21.4 -> 17.2). With the cap, space beyond the box
    contributes exactly nothing — the box's own emptiness assertion.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if far_cap is None:
        last = jnp.full_like(dists[..., :1], 1e10)
    else:
        far_cap = jnp.asarray(far_cap, z_vals.dtype)
        if far_cap.ndim == z_vals.ndim - 1:   # per-ray (N,) -> (N, 1)
            far_cap = far_cap[..., None]
        far_cap = jnp.broadcast_to(far_cap, z_vals[..., :1].shape)
        last = jnp.maximum(far_cap - z_vals[..., -1:], 0.0)
    dists = jnp.concatenate([dists, last], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if rng is None:
            raise ValueError("composite_rays(raw_noise_std>0) needs an rng key")
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    # Exclusive cumulative product of survival probabilities.
    ones = jnp.ones_like(alpha[..., :1])
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * transmittance

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "depth_map": depth_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
    }
