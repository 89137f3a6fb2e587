"""Compositing math vs closed forms and a numpy oracle
(nerfmlp/renderer.py:114-163)."""

import numpy as np
import jax.numpy as jnp

from nerfmlp_tpu.ops.integrate import composite_rays


def _oracle(raw, z_vals, rays_d, white_bkgd=True):
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1), -1)[..., :-1]
    w = alpha * trans
    rgb_map = (w[..., None] * rgb).sum(-2)
    acc = w.sum(-1)
    if white_bkgd:
        rgb_map = rgb_map + (1 - acc[..., None])
    return rgb_map, (w * z_vals).sum(-1), acc, w


def test_matches_oracle():
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(32, 64, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(32, 64)), -1).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    rgb, depth, acc, w = _oracle(raw, z, d)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth_map"]), depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), acc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, atol=1e-5)


def test_empty_space_is_white():
    raw = np.zeros((4, 16, 4), np.float32)
    raw[..., 3] = -100.0  # relu -> 0 density
    z = np.broadcast_to(np.linspace(2, 6, 16, dtype=np.float32), (4, 16))
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (4, 1))
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)


def test_opaque_wall_depth():
    # A huge density at sample 5 should make depth == z[5] and acc ~ 1.
    raw = np.zeros((1, 16, 4), np.float32)
    raw[..., 3] = -100.0
    raw[0, 5, 3] = 1e5
    raw[0, 5, :3] = 100.0  # sigmoid -> 1.0 red/green/blue
    z = np.broadcast_to(np.linspace(2, 6, 16, dtype=np.float32), (1, 16)).copy()
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    assert abs(float(out["depth_map"][0]) - z[0, 5]) < 1e-3
    assert abs(float(out["acc_map"][0]) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(out["rgb_map"][0]), 1.0, atol=1e-4)


def test_black_background_mode():
    raw = np.zeros((2, 8, 4), np.float32)
    raw[..., 3] = -100.0
    z = np.broadcast_to(np.linspace(2, 6, 8, dtype=np.float32), (2, 8))
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (2, 1))
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=False)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 0.0, atol=1e-6)


def test_direction_norm_scales_alpha():
    # Doubling ||d|| doubles the integration distance -> higher alpha.
    raw = np.zeros((1, 8, 4), np.float32)
    raw[..., 3] = 0.5
    z = np.broadcast_to(np.linspace(2, 6, 8, dtype=np.float32), (1, 8))
    d1 = np.array([[0.0, 0.0, -1.0]], np.float32)
    d2 = np.array([[0.0, 0.0, -2.0]], np.float32)
    w1 = float(composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d1))["weights"][0, 0])
    w2 = float(composite_rays(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d2))["weights"][0, 0])
    assert w2 > w1


def test_far_cap_bounds_last_interval():
    """far_cap replaces the reference's semi-infinite last dist with
    (far_cap - z_last): trailing density then contributes alpha
    1-exp(-sigma*(far-z_last)) instead of 1.0 (r5 — under AABB
    tightening the 1e10 convention turned boundary density noise into an
    opaque backdrop, measured -4.2 dB; render.py passes the
    pre-tightening far)."""
    import jax.numpy as jnp

    from nerfmlp_tpu.ops.integrate import composite_rays

    z = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    # Only the LAST sample carries density; rgb logit 0 -> sigmoid 0.5.
    raw = jnp.zeros((1, 3, 4)).at[0, 2, 3].set(2.0)

    ref = composite_rays(raw, z, d, white_bkgd=True)
    capped = composite_rays(raw, z, d, white_bkgd=True, far_cap=3.5)
    # 1e10 convention: the last sample composites fully (alpha ~ 1).
    np.testing.assert_allclose(float(ref["acc_map"][0]), 1.0, atol=1e-5)
    # Capped: alpha = 1 - exp(-2.0 * 0.5).
    want = 1.0 - np.exp(-2.0 * 0.5)
    np.testing.assert_allclose(float(capped["acc_map"][0]), want, rtol=1e-5)

    # Per-ray caps broadcast; a cap at/below z_last zeroes the interval.
    capped2 = composite_rays(
        raw, jnp.tile(z, (2, 1)), jnp.tile(d, (2, 1)), white_bkgd=True,
        far_cap=jnp.asarray([3.5, 3.0]),
    )
    np.testing.assert_allclose(float(capped2["acc_map"][0]), want, rtol=1e-5)
    np.testing.assert_allclose(float(capped2["acc_map"][1]), 0.0, atol=1e-6)

    # far_cap=None preserves the reference semantics bit-for-bit.
    again = composite_rays(raw, z, d, white_bkgd=True, far_cap=None)
    np.testing.assert_array_equal(
        np.asarray(ref["rgb_map"]), np.asarray(again["rgb_map"])
    )
