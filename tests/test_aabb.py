"""Per-ray AABB bounds tightening."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.rays import intersect_aabb
from nerfmlp_tpu.ops.render import render_rays


def test_hit_and_miss():
    o = jnp.asarray(np.array([[0.0, 0.0, 4.0], [10.0, 10.0, 4.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], np.float32))
    near, far = intersect_aabb(o, d, [-1, -1, -1], [1, 1, 1], 2.0, 6.0)
    # Ray 0 passes through the box: enters at z=1 (t=3), exits at z=-1 (t=5).
    assert abs(float(near[0]) - 3.0) < 1e-5
    assert abs(float(far[0]) - 5.0) < 1e-5
    # Ray 1 misses: keeps global bounds.
    assert float(near[1]) == 2.0 and float(far[1]) == 6.0


def test_bounds_clamped_to_global():
    o = jnp.asarray(np.array([[0.0, 0.0, 0.5]], np.float32))  # inside the box
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    near, far = intersect_aabb(o, d, [-1, -1, -1], [1, 1, 1], 2.0, 6.0)
    assert float(near[0]) >= 2.0  # clamped up to the global near


def test_render_with_aabb_concentrates_samples():
    cfg = RenderConfig(N_samples=16, N_importance=0, near=2.0, far=6.0,
                       perturb=False, aabb=(-1, -1, -1, 1, 1, 1))
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    # Force positive density everywhere (fresh-init sigma is ~0, which
    # would leave acc=0 and make the depth assertion vacuous).
    params["coarse"]["sigma"]["bias"] = (
        params["coarse"]["sigma"]["bias"] + 5.0
    )
    o = jnp.asarray(np.array([[0.0, 0.0, 4.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    out = render_rays(params, o, d, None, cfg)
    # All samples inside [3, 5] along the ray -> expected depth within
    # those bounds. With the density floor acc is ~1, so this is a REAL
    # assertion, not a vacuously-guarded one.
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    depth = float(out["depth_map"][0])
    acc = float(out["acc_map"][0])
    assert acc > 0.5, acc
    assert 3.0 - 1e-3 <= depth / acc <= 5.0 + 1e-3


def test_aabb_improves_or_matches_quality():
    """On a scene inside the box, AABB sampling can only concentrate
    samples; a few training steps reach a lower loss than without it."""
    import jax.numpy as jnp

    from nerfmlp_tpu.config import TrainConfig
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step
    from nerfmlp_tpu.data.synthetic import render_analytic
    from nerfmlp_tpu.ops.rays import get_rays_np, look_at_matrix

    pose = look_at_matrix([3.0, 0.0, 1.5], [0, 0, 0])
    H = W = 24
    img = render_analytic(pose, H, W, 30.0, near=1.5, far=5.5)
    o, d = get_rays_np(H, W, 30.0, pose)
    batch = np.concatenate(
        [o.reshape(-1, 3), d.reshape(-1, 3), img.reshape(-1, 3)], -1
    ).astype(np.float32)

    def run(aabb):
        rc = RenderConfig(N_samples=16, N_importance=16, near=1.5, far=5.5,
                          perturb=True, aabb=aabb)
        tc = TrainConfig(batch_size=batch.shape[0])
        state = create_train_state(rc, tc)
        step = make_train_step(rc, tc)
        for _ in range(30):
            state, m = step(state, jnp.asarray(batch))
        return float(m["loss"])

    loss_plain = run(None)
    loss_aabb = run((-1.3, -1.3, -1.0, 1.3, 1.3, 1.3))
    assert loss_aabb < loss_plain * 1.5  # not worse; usually better


def test_aabb_respects_explicit_near_far():
    """Explicit near/far overrides must bound the slab test, not cfg's."""
    cfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                       perturb=False, aabb=(-1, -1, -1, 1, 1, 1))
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    params["coarse"]["sigma"]["bias"] = (
        params["coarse"]["sigma"]["bias"] + 5.0  # density floor: acc ~1
    )
    o = jnp.asarray(np.array([[10.0, 10.0, 4.0]], np.float32))  # misses box
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    out = render_rays(params, o, d, None, cfg, near=3.5, far=4.5)
    # Miss -> falls back to the EXPLICIT bounds: depth stays in [3.5, 4.5],
    # and samples never use cfg's 2/6 (unconditional: acc is forced ~1).
    depth = float(out["depth_map"][0])
    acc = float(out["acc_map"][0])
    assert acc > 0.5, acc
    assert 3.5 - 1e-3 <= depth / acc <= 4.5 + 1e-3


def test_render_image_per_ray_bounds():
    """render_image must slice per-ray near/far arrays per tile (was a
    broadcast crash)."""
    from nerfmlp_tpu.ops.render import render_image

    cfg = RenderConfig(N_samples=8, N_importance=0, perturb=False)
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    H = W = 5  # 25 rays, tile 16 -> pad to 32
    o = jnp.zeros((H * W, 3)).at[:, 2].set(4.0)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (H * W, 1))
    near = jnp.full((H * W,), 2.0)
    far = jnp.full((H * W,), 6.0)
    img = render_image(params, o, d, H, W, cfg, tile=16, near=near, far=far)
    assert img.shape == (H, W, 3)
    assert np.isfinite(np.asarray(img)).all()
