"""Fused Pallas MLP kernel vs the XLA reference path (interpret mode on CPU;
the same kernels compile for real on TPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model, apply_model
from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.pallas_mlp import fused_nerf_mlp
from nerfmlp_tpu.ops.render import render_rays


def _setup(n=300, seed=0):
    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=False)
    params = init_model(jax.random.PRNGKey(seed), cfg.model_config())
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_enc = np.asarray(positional_encoding(jnp.asarray(dirs), 4))
    return cfg, params, jnp.asarray(pts), jnp.asarray(dirs_enc)


def _xla_raw(params, pts, dirs_enc, cfg):
    enc = positional_encoding(pts, cfg.pos_enc_L)
    return apply_model(params, enc, dirs_enc, cfg.model_config())


def test_forward_matches_xla():
    cfg, params, pts, dirs_enc = _setup()
    got = np.asarray(fused_nerf_mlp(params, pts, dirs_enc, cfg, tile=128))
    want = np.asarray(_xla_raw(params, pts, dirs_enc, cfg))
    assert got.shape == want.shape == (300, 4)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_forward_handles_padding():
    # 300 points with tile 128 -> padded to 384; padded lanes must not leak.
    cfg, params, pts, dirs_enc = _setup(n=300)
    full = np.asarray(fused_nerf_mlp(params, pts, dirs_enc, cfg, tile=128))
    head = np.asarray(
        fused_nerf_mlp(params, pts[:128], dirs_enc[:128], cfg, tile=128)
    )
    np.testing.assert_allclose(full[:128], head, atol=1e-5)


def test_grads_match_xla():
    cfg, params, pts, dirs_enc = _setup(n=256)

    def loss_pallas(p):
        raw = fused_nerf_mlp(p, pts, dirs_enc, cfg, tile=128)
        return jnp.mean(jax.nn.sigmoid(raw[:, :3]) ** 2) + jnp.mean(
            jax.nn.relu(raw[:, 3]) * 1e-2
        )

    def loss_xla(p):
        raw = _xla_raw(p, pts, dirs_enc, cfg)
        return jnp.mean(jax.nn.sigmoid(raw[:, :3]) ** 2) + jnp.mean(
            jax.nn.relu(raw[:, 3]) * 1e-2
        )

    g_pallas = jax.grad(loss_pallas)(params)
    g_xla = jax.grad(loss_xla)(params)
    for name in g_xla:
        for leaf in ("kernel", "bias"):
            a = np.asarray(g_pallas[name][leaf])
            b = np.asarray(g_xla[name][leaf])
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3,
                err_msg=f"{name}/{leaf}",
            )


def test_full_render_with_pallas_matches_reference_path():
    # The fused path only engages for bf16 (fp32 falls back to XLA), so
    # compare bf16-pallas against fp32-XLA with a bf16-sized tolerance.
    cfg, params, _, _ = _setup()
    cfg_p = dataclasses.replace(cfg, use_pallas=True, compute_dtype="bfloat16")
    rng = np.random.default_rng(1)
    o = jnp.asarray(np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (16, 1)))
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d = jnp.asarray(d)
    p = {"coarse": params}
    out_ref = render_rays(p, o, d, None, cfg)
    out_pal = render_rays(p, o, d, None, cfg_p)
    np.testing.assert_allclose(
        np.asarray(out_pal["rgb_map"]), np.asarray(out_ref["rgb_map"]), atol=1e-3
    )


def test_train_step_with_pallas_converges():
    """A few optimization steps through the fused kernel reduce the loss."""
    import optax

    cfg, params, pts, dirs_enc = _setup(n=256)
    target = jnp.ones((256, 4)) * jnp.array([0.3, 0.5, 0.7, 1.0])

    def loss_fn(p):
        raw = fused_nerf_mlp(p, pts, dirs_enc, cfg, tile=128)
        return jnp.mean((raw - target) ** 2)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    l0 = float(loss_fn(params))
    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
    l1 = float(loss_fn(params))
    assert l1 < 0.5 * l0, (l0, l1)


def test_pallas_input_grads_are_zero_by_contract():
    """The fused backward kernel returns ZERO cotangents for pts/dirs
    (weight-training only — camera/pose refinement needs the XLA path).
    This pins the documented contract so the silent divergence between
    the two paths is at least test-visible."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.encoding import positional_encoding
    from nerfmlp_tpu.ops.pallas_mlp import fused_nerf_mlp

    cfg = RenderConfig(compute_dtype="bfloat16", use_pallas=True)
    params = init_model(jax.random.PRNGKey(0), cfg.model_config())
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)), jnp.float32)
    dirs = positional_encoding(
        jnp.asarray([[0.0, 0.0, -1.0]] * 8), cfg.dir_enc_L
    )

    def loss(p):
        return jnp.sum(fused_nerf_mlp(params, p, dirs, cfg) ** 2)

    g = jax.grad(loss)(pts)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_forward_high_precision_matches_xla_fp32():
    """fp32_precision="high" inside the kernel (hand-rolled bf16x3, 3 bf16
    MXU passes per matmul) must agree with the XLA fp32 path to ~1e-5
    relative — fp32-grade output, unlike the single-pass bf16 mode."""
    cfg, params, pts, dirs_enc = _setup()
    hi = dataclasses.replace(
        cfg, compute_dtype="float32", fp32_precision="high", use_pallas=True
    )
    got = np.asarray(fused_nerf_mlp(params, pts, dirs_enc, hi, tile=128))
    want = np.asarray(_xla_raw(params, pts, dirs_enc, cfg))
    scale = np.abs(want).max()
    # The CPU oracle here is EXACT fp32 (stricter than TPU XLA-HIGH, which
    # is itself bf16x3): measured max normalized error 1.3e-5 through the
    # 8-layer chain.
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)

    # And it must be *much* closer than the single-pass bf16 kernel.
    bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    got_bf = np.asarray(fused_nerf_mlp(params, pts, dirs_enc, bf, tile=128))
    err_hi = np.abs(got - want).max()
    err_bf = np.abs(got_bf - want).max()
    assert err_hi < err_bf / 20, (err_hi, err_bf)


def test_grads_high_precision_match_xla():
    """Backward bf16x3: weight grads from the high-precision kernel agree
    with XLA fp32 grads to ~1e-4 relative (vs ~5e-3 for bf16)."""
    cfg, params, pts, dirs_enc = _setup(n=256)
    hi = dataclasses.replace(
        cfg, compute_dtype="float32", fp32_precision="high", use_pallas=True
    )

    def loss(p, c):
        raw = fused_nerf_mlp(p, pts, dirs_enc, c, tile=128)
        return jnp.mean(jax.nn.sigmoid(raw[:, :3]) ** 2) + jnp.mean(
            jax.nn.relu(raw[:, 3]) * 1e-2
        )

    def loss_xla(p):
        raw = _xla_raw(p, pts, dirs_enc, cfg)
        return jnp.mean(jax.nn.sigmoid(raw[:, :3]) ** 2) + jnp.mean(
            jax.nn.relu(raw[:, 3]) * 1e-2
        )

    g_hi = jax.grad(lambda p: loss(p, hi))(params)
    g_xla = jax.grad(loss_xla)(params)
    for name in g_xla:
        for leaf in ("kernel", "bias"):
            a = np.asarray(g_hi[name][leaf])
            b = np.asarray(g_xla[name][leaf])
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=1e-4,
                err_msg=f"{name}/{leaf}",
            )


def test_render_rays_routes_fp32_high_to_pallas():
    """The renderer engages the fused kernel for fp32_precision="high"
    (and the result matches the XLA fp32 render closely)."""
    from nerfmlp_tpu.ops.render import render_rays

    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=False,
                       raw_noise_std=0.0)
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    rng = np.random.default_rng(3)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (16, 1))
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5

    base = render_rays(params, jnp.asarray(o), jnp.asarray(d), None, cfg)
    hi = dataclasses.replace(cfg, use_pallas=True, fp32_precision="high")
    got = render_rays(params, jnp.asarray(o), jnp.asarray(d), None, hi)
    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), np.asarray(base["rgb_map"]), atol=1e-4
    )
