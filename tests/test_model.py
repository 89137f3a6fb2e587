"""NeRFMLP architecture: shapes, skip wiring, and a full numpy oracle of the
official forward pass (nerfmlp/model.py:28-81)."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import ModelConfig
from nerfmlp_tpu.models.mlp import init_model, apply_model
from nerfmlp_tpu.models.import_tf import (
    expected_shapes,
    params_from_numpy,
    params_to_numpy,
)


def _numpy_forward(arrays, x, viewdirs):
    """Independent oracle: official array order, skip-concat before layer 5,
    viewdir head, output = [rgb, sigma]."""
    relu = lambda a: np.maximum(a, 0.0)
    h = x
    idx = 0
    for i in range(8):
        if i == 5:
            h = np.concatenate([x, h], -1)
        h = relu(h @ arrays[idx] + arrays[idx + 1])
        idx += 2
    bottleneck = h @ arrays[idx] + arrays[idx + 1]; idx += 2
    v = relu(np.concatenate([bottleneck, viewdirs], -1) @ arrays[idx] + arrays[idx + 1]); idx += 2
    rgb = v @ arrays[idx] + arrays[idx + 1]; idx += 2
    sigma = h @ arrays[idx] + arrays[idx + 1]
    return np.concatenate([rgb, sigma], -1)


def _random_official_arrays(rng, cfg=None):
    return [
        rng.normal(scale=0.1, size=s).astype(np.float32)
        for s in expected_shapes(cfg)
    ]


def test_init_shapes():
    params = init_model(jax.random.PRNGKey(0))
    assert params["pts_0"]["kernel"].shape == (63, 256)
    assert params["pts_5"]["kernel"].shape == (256 + 63, 256)  # skip layer
    assert params["pts_7"]["kernel"].shape == (256, 256)
    assert params["sigma"]["kernel"].shape == (256, 1)
    assert params["bottleneck"]["kernel"].shape == (256, 256)
    assert params["view"]["kernel"].shape == (256 + 27, 128)
    assert params["rgb"]["kernel"].shape == (128, 3)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 500_000 < n_params < 700_000  # ~595k like the reference


def test_forward_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    arrays = _random_official_arrays(rng)
    params = params_from_numpy(arrays)
    x = rng.normal(size=(37, 63)).astype(np.float32)
    v = rng.normal(size=(37, 27)).astype(np.float32)
    got = np.asarray(apply_model(params, jnp.asarray(x), jnp.asarray(v)))
    want = _numpy_forward(arrays, x, v)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_tf_roundtrip():
    rng = np.random.default_rng(1)
    arrays = _random_official_arrays(rng)
    params = params_from_numpy(arrays)
    back = params_to_numpy(params)
    assert len(back) == 24
    for a, b in zip(arrays, back):
        np.testing.assert_array_equal(a, b)


def test_import_rejects_bad_shapes():
    rng = np.random.default_rng(2)
    arrays = _random_official_arrays(rng)
    arrays[0] = arrays[0][:, :128]  # corrupt a kernel
    try:
        params_from_numpy(arrays)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "pts_0" in str(e)


def test_no_viewdirs_mode():
    cfg = ModelConfig(use_viewdirs=False)
    params = init_model(jax.random.PRNGKey(0), cfg)
    assert "output" in params and "sigma" not in params
    out = apply_model(params, jnp.zeros((5, 63)), None, cfg)
    assert out.shape == (5, 4)
    assert cfg.num_tf_arrays == 18


def test_official_array_count():
    assert ModelConfig().num_tf_arrays == 24
    assert len(expected_shapes()) == 24


def test_fp32_precision_option_plumbs_through():
    """fp32_precision="high" (3-pass bf16x3 on TPU) must agree with
    "highest" on CPU (where both lower to true fp32) and be accepted
    end-to-end through render_rays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import apply_model, init_model
    from nerfmlp_tpu.ops.render import render_rays

    cfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                       perturb=False, fp32_precision="high")
    params = init_model(jax.random.PRNGKey(0), cfg.model_config())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 63)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(16, 27)).astype(np.float32))
    hi = apply_model(params, x, v, fp32_precision="highest")
    lo = apply_model(params, x, v, fp32_precision="high")
    np.testing.assert_allclose(np.asarray(hi), np.asarray(lo), atol=1e-5)

    o = jnp.asarray(np.tile(np.array([[0, 0, 4.0]], np.float32), (8, 1)))
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    out = render_rays({"coarse": params}, o, jnp.asarray(d), None, cfg)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_custom_arch_falls_back_from_pallas():
    """bf16 + use_pallas with a non-canonical trunk must silently take the
    XLA path (the fused kernel hardcodes 8x256) and render finite maps —
    including a separate fine net with its own shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.render import render_rays

    cfg = RenderConfig(
        N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=False,
        depth=4, width=64, depth_fine=3, width_fine=32,
        separate_fine=True, use_pallas=True, compute_dtype="bfloat16",
    )
    params = {
        "coarse": init_model(jax.random.PRNGKey(0), cfg.model_config()),
        "fine": init_model(jax.random.PRNGKey(1), cfg.model_config(fine=True)),
    }
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile(np.array([[0, 0, 4.0]], np.float32), (8, 1)))
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    out = render_rays(params, o, jnp.asarray(d), None, cfg)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    assert np.isfinite(np.asarray(out["rgb_map_coarse"])).all()


def test_skip_index_fixed_like_oracle():
    """The oracle hardcodes skips=[4] (after-layer-4) for EVERY --netdepth
    (run_nerf.py:389) == our before-layer-5; depths too short for the TF
    loop to reach i=4 get none."""
    from nerfmlp_tpu.config import RenderConfig

    assert RenderConfig(depth=8).model_config().skips == (5,)
    assert RenderConfig(depth=6).model_config().skips == (5,)
    assert RenderConfig(depth=10).model_config().skips == (5,)
    assert RenderConfig(depth=4).model_config().skips == ()
    assert RenderConfig(depth=8, depth_fine=6).model_config(fine=True).skips == (5,)
