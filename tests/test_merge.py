"""The gather-free depth merge behind coarse-eval reuse
(ops/render.py::_merge_by_depth) — must reproduce a stable argsort merge
exactly, including ties, and the reuse path must equal full re-evaluation.

Oracle note (CLAUDE.md convention): the merge itself is checked against an
independent numpy stable-argsort below; the reuse-vs-full-reeval tests are
SELF-consistency checks (both sides are our code) — the independent oracle
for the full reuse render is tests/test_reference_parity.py::
test_full_render_parity, which drives the reuse path (shared-net default)
against the live torch reference."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.render import _merge_by_depth, render_rays


def _oracle_merge(z_c, z_f, raw_c, raw_f):
    z_all = np.concatenate([z_c, z_f], -1)
    raw_all = np.concatenate([raw_c, raw_f], 1)
    order = np.argsort(z_all, -1, kind="stable")
    return (
        np.take_along_axis(z_all, order, -1),
        np.take_along_axis(raw_all, order[..., None], 1),
    )


def test_merge_matches_stable_argsort():
    rng = np.random.default_rng(0)
    N, C, F = 9, 16, 24
    z_c = np.sort(rng.uniform(2, 6, (N, C)).astype(np.float32), -1)
    z_f = rng.uniform(2, 6, (N, F)).astype(np.float32)  # unsorted (perturb)
    raw_c = rng.normal(size=(N, C, 4)).astype(np.float32)
    raw_f = rng.normal(size=(N, F, 4)).astype(np.float32)
    z_m, raw_m = _merge_by_depth(
        jnp.asarray(z_c), jnp.asarray(raw_c), jnp.asarray(z_f), jnp.asarray(raw_f)
    )
    z_want, raw_want = _oracle_merge(z_c, z_f, raw_c, raw_f)
    np.testing.assert_array_equal(np.asarray(z_m), z_want)
    np.testing.assert_array_equal(np.asarray(raw_m), raw_want)


def test_merge_handles_exact_ties():
    """Coarse depths duplicated exactly in the fine set (the det-sampling
    corner): merge must stay a permutation — every value placed once."""
    rng = np.random.default_rng(1)
    N, C, F = 4, 8, 8
    z_c = np.sort(rng.uniform(2, 6, (N, C)).astype(np.float32), -1)
    # Even indices tie coarse depths EXACTLY; odd indices are random
    # (and unsorted) — the realistic det-sampling mix of ties and
    # non-ties a rank-merge bug could misorder.
    z_f = z_c.copy()
    z_f[:, 1::2] = rng.uniform(2, 6, (N, F // 2)).astype(np.float32)
    raw_c = rng.normal(size=(N, C, 4)).astype(np.float32)
    raw_f = rng.normal(size=(N, F, 4)).astype(np.float32)
    z_m, raw_m = _merge_by_depth(
        jnp.asarray(z_c), jnp.asarray(raw_c), jnp.asarray(z_f), jnp.asarray(raw_f)
    )
    z_want, raw_want = _oracle_merge(z_c, z_f, raw_c, raw_f)
    np.testing.assert_array_equal(np.asarray(z_m), z_want)
    np.testing.assert_array_equal(np.asarray(raw_m), raw_want)


def test_reuse_equals_full_reeval():
    """The coarse-reuse fine pass must equal full re-evaluation: a params
    dict with fine == coarse under separate_fine forces the old full-eval
    path over the SAME weights."""
    cfg = RenderConfig(N_samples=16, N_importance=16, near=2.0, far=6.0,
                       perturb=False, raw_noise_std=0.0)
    p = init_model(jax.random.PRNGKey(0), cfg.model_config())
    rng = np.random.default_rng(3)
    o = jnp.asarray(np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (32, 1)))
    d = np.asarray(rng.normal(size=(32, 3)), np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d = jnp.asarray(d)

    a = render_rays({"coarse": p}, o, d, None, cfg)
    cfg2 = dataclasses.replace(cfg, separate_fine=True)
    b = render_rays({"coarse": p, "fine": p}, o, d, None, cfg2)
    for key in ("rgb_map", "depth_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), atol=1e-6, err_msg=key
        )

    # Under perturbed sampling too (unsorted z_f exercises the rank-merge
    # tie-breaking): same rng -> same z_samples -> identical output.
    cfg_p = dataclasses.replace(cfg, perturb=True)
    cfg_p2 = dataclasses.replace(cfg_p, separate_fine=True)
    key = jax.random.PRNGKey(5)
    ap = render_rays({"coarse": p}, o, d, key, cfg_p)
    bp = render_rays({"coarse": p, "fine": p}, o, d, key, cfg_p2)
    np.testing.assert_allclose(
        np.asarray(ap["rgb_map"]), np.asarray(bp["rgb_map"]), atol=1e-6
    )


def test_reuse_gradients_flow_through_merge():
    """Weight grads through the reuse path must match the full re-eval
    path (autodiff sums the coarse output's two uses)."""
    cfg = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                       perturb=False, raw_noise_std=0.0)
    p = init_model(jax.random.PRNGKey(2), cfg.model_config())
    rng = np.random.default_rng(7)
    o = jnp.asarray(np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (16, 1)))
    d = np.asarray(rng.normal(size=(16, 3)), np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d = jnp.asarray(d)
    target = jnp.asarray(rng.uniform(size=(16, 3)).astype(np.float32))

    def loss_reuse(p):
        out = render_rays({"coarse": p}, o, d, None, cfg)
        return jnp.mean((out["rgb_map"] - target) ** 2)

    cfg2 = dataclasses.replace(cfg, separate_fine=True)

    def loss_full(p):
        out = render_rays({"coarse": p, "fine": p}, o, d, None, cfg2)
        return jnp.mean((out["rgb_map"] - target) ** 2)

    g_a = jax.grad(loss_reuse)(p)
    g_b_pair = jax.grad(loss_full)(p)  # same leaves get coarse+fine sums
    # loss_full differentiates a dict {"coarse": p, "fine": p} built from
    # ONE p — jax sums both nets' contributions, same as the reuse path.
    for name in g_a:
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(g_a[name][leaf]),
                np.asarray(g_b_pair[name][leaf]),
                atol=1e-6, err_msg=f"{name}/{leaf}",
            )
