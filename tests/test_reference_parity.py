"""Golden parity against the ACTUAL reference implementation.

Loads the PyTorch reference package from /root/reference (read-only, CPU)
and checks that — given identical weights — our model and renderer
reproduce its outputs numerically. This is the strongest form of the
reference's own verification strategy ("identical results when using same
weights", NOTES.md:20-24) and is skipped automatically when the reference
tree is not present.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "nerfmlp")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    import torch  # noqa: F401

    import nerfmlp as ref_pkg

    return ref_pkg


@pytest.fixture(scope="module")
def shared_weights():
    """One random official-order weight list shared by both frameworks."""
    from nerfmlp_tpu.models.import_tf import expected_shapes

    rng = np.random.default_rng(42)
    return [rng.normal(scale=0.1, size=s).astype(np.float32) for s in expected_shapes()]


def test_model_forward_parity(ref, shared_weights):
    import torch
    import jax.numpy as jnp

    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.models.mlp import apply_model

    ref_model = ref.NeRFMLP()
    ref_model.load_from_numpy(shared_weights)
    ref_model.eval()

    params = params_from_numpy(shared_weights)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 63)).astype(np.float32)
    v = rng.normal(size=(64, 27)).astype(np.float32)

    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), torch.from_numpy(v)).numpy()
    got = np.asarray(apply_model(params, jnp.asarray(x), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_encoding_parity(ref):
    import torch
    import jax.numpy as jnp

    from nerfmlp_tpu.ops.encoding import positional_encoding

    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 3)).astype(np.float32)
    for L in (4, 10):
        enc_ref = ref.model.PositionalEncoding(L)
        with torch.no_grad():
            want = enc_ref(torch.from_numpy(x)).numpy()
        got = np.asarray(positional_encoding(jnp.asarray(x), L))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"L={L}")


def test_full_render_parity(ref, shared_weights):
    """Deterministic coarse+fine render of the same rays through BOTH
    frameworks with the same weights — rgb/depth/acc maps must agree."""
    import torch
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.ops.render import render_rays

    ref_model = ref.NeRFMLP()
    ref_model.load_from_numpy(shared_weights)
    ref_model.eval()
    ref_renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"),
        N_samples=32, N_importance=16, near=2.0, far=6.0,
        white_bkgd=True, perturb=0.0, raw_noise_std=0.0,
    )

    rng = np.random.default_rng(2)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (24, 1))
    d = rng.normal(size=(24, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5

    with torch.no_grad():
        want = ref_renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))

    cfg = RenderConfig(N_samples=32, N_importance=16, near=2.0, far=6.0,
                       white_bkgd=True, perturb=False, raw_noise_std=0.0)
    got = render_rays(
        {"coarse": params_from_numpy(shared_weights)},
        jnp.asarray(o), jnp.asarray(d), None, cfg,
    )

    # The coarse map has no error amplification: tight tolerance.
    np.testing.assert_allclose(
        np.asarray(got["rgb_map_coarse"]), want["rgb_map_coarse"].numpy(), atol=5e-4
    )
    # Fine-pass z-locations depend continuously on coarse weights, so
    # framework-level fp32 op-order differences (~2e-4 at the MLP output)
    # shift importance samples slightly and amplify: allow 3e-3 (~0.3% of
    # dynamic range; PSNR-equivalent error > 50 dB).
    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), want["rgb_map"].numpy(), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["depth_map"]), want["depth_map"].numpy(), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["acc_map"]), want["acc_map"].numpy(), atol=3e-3
    )


def test_coord_scale_parity(ref, shared_weights):
    import torch
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.ops.render import render_rays

    ref_model = ref.NeRFMLP()
    ref_model.load_from_numpy(shared_weights)
    ref_model.eval()
    ref_renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"), N_samples=16, N_importance=0,
        near=2.0, far=6.0, perturb=0.0, raw_noise_std=0.0, coord_scale=0.5,
    )
    rng = np.random.default_rng(3)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (8, 1))
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    with torch.no_grad():
        want = ref_renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))
    cfg = RenderConfig(N_samples=16, N_importance=0, near=2.0, far=6.0,
                       perturb=False, coord_scale=0.5)
    got = render_rays({"coarse": params_from_numpy(shared_weights)},
                      jnp.asarray(o), jnp.asarray(d), None, cfg)
    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), want["rgb_map"].numpy(), atol=5e-4
    )


def test_dataset_preprocessing_parity(ref, synthetic_scene):
    """Same scene through both data pipelines: images, focal, rays match."""
    from nerfmlp_tpu.data.blender import BlenderDataset

    ref_ds = ref.NeRFDataset(synthetic_scene, split="train", img_wh=(40, 40))
    ours = BlenderDataset(synthetic_scene, split="train", img_wh=(40, 40))

    np.testing.assert_allclose(ours.images, ref_ds.images, atol=1e-6)
    assert abs(ours.focal - ref_ds.focal) < 1e-6
    np.testing.assert_allclose(ours.all_rays_o, ref_ds.all_rays_o, atol=1e-6)
    np.testing.assert_allclose(ours.all_rays_d, ref_ds.all_rays_d, atol=1e-5)
    np.testing.assert_allclose(ours.all_rgbs, ref_ds.all_rgbs, atol=1e-6)


def test_export_roundtrip_through_reference(ref, tmp_path):
    """Ultimate interop closure: OUR params -> official .npy -> loaded by
    the REFERENCE implementation -> its render matches ours."""
    import torch
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.render import render_rays
    from nerfmlp_tpu.train.checkpoint import save_params_npy, load_params_any

    cfg = RenderConfig(N_samples=16, N_importance=8, near=2.0, far=6.0,
                       perturb=False, raw_noise_std=0.0)
    params = init_model(jax.random.PRNGKey(3), cfg.model_config())

    npy = str(tmp_path / "export.npy")
    save_params_npy(npy, params)

    # Reference loads our export.
    ref_model = ref.NeRFMLP()
    import numpy as _np

    arrays = [_np.asarray(a) for a in _np.load(npy, allow_pickle=True)]
    ref_model.load_from_numpy(arrays)
    ref_model.eval()
    ref_renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"), N_samples=16, N_importance=8,
        near=2.0, far=6.0, perturb=0.0, raw_noise_std=0.0,
    )

    rng = np.random.default_rng(4)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (12, 1))
    d = rng.normal(size=(12, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5

    with torch.no_grad():
        theirs = ref_renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))
    ours = render_rays({"coarse": params}, jnp.asarray(o), jnp.asarray(d), None, cfg)
    np.testing.assert_allclose(
        np.asarray(ours["rgb_map"]), theirs["rgb_map"].numpy(), atol=3e-3
    )

    # And our own loader round-trips the same file — every leaf, biases
    # included (a loader that drops/reorders biases must not pass).
    back = load_params_any(npy)
    for name in params:
        for leaf in params[name]:
            np.testing.assert_array_equal(
                np.asarray(back["coarse"][name][leaf]),
                np.asarray(params[name][leaf]),
            )


def test_pth_import_through_reference(ref, tmp_path):
    """The mirror of the export round-trip: a REFERENCE ``.pth`` checkpoint
    (both the bare state_dict and the composite training-dict formats,
    scripts/train.py:453,468-472) loads here and our render matches the
    torch render of the same model to 1e-4 (coarse map — no importance
    resampling, so no error amplification)."""
    import torch
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.ops.render import render_rays
    from nerfmlp_tpu.train.checkpoint import load_params_any

    torch.manual_seed(11)
    ref_model = ref.NeRFMLP()
    ref_model.eval()

    bare = str(tmp_path / "model_best.pth")
    torch.save(ref_model.state_dict(), bare)
    composite = str(tmp_path / "metrics_latest.pth")
    torch.save(
        {
            "model_state_dict": ref_model.state_dict(),
            "optimizer_state_dict": torch.optim.Adam(
                ref_model.parameters()
            ).state_dict(),
            "metrics": {"step": 7, "train_losses": [0.5, 0.25]},
        },
        composite,
    )

    cfg = RenderConfig(N_samples=24, N_importance=0, near=2.0, far=6.0,
                       white_bkgd=True, perturb=False, raw_noise_std=0.0)
    ref_renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"), N_samples=24, N_importance=0,
        near=2.0, far=6.0, white_bkgd=True, perturb=0.0, raw_noise_std=0.0,
    )

    rng = np.random.default_rng(6)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (16, 1))
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    with torch.no_grad():
        want = ref_renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))

    for path in (bare, composite):
        params = load_params_any(path, cfg=cfg.model_config())
        assert set(params) == {"coarse"}
        got = render_rays(params, jnp.asarray(o), jnp.asarray(d), None, cfg)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), want["rgb_map"].numpy(), atol=1e-4
        )

    # Architecture mismatch fails loudly, not silently (a wrong --netdepth
    # must not produce a garbage model).
    import pytest as _pytest

    wrong = RenderConfig(depth=4).model_config()
    with _pytest.raises(ValueError, match="missing layers|does not"):
        load_params_any(bare, cfg=wrong)


def test_pth_export_loads_in_reference(ref, tmp_path):
    """Our torch-format export is loadable by the reference's own render
    CLI path (model.load_state_dict(torch.load(...)),
    scripts/render_example.py:207) and computes the same function."""
    import torch
    import jax

    from nerfmlp_tpu.config import ModelConfig
    from nerfmlp_tpu.models.mlp import init_model, apply_model
    from nerfmlp_tpu.models.import_torch import params_to_torch_state_dict

    cfg = ModelConfig()
    params = init_model(jax.random.PRNGKey(9), cfg)
    path = str(tmp_path / "export.pth")
    torch.save(params_to_torch_state_dict(params, cfg), path)

    ref_model = ref.NeRFMLP()
    ref_model.load_state_dict(torch.load(path, map_location="cpu"))
    ref_model.eval()

    rng = np.random.default_rng(8)
    x = rng.normal(size=(32, 63)).astype(np.float32)
    v = rng.normal(size=(32, 27)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x), torch.from_numpy(v)).numpy()
    import jax.numpy as jnp

    got = np.asarray(apply_model(params, jnp.asarray(x), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# Training-step parity (r5, VERDICT item 2): loss, per-leaf gradients, one
# Adam update, and a 10-step deterministic co-training run against the LIVE
# torch reference — the last untested parity surface (grad + optimizer
# wiring). Reference semantics: fine-only MSE on _render_rays + Adam lr 5e-4
# (torch defaults) + StepLR(250000, 0.1) stepped per iteration, i.e. never
# firing here (/root/reference/scripts/train.py:258-260, 374-388).
# ---------------------------------------------------------------------------


def _train_parity_setup(ref, shared_weights, n_rays=32, seed=5):
    import torch

    ref_model = ref.NeRFMLP()
    ref_model.load_from_numpy(shared_weights)
    ref_model.train()
    renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"),
        N_samples=32, N_importance=16, near=2.0, far=6.0,
        white_bkgd=True, perturb=0.0, raw_noise_std=0.0,
    )
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n_rays, 1))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    target = rng.uniform(size=(n_rays, 3)).astype(np.float32)
    return ref_model, renderer, o, d, target


def _our_train_cfg():
    from nerfmlp_tpu.config import RenderConfig, TrainConfig

    cfg = RenderConfig(N_samples=32, N_importance=16, near=2.0, far=6.0,
                       white_bkgd=True, perturb=False, raw_noise_std=0.0)
    # lr_decay_rate=1.0 = constant LR, matching the reference's StepLR
    # whose 250k horizon never fires in these short runs.
    tc = TrainConfig(lr=5e-4, lr_decay_rate=1.0)
    return cfg, tc


def _torch_grads_tree(ref_model):
    from nerfmlp_tpu.models.import_torch import params_from_torch_state_dict

    return params_from_torch_state_dict(
        {k: p.grad.detach().clone() for k, p in ref_model.named_parameters()}
    )


def test_training_loss_and_grad_parity_coarse_only(ref, shared_weights):
    """Same weights + same ray batch, N_importance=0 (no importance
    sampling): loss and every per-leaf gradient must agree ELEMENTWISE
    between torch autograd and jax.grad — the pure wiring check
    (measured: worst abs diff 1e-5, relF 1.1e-4)."""
    import torch
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.parallel.train_step import loss_and_metrics

    ref_model, _, o, d, target = _train_parity_setup(ref, shared_weights)
    renderer = ref.NeRFRenderer(
        ref_model, torch.device("cpu"),
        N_samples=32, N_importance=0, near=2.0, far=6.0,
        white_bkgd=True, perturb=0.0, raw_noise_std=0.0,
    )
    rgb = renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))["rgb_map"]
    loss_t = torch.mean((rgb - torch.from_numpy(target)) ** 2)
    loss_t.backward()

    cfg = RenderConfig(N_samples=32, N_importance=0, near=2.0, far=6.0,
                       white_bkgd=True, perturb=False, raw_noise_std=0.0)
    _, tc = _our_train_cfg()
    params = {"coarse": params_from_numpy(shared_weights)}
    batch = jnp.asarray(np.concatenate([o, d, target], axis=1))
    (loss_j, _), grads_j = jax.value_and_grad(loss_and_metrics, has_aux=True)(
        params, batch, jax.random.PRNGKey(0), cfg, tc
    )
    assert abs(float(loss_j) - float(loss_t)) < 1e-6

    for name, leaf in _torch_grads_tree(ref_model).items():
        for part in ("kernel", "bias"):
            want = np.asarray(leaf[part])
            got = np.asarray(grads_j["coarse"][name][part])
            np.testing.assert_allclose(
                got, want, atol=5e-5,
                err_msg=f"grad mismatch at {name}.{part}",
            )


def test_training_grad_parity_hierarchical(ref, shared_weights):
    """Full coarse+fine gradients vs torch. The deterministic inverse-CDF
    importance samples depend continuously on the coarse MLP output, so
    framework-level fp32 op-order noise (~2e-4 at the MLP output) shifts
    the fine sample POSITIONS and perturbs gradients at FIRST order —
    elementwise comparison is meaningless (torch vs torch with reordered
    ops shows the same). Per-leaf direction + magnitude is the honest
    check: relative Frobenius < 5e-2, cosine > 0.995 (measured: 2.1e-2
    worst relF)."""
    import torch
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.parallel.train_step import loss_and_metrics

    ref_model, renderer, o, d, target = _train_parity_setup(ref, shared_weights)
    rgb = renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))["rgb_map"]
    loss_t = torch.mean((rgb - torch.from_numpy(target)) ** 2)
    loss_t.backward()

    cfg, tc = _our_train_cfg()
    params = {"coarse": params_from_numpy(shared_weights)}
    batch = jnp.asarray(np.concatenate([o, d, target], axis=1))
    (loss_j, _), grads_j = jax.value_and_grad(loss_and_metrics, has_aux=True)(
        params, batch, jax.random.PRNGKey(0), cfg, tc
    )
    assert abs(float(loss_j) - float(loss_t)) < 1e-5

    for name, leaf in _torch_grads_tree(ref_model).items():
        for part in ("kernel", "bias"):
            want = np.asarray(leaf[part]).ravel()
            got = np.asarray(grads_j["coarse"][name][part]).ravel()
            nw = np.linalg.norm(want)
            rel = np.linalg.norm(got - want) / max(nw, 1e-12)
            cos = float(got @ want) / max(np.linalg.norm(got) * nw, 1e-24)
            assert rel < 5e-2, f"{name}.{part}: relF {rel:.2e}"
            assert cos > 0.995, f"{name}.{part}: cosine {cos:.5f}"


def test_ten_step_cotraining_parity(ref, shared_weights):
    """10 deterministic Adam steps in both frameworks: per-step losses
    track each other and the final weights stay close in relative
    Frobenius norm (elementwise max is meaningless after Adam's first
    sign-descent-like step on near-zero grads)."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax

    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.parallel.train_step import (
        loss_and_metrics, make_optimizer,
    )

    ref_model, renderer, o, d, target = _train_parity_setup(ref, shared_weights)
    opt_t = torch.optim.Adam(ref_model.parameters(), lr=5e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt_t, step_size=250000, gamma=0.1)
    tt = torch.from_numpy(target)

    cfg, tc = _our_train_cfg()
    params = {"coarse": params_from_numpy(shared_weights)}
    opt_j = make_optimizer(tc)
    opt_state = opt_j.init(params)
    batch = jnp.asarray(np.concatenate([o, d, target], axis=1))

    @jax.jit
    def one_step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            params, batch, jax.random.PRNGKey(0), cfg, tc
        )
        updates, opt_state = opt_j.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_t, losses_j = [], []
    for _ in range(10):
        rgb = renderer._render_rays(
            torch.from_numpy(o), torch.from_numpy(d)
        )["rgb_map"]
        loss_t = torch.mean((rgb - tt) ** 2)
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        sched.step()
        losses_t.append(float(loss_t))

        params, opt_state, loss_j = one_step(params, opt_state)
        losses_j.append(float(loss_j))

    # Step 0 is tight (one render + one Adam step); later steps compound
    # the sample-shift gradient noise through Adam's sign-descent-like
    # first moments — measured divergence reaches ~2% by step 10.
    assert abs(losses_j[0] - losses_t[0]) / losses_t[0] < 1e-3
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-2)
    # Losses must actually go DOWN (this is a real optimization step, not
    # two frameworks agreeing on a no-op).
    assert losses_t[-1] < losses_t[0] * 0.9
    assert losses_j[-1] < losses_j[0] * 0.9

    sd = ref_model.state_dict()
    for name, leaf in params["coarse"].items():
        torch_name = {
            "bottleneck": "bottleneck_linear", "view": "view_linear",
            "rgb": "rgb_linear", "sigma": "sigma_linear",
        }.get(name, f"pts_linears.{name.split('_')[1]}" if name.startswith("pts_") else name)
        want = sd[f"{torch_name}.weight"].numpy().T
        got = np.asarray(leaf["kernel"])
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-8)
        # Measured: 3.8e-3 worst leaf after 10 steps (sample-shift noise
        # through Adam); 1e-2 bounds it with margin while still failing
        # on any real wiring bug (wrong lr/beta/loss shows up at >1e-1).
        assert rel < 1e-2, f"{name}: relative Frobenius drift {rel:.2e}"


def test_coarse_loss_variant_parity(ref, shared_weights):
    """The official two-term loss (img_loss + img_loss0,
    /root/reference/example/run_nerf.py:820-824) — our --coarse_loss
    flag must produce the same total loss value."""
    import torch
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import TrainConfig
    from nerfmlp_tpu.models.import_tf import params_from_numpy
    from nerfmlp_tpu.parallel.train_step import loss_and_metrics

    ref_model, renderer, o, d, target = _train_parity_setup(ref, shared_weights)
    out = renderer._render_rays(torch.from_numpy(o), torch.from_numpy(d))
    tt = torch.from_numpy(target)
    loss_t = (torch.mean((out["rgb_map"] - tt) ** 2)
              + torch.mean((out["rgb_map_coarse"] - tt) ** 2))

    cfg, tc = _our_train_cfg()
    tc = TrainConfig(lr=5e-4, lr_decay_rate=1.0, coarse_loss=True)
    params = {"coarse": params_from_numpy(shared_weights)}
    batch = jnp.asarray(np.concatenate([o, d, target], axis=1))
    loss_j, _ = loss_and_metrics(
        params, batch, jax.random.PRNGKey(0), cfg, tc
    )
    assert abs(float(loss_j) - float(loss_t)) < 2e-5


def test_head_to_head_convergence_beats_reference(tmp_path):
    """Train the LIVE torch reference and our trainer on the same scene
    and split for the same steps; our held-out PSNR must be >= the
    reference's - 0.5 dB (VERDICT r4 item 3 — converts 'matching-or-
    beating the reference's learning behavior' from inference to
    measurement). Tiny deterministic config so the single-core CPU cost
    stays ~1 min; the full-scale A/B lives in docs/RESULTS.md."""
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene
    from tools.head_to_head import run_ours, run_reference

    scene = make_synthetic_scene(
        str(tmp_path / "h2h"), n_train=6, n_val=2, n_test=2,
        img_wh=(32, 32), use_jax=True,
    )
    kw = dict(datadir=scene, img_wh=(32, 32), batch=64, iters=150,
              N_samples=16, N_importance=16, val_views=1, seed=0)
    ours = run_ours(**kw, save_dir=str(tmp_path / "ours"))
    theirs = run_reference(**kw, threads=1, log_every=0)
    delta = ours["val_psnr"] - theirs["val_psnr"]
    # Both must have actually learned something (not two no-ops agreeing).
    assert theirs["val_psnr"] > 10.0, theirs
    assert ours["val_psnr"] > 10.0, ours
    assert delta >= -0.5, (
        f"ours {ours['val_psnr']:.2f} dB vs reference "
        f"{theirs['val_psnr']:.2f} dB (delta {delta:+.2f})"
    )
