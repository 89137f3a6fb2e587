"""Occupancy-grid sampling: grid math, lookup, end-to-end training."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.occupancy import (
    OccupancyGrid,
    create_grid,
    lookup,
    occupancy_weights,
    update_grid,
)
from nerfmlp_tpu.ops.render import render_rays

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def _cfg(**kw):
    base = dict(
        N_samples=16, N_importance=16, near=2.0, far=6.0, perturb=False,
        aabb=AABB, use_occupancy=True, occ_grid_size=16, occ_dense_samples=32,
    )
    base.update(kw)
    return RenderConfig(**base)


def test_create_grid_starts_occupied_but_decays_fast():
    g = create_grid(8)
    assert g.density.shape == (8, 8, 8)
    # Above the default threshold (everything sampled initially)...
    assert float(g.density.min()) > 1e-2
    # ...but low enough that ~14 EMA refreshes clear an empty cell.
    assert float(g.density.max()) * 0.95**14 < 1e-2


def test_lookup_inside_outside():
    dens = jnp.zeros((4, 4, 4)).at[2, 2, 2].set(5.0)
    g = OccupancyGrid(density=dens)
    # Cell (2,2,2) of a [-1,1]^3 box with G=4 spans [0, 0.5)^3.
    pts = jnp.asarray(np.array([
        [0.25, 0.25, 0.25],   # inside the hot cell
        [-0.75, -0.75, -0.75],  # empty cell
        [5.0, 0.0, 0.0],        # outside the box
    ], np.float32))
    d = np.asarray(lookup(g, pts, AABB))
    assert d[0] == 5.0 and d[1] == 0.0 and d[2] == 0.0


def test_occupancy_weights_fallback_uniform():
    """Rays missing all occupied cells get uniform weights."""
    dens = jnp.zeros((4, 4, 4)).at[2, 2, 2].set(5.0)
    g = OccupancyGrid(density=dens)
    o = jnp.asarray(np.array([[0.25, 0.25, 4.0], [10.0, 10.0, 4.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], np.float32))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 16), (2, 16))
    w = np.asarray(occupancy_weights(g, o, d, z, _cfg()))
    assert w[0].max() > 0.5 and w[0].min() < 0.01  # concentrated
    np.testing.assert_allclose(w[1], 1.0)          # uniform fallback


def test_update_grid_learns_density_layout():
    """After updates, the grid's hot cells follow the model's sigma."""
    cfg = _cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    g = create_grid(cfg.occ_grid_size)
    g = update_grid(g, params, cfg, jax.random.PRNGKey(1), decay=0.0)
    # decay=0: grid == relu(sigma) at jittered centers -> finite, >= 0.
    d = np.asarray(g.density)
    assert d.shape == (16, 16, 16)
    assert (d >= 0).all() and np.isfinite(d).all()


def test_build_grid_is_running_max_over_jitters():
    """build_grid (inference-side one-shot build) == zero-init running max
    of update_grid(decay=1.0) over the same jitter keys."""
    from nerfmlp_tpu.ops.occupancy import build_grid

    cfg = _cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    rng = jax.random.PRNGKey(7)
    built = build_grid(params, cfg, rng, resolution=cfg.occ_grid_size,
                       refreshes=3)

    manual = OccupancyGrid(
        density=jnp.zeros((cfg.occ_grid_size,) * 3, jnp.float32)
    )
    for k in jax.random.split(rng, 3):
        manual = update_grid(manual, params, cfg, k, decay=1.0)
    # build_grid jits its update; the eager loop fuses differently —
    # agreement is to float rounding, not bit-exact.
    np.testing.assert_allclose(
        np.asarray(built.density), np.asarray(manual.density),
        rtol=1e-4, atol=1e-6,
    )
    # A trained-or-random net still yields a usable grid: finite, >= 0.
    d = np.asarray(built.density)
    assert np.isfinite(d).all() and (d >= 0).all()


def test_render_with_occupancy_shapes():
    cfg = _cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    grid = create_grid(cfg.occ_grid_size)
    o = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (6, 1)).astype(np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]] * 6, np.float32))
    out = render_rays(params, o, d, None, cfg, occ_grid=grid)
    assert out["rgb_map"].shape == (6, 3)
    assert "rgb_map_coarse" not in out  # single-pass path
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_occupancy_training_end_to_end(synthetic_scene, tmp_path):
    """Trainer with use_occupancy reaches reasonable PSNR on the scene."""
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(
        N_samples=8, N_importance=8, near=near, far=far, perturb=True,
        aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
        use_occupancy=True, occ_grid_size=16, occ_dense_samples=32,
        occ_update_every=10,
    )
    tc = TrainConfig(batch_size=256, iters=80, quick_val_interval=40,
                     full_val_interval=0, quick_val_subset=1, log_interval=40)
    t = Trainer(rc, tc, ds, val, val, save_dir=str(tmp_path / "occtest"), verbose=False)
    metrics = t.train()
    assert metrics["final_val"]["psnr"] > 8.0
    assert np.isfinite(metrics["train_losses"][-1])


def test_occupancy_requires_aabb(synthetic_scene, tmp_path):
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    rc = RenderConfig(use_occupancy=True, aabb=None)
    try:
        # tmp_path, not the shared scene fixture: Trainer.__init__ makedirs
        # save_dir before raising, and the fixture must stay pristine.
        Trainer(rc, TrainConfig(batch_size=64), ds,
                save_dir=str(tmp_path / "occx"), verbose=False)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "aabb" in str(e)


def test_occupancy_resume_rebuilds_grid(synthetic_scene, tmp_path):
    """Resume rebuilds the density grid from the restored model in one
    decay=0 refresh (not the fresh fully-occupied grid)."""
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(
        N_samples=8, N_importance=8, near=near, far=far, perturb=True,
        aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
        use_occupancy=True, occ_grid_size=16, occ_dense_samples=32,
        occ_update_every=10,
    )
    tc = TrainConfig(batch_size=256, iters=30, quick_val_interval=30,
                     full_val_interval=0, quick_val_subset=1, log_interval=30)
    out = str(tmp_path / "occ")
    t1 = Trainer(rc, tc, ds, ds, ds, save_dir=out, verbose=False)
    t1.train()

    t2 = Trainer(rc, tc, ds, ds, ds, save_dir=out, verbose=False)
    fresh = np.asarray(t2.occ_grid.density).copy()
    assert t2.resume(out + "/metrics_latest.ckpt")
    rebuilt = np.asarray(t2.occ_grid.density)
    # decay=0 rebuild == relu(sigma) of the restored model: not the
    # constant fresh init.
    assert not np.allclose(rebuilt, fresh)
    assert int(t2.history["step"]) == 30


def test_occupancy_cli_flag(synthetic_scene, tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.train import main as train_main

    out = str(tmp_path / "occcli")
    m = train_main([
        "--datadir", synthetic_scene, "--img_wh", "40", "40",
        "--batch_size", "256", "--iters", "30", "--save_dir", out,
        "--N_samples", "8", "--N_importance", "8",
        "--quick_val_interval", "30", "--full_val_interval", "0",
        "--quick_val_res", "40", "40", "--quick_val_subset", "1",
        "--compute_dtype", "float32", "--no_pallas", "--n_devices", "1",
        "--use_occupancy", "--aabb", "-1.5", "-1.5", "-1.2", "1.5", "1.5", "1.5",
    ])
    assert m["step"] == 30


def test_update_grid_separate_fine_custom_arch():
    """The grid's density source is the FINE net under separate_fine
    (render.py:172-176); update_grid must query it with the fine
    architecture — a custom --netdepth_fine/--netwidth_fine used to crash
    with ScopeParamShapeError."""
    import jax

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.occupancy import create_grid, update_grid

    rc = RenderConfig(
        N_samples=8, N_importance=8, near=0.5, far=4.0,
        depth=4, width=32, depth_fine=3, width_fine=16,
        separate_fine=True, use_occupancy=True,
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0), occ_grid_size=4,
    )
    params = {
        "coarse": init_model(jax.random.PRNGKey(0), rc.model_config()),
        "fine": init_model(jax.random.PRNGKey(1), rc.model_config(fine=True)),
    }
    grid = update_grid(
        create_grid(rc.occ_grid_size), params, rc, jax.random.PRNGKey(2),
        decay=0.0,
    )
    assert np.isfinite(np.asarray(grid.density)).all()


def test_missing_grid_raises_not_silent_fallback():
    """use_occupancy render without a grid must fail loudly: under
    separate_fine the coarse net is untrained in occupancy mode, so the
    silent hierarchical fallback would render garbage (r3 review)."""
    import pytest

    cfg = _cfg()
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    with pytest.raises(ValueError, match="occ_grid"):
        render_rays(params, o, d, None, cfg)


def test_occ_warmup_decay_schedule(synthetic_scene, tmp_path):
    """Refreshes at steps <= occ_warmup_steps must use decay=1.0 (no
    pruning) and later refreshes 0.95 (r5: the NerfAcc-style guard
    against pruning content the model has not placed density on yet;
    see config.py's occ_warmup_steps doc for what it does and does not
    fix — the hard-scene occ collapse is probe-budget-bound, not
    pruning-bound)."""
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    rc = RenderConfig(
        N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True,
        aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
        use_occupancy=True, occ_grid_size=16, occ_dense_samples=32,
        occ_update_every=16, occ_warmup_steps=50,
    )
    tc = TrainConfig(batch_size=128, iters=96, quick_val_interval=96,
                     full_val_interval=0, quick_val_subset=0,
                     log_interval=96)
    t = Trainer(rc, tc, ds, None, None,
                save_dir=str(tmp_path / "warm"), verbose=False)
    seen = []
    orig = t._occ_update

    def spy(grid, params, rng, decay):
        seen.append(float(decay))
        return orig(grid, params, rng, decay)

    t._occ_update = spy
    t.train()
    # Refreshes fire at s = 1, 17, 33, 49 (warmup: decay 1.0), 65, 81.
    assert seen == [1.0, 1.0, 1.0, 1.0, 0.95, 0.95], seen


def test_hierarchical_occ_matches_one_shot_contract():
    """The r5 hierarchical occupancy path keeps the one-shot contract:
    same output keys (no rgb_map_coarse), finite values, deterministic
    when perturb=0, and gradients flow through both MLP passes."""
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.occupancy import create_grid
    from nerfmlp_tpu.ops.render import render_rays

    rc = RenderConfig(
        N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=False,
        aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
        use_occupancy=True, occ_grid_size=8, occ_dense_samples=32,
    )
    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    # Fresh init leaves relu(sigma) == 0 at every sample (dead-relu: zero
    # grads in EVERY render path); bias the density head positive so the
    # test exercises live compositing.
    params["coarse"]["sigma"]["bias"] = (
        params["coarse"]["sigma"]["bias"] + 1.0
    )
    grid = create_grid(8)  # fully occupied init
    o = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (6, 1)).astype(np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]] * 6, np.float32))

    out = render_rays(params, o, d, None, rc, occ_grid=grid)
    assert set(out) == {"rgb_map", "depth_map", "disp_map", "acc_map"}
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    out2 = render_rays(params, o, d, None, rc, occ_grid=grid)
    np.testing.assert_array_equal(
        np.asarray(out["rgb_map"]), np.asarray(out2["rgb_map"])
    )

    # One-shot flag restores the r4 protocol (different placement).
    import dataclasses

    rc_os = dataclasses.replace(rc, occ_one_shot=True)
    out_os = render_rays(params, o, d, None, rc_os, occ_grid=grid)
    assert set(out_os) == set(out)

    # Gradients flow (both passes feed the merged composite).
    def loss(p):
        r = render_rays(p, o, d, None, rc, occ_grid=grid)
        return jnp.mean(r["rgb_map"] ** 2)

    g = jax.grad(loss)(params)
    gsum = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g)
    )
    assert gsum > 0.0


def test_hierarchical_occ_concentrates_on_thin_content():
    """The motivating property (hard-scene root cause): with a thin
    high-density slab inside a much larger occupied region, hierarchical
    occupancy must place MORE samples on the slab than one-shot grid
    sampling at the same budget."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.occupancy import create_grid
    from nerfmlp_tpu.ops import render as render_mod

    rc = RenderConfig(
        N_samples=16, N_importance=48, near=2.0, far=6.0, perturb=False,
        aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
        use_occupancy=True, occ_grid_size=8, occ_dense_samples=64,
    )
    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    grid = create_grid(8)  # fully occupied: the grid prior is uniform

    # Monkeypatch the MLP query with a slab of density 0.3 world units
    # thick (depth 3.85..4.15) — wide enough that the 16 deterministic
    # probes (spacing ~0.2 over the 3-unit AABB span) always hit it, but
    # only ~10% of the span.
    o = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (64, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (64, 1)).astype(np.float32))

    real_query = render_mod._query_mlp

    def slab_query(net, pts, dirs_enc, cfg, fine=False):
        z = pts[..., 2]
        sigma = jnp.where(jnp.abs(z + 0.0) < 0.15, 80.0, 0.0)
        rgb_logit = jnp.zeros(pts.shape[:-1] + (3,))
        return jnp.concatenate(
            [rgb_logit, sigma[..., None]], axis=-1
        )

    captured = {}
    orig_merge = render_mod._merge_by_depth

    def spy_merge(z_c, raw_c, z_f, raw_f):
        captured["z_new"] = z_f
        return orig_merge(z_c, raw_c, z_f, raw_f)

    try:
        render_mod._query_mlp = slab_query
        render_mod._merge_by_depth = spy_merge
        render_rays(params, o, d, None, rc, occ_grid=grid)
    finally:
        render_mod._query_mlp = real_query
        render_mod._merge_by_depth = orig_merge

    # The slab occupies depth [3.85, 4.15] on these rays (~10% of the
    # span); the 48 importance samples must concentrate there — far
    # beyond the one-shot/uniform expectation of ~10%.
    z_new = np.asarray(captured["z_new"])
    frac_on_slab = float(
        ((z_new > 3.85) & (z_new < 4.15)).mean()
    )
    assert frac_on_slab > 0.5, frac_on_slab
