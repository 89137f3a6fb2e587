"""Multi-scene batched training: 8 scenes, one per fake device."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.mesh import make_mesh
from nerfmlp_tpu.parallel.multi_scene import (
    create_multi_scene_state,
    make_multi_scene_step,
    scene_sharding,
)


def _batches(n_scenes, b, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_scenes, b, 9)).astype(np.float32)
    x[..., 5] = -1.0
    x[..., 6:9] = np.abs(x[..., 6:9]) % 1.0
    return x


def test_multi_scene_step_runs():
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True)
    tc = TrainConfig(batch_size=64)
    mesh = make_mesh(n_devices=8)
    state = jax.device_put(
        create_multi_scene_state(8, rc, tc), scene_sharding(mesh)
    )
    step = make_multi_scene_step(rc, tc, mesh)
    batch = jax.device_put(jnp.asarray(_batches(8, 64)), scene_sharding(mesh))
    state, metrics = step(state, batch)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()
    assert (np.asarray(state.step) == 1).all()


def test_scenes_are_independent():
    """Each scene's params evolve from ITS data only: scene 0's params must
    equal a single-scene run on the same data."""
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True)
    tc = TrainConfig(batch_size=32, seed=0)
    mesh = make_mesh(n_devices=8)
    batches = _batches(8, 32, seed=5)

    ms_state = jax.device_put(
        create_multi_scene_state(8, rc, tc), scene_sharding(mesh)
    )
    ms_step = make_multi_scene_step(rc, tc, mesh)
    ms_state, _ = ms_step(
        ms_state, jax.device_put(jnp.asarray(batches), scene_sharding(mesh))
    )

    # Single-scene run with the same seed/key derivation as scene 0.
    solo = create_train_state(rc, tc, rng=jax.random.PRNGKey(tc.seed))
    solo_step = make_train_step(rc, tc)
    solo, _ = solo_step(solo, jnp.asarray(batches[0]))

    a = np.asarray(jax.tree.leaves(ms_state.params)[0])[0]  # scene 0 slice
    b = np.asarray(jax.tree.leaves(solo.params)[0])
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_multi_scene_sharded_layout():
    rc = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0, perturb=False)
    tc = TrainConfig(batch_size=16)
    mesh = make_mesh(n_devices=8)
    state = jax.device_put(
        create_multi_scene_state(8, rc, tc), scene_sharding(mesh)
    )
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.shape[0] == 8
    assert len(leaf.addressable_shards) == 8
    assert leaf.addressable_shards[0].data.shape[0] == 1  # one scene/device


def test_multi_scene_with_occupancy():
    """Per-scene occupancy grids: stacked, refreshed, and consumed by the
    shared step — one grid per device."""
    from nerfmlp_tpu.parallel.multi_scene import (
        create_multi_scene_grids,
        make_multi_scene_grid_update,
    )

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=True, aabb=(-1, -1, -1, 1, 1, 1),
                      use_occupancy=True, occ_grid_size=8,
                      occ_dense_samples=16)
    tc = TrainConfig(batch_size=32)
    mesh = make_mesh(n_devices=8)
    state = jax.device_put(create_multi_scene_state(8, rc, tc),
                           scene_sharding(mesh))
    grids = jax.device_put(create_multi_scene_grids(8, rc),
                           scene_sharding(mesh))
    upd = make_multi_scene_grid_update(rc, mesh)
    rngs = jax.device_put(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(8, dtype=jnp.uint32)),
        scene_sharding(mesh),
    )
    grids = upd(grids, state.params, rngs, jnp.float32(0.95))
    assert jax.tree.leaves(grids)[0].shape == (8, 8, 8, 8)

    step = make_multi_scene_step(rc, tc, mesh)
    batch = jax.device_put(jnp.asarray(_batches(8, 32)), scene_sharding(mesh))
    state, m = step(state, batch, grids)
    assert np.isfinite(np.asarray(m["loss"])).all()
    assert "grad_norm" in m  # shared step rule: full metric set


def test_multi_scene_dp_2d_mesh_matches_unsharded():
    """2 scenes x 4 data shards on the 8 fake devices: the GSPMD 2-D step
    must equal a plain single-device vmap of the same stacked states and
    batches (layout, not math), with per-scene states physically pinned to
    their scene group."""
    from nerfmlp_tpu.parallel.multi_scene import (
        make_multi_scene_dp_step,
        make_scene_mesh,
    )

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True)
    tc = TrainConfig(batch_size=64)
    batch = _batches(2, 64, seed=9)

    # Reference: unsharded vmap of the shared step rule.
    from nerfmlp_tpu.parallel.train_step import make_step_fn

    ref_state = create_multi_scene_state(2, rc, tc)
    ref_step = jax.jit(
        jax.vmap(lambda s, b: make_step_fn(rc, tc)(s, b, None))
    )
    ref_state, ref_m = ref_step(ref_state, jnp.asarray(batch))

    mesh = make_scene_mesh(n_scenes=2, n_devices=8)
    assert dict(mesh.shape) == {"scene": 2, "data": 4}
    step, state_sh, batch_sh = make_multi_scene_dp_step(rc, tc, mesh)
    state = jax.device_put(create_multi_scene_state(2, rc, tc), state_sh)
    state, m = step(state, jax.device_put(jnp.asarray(batch), batch_sh))

    np.testing.assert_allclose(
        np.asarray(m["loss"]), np.asarray(ref_m["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    # Each scene's params replicate over its own 4-device data group:
    # 2 scene-shards x 4 replicas = 8 addressable shards, split on axis 0.
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.addressable_shards) == 8
    assert leaf.addressable_shards[0].data.shape[0] == 1


def test_multi_scene_cli_scene_dp(tmp_path):
    """train_multi_scene.py with 2 scenes on the 8 fake devices takes the
    (scene=2, data=4) mesh path end-to-end and writes per-scene ckpts."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene
    from scripts.train_multi_scene import main

    dirs = []
    for i in range(2):
        d = str(tmp_path / f"scene{i}")
        make_synthetic_scene(d, n_train=3, n_val=1, n_test=1,
                             img_wh=(24, 24), seed=i)
        dirs.append(d)
    out = str(tmp_path / "multi_out")
    main([
        "--datadirs", *dirs, "--img_wh", "24", "24",
        "--batch_size", "64", "--iters", "6", "--save_dir", out,
        "--N_samples", "4", "--N_importance", "4",
        "--log_interval", "3", "--compute_dtype", "float32", "--no_pallas",
    ])
    assert os.path.exists(os.path.join(out, "model_scene0_final.ckpt"))
    assert os.path.exists(os.path.join(out, "model_scene1_final.ckpt"))


def test_multi_scene_per_scene_bounds():
    """with_bounds=True: every scene samples ITS OWN [near, far] — scene
    i's params must match a solo run whose config carries scene i's
    bounds (not the shared envelope)."""
    from nerfmlp_tpu.parallel.multi_scene import make_multi_scene_step
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=True)
    tc = TrainConfig(batch_size=32, seed=0)
    mesh = make_mesh(n_devices=8)
    batches = _batches(8, 32, seed=7)
    per_scene = np.stack(
        [[2.0 + 0.25 * i, 6.0 - 0.25 * i] for i in range(8)]
    ).astype(np.float32)

    state = jax.device_put(
        create_multi_scene_state(8, rc, tc), scene_sharding(mesh)
    )
    step = make_multi_scene_step(rc, tc, mesh, with_bounds=True)
    state, m = step(
        state,
        jax.device_put(jnp.asarray(batches), scene_sharding(mesh)),
        jax.device_put(jnp.asarray(per_scene), scene_sharding(mesh)),
    )
    assert np.isfinite(np.asarray(m["loss"])).all()

    for scene in (0, 3):
        rc_i = RenderConfig(
            N_samples=8, N_importance=8, perturb=True,
            near=float(per_scene[scene, 0]), far=float(per_scene[scene, 1]),
        )
        solo = create_train_state(
            rc_i, tc, rng=jax.random.PRNGKey(tc.seed + 1000 * scene)
        )
        solo, _ = make_train_step(rc_i, tc)(solo, jnp.asarray(batches[scene]))
        a = np.asarray(jax.tree.leaves(state.params)[0])[scene]
        b = np.asarray(jax.tree.leaves(solo.params)[0])
        np.testing.assert_allclose(a, b, atol=5e-3)

    # Control: scene 3 must NOT match a solo run on the SHARED envelope
    # (otherwise this test would pass with bounds silently ignored).
    solo = create_train_state(rc, tc, rng=jax.random.PRNGKey(tc.seed + 3000))
    solo, _ = make_train_step(rc, tc)(solo, jnp.asarray(batches[3]))
    a = np.asarray(jax.tree.leaves(state.params)[0])[3]
    b = np.asarray(jax.tree.leaves(solo.params)[0])
    assert np.abs(a - b).max() > 1e-6


def test_multi_scene_cli_mixed_datasets(tmp_path, capsys):
    """Blender + LLFF (NDC) scenes batched together: visibly different
    per-scene bounds (2-6 vs 0-1), 9-col batches widened to match the
    NDC scene's 12-col rows, per-scene checkpoints written."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from nerfmlp_tpu.data.synthetic import (
        make_synthetic_llff_scene,
        make_synthetic_scene,
    )
    from scripts.train_multi_scene import main

    d_blender = str(tmp_path / "blender_scene")
    make_synthetic_scene(d_blender, n_train=3, n_val=1, n_test=1,
                         img_wh=(24, 24), seed=0)
    d_llff = str(tmp_path / "llff_scene")
    make_synthetic_llff_scene(d_llff, n_images=6, img_wh=(24, 24),
                              style="forward", seed=1)
    out = str(tmp_path / "mixed_out")
    main([
        "--datadirs", d_blender, d_llff,
        "--dataset_types", "blender", "llff",
        "--img_wh", "24", "24",
        "--batch_size", "64", "--iters", "4", "--save_dir", out,
        "--N_samples", "4", "--N_importance", "4",
        "--log_interval", "2", "--compute_dtype", "float32", "--no_pallas",
    ])
    stdout = capsys.readouterr().out
    assert "blender" in stdout and "llff" in stdout
    # The NDC scene's bounds are [0, 1]; the blender scene's are not.
    import re

    nf = re.findall(r"near/far (\d+\.\d+)/(\d+\.\d+)", stdout)
    assert len(nf) == 2
    assert [float(a) for a in nf[1]] == [0.0, 1.0]
    assert float(nf[0][0]) > 1.0
    assert os.path.exists(os.path.join(out, "model_blender_scene_final.ckpt"))
    assert os.path.exists(os.path.join(out, "model_llff_scene_final.ckpt"))


def test_dp_2d_mesh_with_occupancy_matches_unsharded():
    """Occupancy on the (scene, data) 2-D mesh (r3 verdict item 4):
    2 scenes x 4 data shards on 8 fake devices with per-scene grids —
    the refreshed grids and the stepped params must equal a plain
    single-device vmap of the same stacked inputs."""
    from nerfmlp_tpu.ops.occupancy import update_grid
    from nerfmlp_tpu.parallel.multi_scene import (
        create_multi_scene_grids,
        make_multi_scene_dp_grid_update,
        make_multi_scene_dp_step,
        make_scene_mesh,
    )
    from nerfmlp_tpu.parallel.train_step import make_step_fn

    rc = RenderConfig(
        N_samples=8, N_importance=8, near=0.5, far=4.0, perturb=True,
        use_occupancy=True, aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
        occ_grid_size=8, occ_dense_samples=16,
    )
    tc = TrainConfig(batch_size=64)
    batch = _batches(2, 64, seed=11)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))

    # Reference: unsharded vmap of the same refresh + step.
    ref_state = create_multi_scene_state(2, rc, tc)
    ref_grids = create_multi_scene_grids(2, rc)
    ref_grids = jax.jit(jax.vmap(
        lambda g, p, r: update_grid(g, p, rc, r)
    ))(ref_grids, ref_state.params, rngs)
    ref_step = jax.jit(jax.vmap(make_step_fn(rc, tc)))
    ref_state, ref_m = ref_step(ref_state, jnp.asarray(batch), ref_grids)

    mesh = make_scene_mesh(n_scenes=2, n_devices=8)
    step, state_sh, batch_sh = make_multi_scene_dp_step(rc, tc, mesh)
    state = jax.device_put(create_multi_scene_state(2, rc, tc), state_sh)
    grids = jax.device_put(create_multi_scene_grids(2, rc), state_sh)
    upd = make_multi_scene_dp_grid_update(rc, mesh)
    grids = upd(grids, state.params, jax.device_put(rngs, state_sh),
                jnp.float32(0.95))
    np.testing.assert_allclose(
        np.asarray(grids.density), np.asarray(ref_grids.density), atol=1e-5
    )
    state, m = step(
        state, jax.device_put(jnp.asarray(batch), batch_sh), grids
    )
    np.testing.assert_allclose(
        np.asarray(m["loss"]), np.asarray(ref_m["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_multi_scene_cli_occupancy_2d(tmp_path):
    """CLI end-to-end: 2 scenes on 8 fake devices with --use_occupancy
    takes the (scene=2, data=4) mesh path, refreshes per-scene grids,
    and writes per-scene checkpoints."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from nerfmlp_tpu.data.synthetic import make_synthetic_scene
    from scripts.train_multi_scene import main

    dirs = []
    for i in range(2):
        d = str(tmp_path / f"scene{i}")
        make_synthetic_scene(d, n_train=3, n_val=1, n_test=1,
                             img_wh=(24, 24), seed=i)
        dirs.append(d)
    out = str(tmp_path / "occ_out")
    main([
        "--datadirs", *dirs, "--img_wh", "24", "24",
        "--batch_size", "64", "--iters", "6", "--save_dir", out,
        "--N_samples", "4", "--N_importance", "4",
        "--log_interval", "3", "--compute_dtype", "float32", "--no_pallas",
        "--use_occupancy", "--aabb", "-1.5", "-1.5", "-1.5",
        "1.5", "1.5", "1.5", "--occ_grid_size", "8",
        "--occ_dense_samples", "16", "--occ_update_every", "4",
    ])
    assert os.path.exists(os.path.join(out, "model_scene0_final.ckpt"))
    assert os.path.exists(os.path.join(out, "model_scene1_final.ckpt"))
