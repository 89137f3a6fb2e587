"""Multi-device data parallelism on the 8 fake CPU devices (conftest):
the full training step jitted over a Mesh, batch sharded, grads reduced."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from nerfmlp_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)


def _cfgs(batch):
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=True)
    tc = TrainConfig(batch_size=batch, seed=0)
    return rc, tc


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.normal(size=(n, 9)).astype(np.float32)
    b[:, 5] = -1.0
    b[:, 6:9] = np.abs(b[:, 6:9]) % 1.0
    return b


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_step_runs_and_is_finite():
    rc, tc = _cfgs(64)
    mesh = make_mesh(n_devices=8)
    state = jax.device_put(create_train_state(rc, tc), replicated_sharding(mesh))
    step = make_train_step(rc, tc, mesh=mesh)
    batch = jax.device_put(jnp.asarray(_batch(64)), batch_sharding(mesh))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_sharded_matches_single_device():
    """The 8-way sharded step must produce the same params as 1 device
    (GSPMD semantics: sharding is a layout, not a math change)."""
    rc, tc = _cfgs(32)
    batch = _batch(32, seed=3)

    state1 = create_train_state(rc, tc)
    step1 = make_train_step(rc, tc)
    state1, m1 = step1(state1, jnp.asarray(batch))

    mesh = make_mesh(n_devices=8)
    state8 = jax.device_put(create_train_state(rc, tc), replicated_sharding(mesh))
    step8 = make_train_step(rc, tc, mesh=mesh)
    state8, m8 = step8(state8, jax.device_put(jnp.asarray(batch), batch_sharding(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # Adam divides by sqrt(v)+eps, amplifying float reduction-order noise
    # for near-zero grads; allow a small absolute slack on the params.
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_sharded_render_matches_single_device():
    """render_image_sharded over the 8-device mesh == render_image on one
    device (sharding is placement, not math), including the padded tail,
    per-ray bounds, viewdirs, and a second map."""
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.render import render_image_maps
    from nerfmlp_tpu.parallel.render_parallel import render_image_sharded

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=False)
    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    H = W = 12  # 144 rays: not a multiple of tile*8 -> exercises padding
    rng = np.random.default_rng(5)
    o = np.tile([[0.0, 0.0, 4.0]], (H * W, 1)).astype(np.float32)
    d = rng.normal(size=(H * W, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    near = np.full((H * W,), 2.0, np.float32)
    near[: H * W // 2] = 1.5  # heterogeneous per-ray bounds

    single = render_image_maps(
        params, jnp.asarray(o), jnp.asarray(d), H, W, rc, tile=64,
        near=jnp.asarray(near), maps=("rgb_map", "disp_map"),
    )
    mesh = make_mesh(n_devices=8)
    sharded = render_image_sharded(
        params, o, d, H, W, rc, mesh, tile=8, near=near,
        maps=("rgb_map", "disp_map"),
    )
    for key in ("rgb_map", "disp_map"):
        np.testing.assert_allclose(
            np.asarray(single[key]), sharded[key], rtol=2e-4, atol=2e-5
        )


def test_render_path_mesh_matches_local(tmp_path):
    """render_path(mesh=) (the i_video/i_testset/render_only plumbing)
    reproduces the local render, incl. the NDC-less viewdirs=None path."""
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.render_path import render_path

    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=False)
    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    pose = np.eye(4, dtype=np.float32)[:3]
    pose[2, 3] = 4.0
    poses = np.stack([pose, pose])
    hwf = (10, 10, 12.0)

    local = render_path(params, poses, hwf, rc, tile=64, verbose=False)
    mesh = make_mesh(n_devices=8)
    sharded = render_path(params, poses, hwf, rc, tile=64, verbose=False,
                          mesh=mesh)
    for a, b in zip(local[:2], sharded[:2]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_trainer_render_mesh_validation_matches(synthetic_scene):
    """A Trainer over a pure-DP mesh shards its validation renders
    (render_mesh set) and reports the same full-val metrics as a meshless
    Trainer with identical (seed-equal) params."""
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                      perturb=True)
    tc = TrainConfig(batch_size=64, seed=0, chunk=512)

    t_local = Trainer(rc, tc, ds, val_ds=val, verbose=False,
                      save_dir="/tmp/_tr_local")
    mesh = make_mesh(n_devices=8)
    t_mesh = Trainer(rc, tc, ds, val_ds=val, mesh=mesh, verbose=False,
                     save_dir="/tmp/_tr_mesh")
    assert t_local.render_mesh is None
    assert t_mesh.render_mesh is mesh

    m_local = t_local.full_validate()
    m_mesh = t_mesh.full_validate()
    assert abs(m_local["psnr"] - m_mesh["psnr"]) < 0.05
    assert abs(m_local["ssim"] - m_mesh["ssim"]) < 1e-3


def test_tp_mesh_keeps_local_render():
    """data_parallel_mesh rejects a >1 "model" axis (TP params are
    sharded; replicating them for the render path would be wrong)."""
    from nerfmlp_tpu.parallel.render_parallel import data_parallel_mesh
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()).reshape(4, 2)
    tp_mesh = Mesh(devs, ("data", "model"))
    assert data_parallel_mesh(tp_mesh) is None
    dp_mesh = make_mesh(n_devices=8)
    assert data_parallel_mesh(dp_mesh) is dp_mesh
    assert data_parallel_mesh(None) is None
    assert data_parallel_mesh(make_mesh(n_devices=1)) is None


def test_sharded_render_with_occupancy_grid():
    """The occupancy grid replicates; the sharded occ render stays finite
    and matches the single-device occ render."""
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.occupancy import build_grid
    from nerfmlp_tpu.ops.render import render_image
    from nerfmlp_tpu.parallel.render_parallel import render_image_sharded

    rc = RenderConfig(
        N_samples=8, N_importance=8, near=2.0, far=6.0, perturb=False,
        use_occupancy=True, occ_grid_size=8, occ_dense_samples=16,
        aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
    )
    params = {"coarse": init_model(jax.random.PRNGKey(0), rc.model_config())}
    grid = build_grid(params, rc, jax.random.PRNGKey(1), resolution=8,
                      refreshes=2)
    H = W = 8
    o = np.tile([[0.0, 0.0, 4.0]], (H * W, 1)).astype(np.float32)
    d = np.tile([[0.0, 0.0, -1.0]], (H * W, 1)).astype(np.float32)

    single = np.asarray(render_image(
        params, jnp.asarray(o), jnp.asarray(d), H, W, rc, tile=32,
        occ_grid=grid,
    ))
    mesh = make_mesh(n_devices=8)
    sharded = render_image_sharded(
        params, o, d, H, W, rc, mesh, tile=8, occ_grid=grid,
    )["rgb_map"]
    np.testing.assert_allclose(single, sharded, rtol=2e-4, atol=2e-5)


def test_batch_actually_sharded():
    mesh = make_mesh(n_devices=8)
    batch = jax.device_put(jnp.asarray(_batch(64)), batch_sharding(mesh))
    assert len(batch.addressable_shards) == 8
    assert batch.addressable_shards[0].data.shape == (8, 9)


def test_graft_entry_contract():
    """The driver's contract: entry() compiles, dryrun_multichip(8) runs."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 3)
    ge.dryrun_multichip(8)


def test_tensor_parallel_matches_single_device():
    """TP demo (SURVEY §2.5): Megatron column/row param shardings over a
    (data=2, model=4) mesh — GSPMD must treat them as pure layout, giving
    the same math as one device, with params/Adam moments actually split
    on the model axis."""
    from jax.sharding import PartitionSpec as P

    from nerfmlp_tpu.parallel.tensor_parallel import (
        make_tp_mesh,
        make_tp_train_step,
        tp_state_sharding,
    )

    rc, tc = _cfgs(32)
    batch = _batch(32, seed=5)

    state1 = create_train_state(rc, tc)
    step1 = make_train_step(rc, tc)
    state1, m1 = step1(state1, jnp.asarray(batch))

    mesh = make_tp_mesh(n_devices=8, model_parallel=4)
    state_tp = create_train_state(rc, tc)
    shardings = tp_state_sharding(state_tp, mesh)
    # The rule actually shards: even trunk kernels column, odd ones row.
    assert shardings.params["coarse"]["pts_0"]["kernel"].spec == P(None, "model")
    assert shardings.params["coarse"]["pts_1"]["kernel"].spec == P("model", None)
    assert shardings.params["coarse"]["rgb"]["kernel"].spec == P("model", None)
    state_tp = jax.device_put(state_tp, shardings)
    step_tp, _ = make_tp_train_step(rc, tc, mesh, state_sharding=shardings)
    b = jax.device_put(
        jnp.asarray(batch), jax.NamedSharding(mesh, P("data"))
    )
    state_tp, m_tp = step_tp(state_tp, b)

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]), rtol=1e-5)
    for a, c in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state_tp.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-3)
    # A column-sharded kernel is physically split 4 ways on the model axis
    # (2 data-replicas x 4 model-shards = 8 addressable shards).
    k = state_tp.params["coarse"]["pts_0"]["kernel"]
    assert len(k.addressable_shards) == 8
    assert k.addressable_shards[0].data.shape == (63, 64)
