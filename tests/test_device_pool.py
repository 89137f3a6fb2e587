"""Device-resident ray pool (data/device_pool.py + make_pool_step).

Oracles are independent: epoch coverage is checked set-theoretically
against the raw pool rows, and the pool step is checked bit-for-bit
against the host-batch step fed the identical rows — the two paths share
the update rule but read the batch from different sources.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.data.blender import BlenderDataset
from nerfmlp_tpu.data.device_pool import DeviceRayPool
from nerfmlp_tpu.parallel.train_step import (
    create_train_state,
    make_pool_step,
    make_train_step,
)
from nerfmlp_tpu.train.loop import Trainer


def _row_pool(n, feat=9, seed=0):
    rng = np.random.default_rng(seed)
    pool = rng.normal(size=(n, feat)).astype(np.float32)
    pool[:, 0] = np.arange(n)  # row id for coverage checks
    return pool


def test_epoch_covers_every_ray_once():
    pool = _row_pool(40)
    dp = DeviceRayPool(pool, batch_size=8)
    assert dp.steps_per_epoch == 5
    stack = np.asarray(dp.ensure_epoch(0))
    assert stack.shape == (5, 8, 9)
    ids = sorted(stack[..., 0].reshape(-1).astype(int).tolist())
    assert ids == list(range(40))  # every ray exactly once
    # A different epoch is a different order (fold_in on the epoch).
    stack1 = np.asarray(dp.ensure_epoch(1))
    assert not np.array_equal(stack, stack1)
    # Same epoch re-request is a no-op (cached object).
    s0 = dp.ensure_epoch(1)
    assert dp.ensure_epoch(1) is s0


def test_tail_rays_sit_epoch_out():
    pool = _row_pool(43)
    dp = DeviceRayPool(pool, batch_size=8)
    assert dp.steps_per_epoch == 5
    ids = np.asarray(dp.ensure_epoch(0))[..., 0].reshape(-1).astype(int)
    assert len(ids) == 40 and len(set(ids.tolist())) == 40


def test_pool_smaller_than_batch_raises():
    with pytest.raises(ValueError):
        DeviceRayPool(_row_pool(7), batch_size=8)


def test_epoch_of():
    dp = DeviceRayPool(_row_pool(40), batch_size=8)  # 5 steps/epoch
    assert [dp.epoch_of(s) for s in (0, 4, 5, 9, 10)] == [0, 0, 1, 1, 2]


def test_pool_step_matches_host_step():
    """The pool step and the host-batch step share the update rule and the
    RNG fold (keyed on state.step), so feeding the host step the SAME rows
    the pool step indexes must produce the same states (up to compiler
    fp-reassociation between the two programs)."""
    rc = RenderConfig(N_samples=8, N_importance=8, near=2.0, far=6.0,
                      perturb=True)
    tc = TrainConfig(batch_size=16)
    rng = np.random.default_rng(3)
    pool = rng.normal(size=(16 * 3 + 5, 9)).astype(np.float32)
    pool[:, 5] = -1.0  # downward rays: finite sample geometry
    pool[:, 6:9] = np.abs(pool[:, 6:9]) % 1.0

    dp = DeviceRayPool(pool, batch_size=16)
    pool_step = make_pool_step(rc, tc, dp.steps_per_epoch)
    host_step = make_train_step(rc, tc)

    state_a = create_train_state(rc, tc)
    state_b = create_train_state(rc, tc)
    for s in range(1, 5):  # crosses the epoch boundary at step 4
        stack = dp.ensure_epoch(dp.epoch_of(s - 1))
        host_batch = jnp.asarray(
            np.asarray(stack)[(s - 1) % dp.steps_per_epoch]
        )
        state_a, m_a = pool_step(state_a, stack)
        state_b, m_b = host_step(state_b, host_batch)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
        )
    flat_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7)


def test_pool_step_sharded_matches_local():
    """Over an 8-device mesh the stack shards (None, 'data', None); the
    sharded pool step must match the single-device pool step exactly
    (GSPMD inserts the grad all-reduce)."""
    from nerfmlp_tpu.parallel.mesh import make_mesh, replicated_sharding

    rc = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                      perturb=False)
    tc = TrainConfig(batch_size=32)
    rng = np.random.default_rng(5)
    pool = rng.normal(size=(96, 9)).astype(np.float32)
    pool[:, 5] = -1.0
    pool[:, 6:9] = np.abs(pool[:, 6:9]) % 1.0

    mesh = make_mesh(n_devices=8)
    dp_m = DeviceRayPool(pool, batch_size=32, mesh=mesh)
    step_m = make_pool_step(rc, tc, dp_m.steps_per_epoch, mesh=mesh)
    state_m = jax.device_put(create_train_state(rc, tc),
                             replicated_sharding(mesh))

    dp_l = DeviceRayPool(pool, batch_size=32)
    step_l = make_pool_step(rc, tc, dp_l.steps_per_epoch)
    state_l = create_train_state(rc, tc)

    for s in range(1, 4):
        state_m, _ = step_m(state_m, dp_m.ensure_epoch(dp_m.epoch_of(s - 1)))
        state_l, _ = step_l(state_l, dp_l.ensure_epoch(dp_l.epoch_of(s - 1)))
    a = jax.tree_util.tree_leaves(jax.device_get(state_m.params))
    b = jax.tree_util.tree_leaves(jax.device_get(state_l.params))
    for x, y in zip(a, b):
        # Same tolerance as the sharded-vs-single step equivalence in
        # test_parallel.py: the 8-way grad all-reduce reassociates fp sums.
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-5)


def _mk_trainer(scene, save_dir, device_pool, precrop=0, **tc_kw):
    ds = BlenderDataset(scene, "train", img_wh=(40, 40))
    val = BlenderDataset(scene, "val", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                      perturb=True)
    tc = TrainConfig(
        batch_size=256, iters=30, quick_val_interval=15,
        full_val_interval=0, quick_val_subset=1, log_interval=10,
        ckpt_interval=30, precrop_iters=precrop, precrop_frac=0.6,
        device_pool=device_pool, **tc_kw,
    )
    return Trainer(rc, tc, ds, val, val, save_dir=save_dir, verbose=False)


def test_trainer_device_pool_end_to_end(synthetic_scene, tmp_path):
    """Trainer with device_pool trains, validates, and checkpoints on the
    normal cadence — including a precrop phase that streams from host
    before the pool takes over."""
    t = _mk_trainer(synthetic_scene, str(tmp_path / "dp"), device_pool=True,
                    precrop=7)
    m = t.train()
    assert t.pool is not None and t.pool.epoch >= 0
    assert len(m["iteration_times"]) == 30
    assert m["val_steps"] == [15, 30]
    assert np.isfinite(m["train_losses"]).all()
    assert os.path.exists(os.path.join(str(tmp_path / "dp"), "model_30.ckpt"))


def test_trainer_device_pool_learns_like_host(synthetic_scene, tmp_path):
    """Same scene/seed/step count: the pool-fed run must reach the same
    quality band as the host-streamed run (different batch ORDER — the
    shuffles differ — so metrics match statistically, not exactly)."""
    th = _mk_trainer(synthetic_scene, str(tmp_path / "h"), device_pool=False)
    mh = th.train()
    tp = _mk_trainer(synthetic_scene, str(tmp_path / "p"), device_pool=True)
    mp = tp.train()
    ph = mh["quick_val_psnrs"][-1]
    pp = mp["quick_val_psnrs"][-1]
    assert abs(ph - pp) < 3.0, (ph, pp)


def test_trainer_device_pool_resume_epoch(synthetic_scene, tmp_path):
    """Resuming mid-epoch reconstructs the same epoch stack (the shuffle
    key is fold_in(seed, epoch), not run-local state)."""
    save = str(tmp_path / "res")
    t1 = _mk_trainer(synthetic_scene, save, device_pool=True)
    t1.train(iters=20)
    stack_before = np.asarray(t1.pool.ensure_epoch(t1.pool.epoch_of(20)))

    t2 = _mk_trainer(synthetic_scene, save, device_pool=True)
    assert t2.resume(os.path.join(save, "metrics_latest.ckpt"))
    t2.train()
    stack_after = np.asarray(t2.pool.ensure_epoch(t2.pool.epoch_of(20)))
    np.testing.assert_array_equal(stack_before, stack_after)


def test_device_pool_ignored_with_no_batching(synthetic_scene, tmp_path):
    t = _mk_trainer(synthetic_scene, str(tmp_path / "nb"), device_pool=True,
                    no_batching=True)
    assert t.pool is None
    m = t.train()
    assert len(m["iteration_times"]) == 30


def test_device_pool_scan_dispatch_matches_single_step(synthetic_scene,
                                                       tmp_path):
    """device_pool + steps_per_dispatch composes (make_pool_scan): the
    pooled K-window scan runs the SAME math as K pooled single dispatches
    — identical batch indexing (state.step % spe inside the scan), RNG
    folding, and event cadence — across log/quick-val boundaries AND an
    epoch boundary (batch 512 -> 18 steps/epoch < 30 iters; windows are
    capped at the reshuffle, never reading two stacks)."""
    def mk(name, k):
        ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
        val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
        near, far = ds.dynamic_near_far()
        rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                          perturb=True)
        tc = TrainConfig(batch_size=512, iters=30, quick_val_interval=15,
                         full_val_interval=0, quick_val_subset=1,
                         log_interval=10, ckpt_interval=30,
                         device_pool=True, steps_per_dispatch=k)
        return Trainer(rc, tc, ds, val, val,
                       save_dir=str(tmp_path / name), verbose=False)

    t1 = mk("ps1", 1)
    assert t1.pool is not None and t1.pool.steps_per_epoch == 18
    m1 = t1.train()
    t5 = mk("ps5", 5)
    assert t5.pool is not None and t5.pool_scan is not None
    assert t5.scan_fn is None  # the host-streamed scan is NOT built
    m5 = t5.train()
    assert t5.pool.epoch == 1  # the run crossed the epoch boundary

    a, _ = jax.tree_util.tree_flatten(jax.device_get(t1.state.params))
    b, _ = jax.tree_util.tree_flatten(jax.device_get(t5.state.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-6)
    assert m1["val_steps"] == m5["val_steps"]
    assert len(m1["iteration_times"]) == len(m5["iteration_times"]) == 30
    np.testing.assert_allclose(m1["train_losses"], m5["train_losses"],
                               rtol=1e-3)


def test_device_pool_scan_occupancy_refresh_cadence(synthetic_scene,
                                                    tmp_path):
    """Pooled scan windows break at occ_update_every so the grid refresh
    fires on the same steps with the same RNG fold as per-step dispatch."""
    def spy(t):
        folds, orig = [], t._occ_update

        def f(grid, params, rng, decay):
            folds.append(np.asarray(rng))
            return orig(grid, params, rng, decay)

        t._occ_update = f
        return folds

    def mk(name, k):
        ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
        val = BlenderDataset(synthetic_scene, "val", img_wh=(40, 40))
        near, far = ds.dynamic_near_far()
        rc = RenderConfig(N_samples=8, N_importance=8, near=near, far=far,
                          perturb=True, use_occupancy=True,
                          aabb=(-1.5, -1.5, -1.2, 1.5, 1.5, 1.5),
                          occ_grid_size=16, occ_dense_samples=16,
                          occ_update_every=10)
        tc = TrainConfig(batch_size=256, iters=30, quick_val_interval=15,
                         full_val_interval=0, quick_val_subset=1,
                         log_interval=10, ckpt_interval=30,
                         device_pool=True, steps_per_dispatch=k)
        return Trainer(rc, tc, ds, val, val,
                       save_dir=str(tmp_path / name), verbose=False)

    t1 = mk("oc1", 1)
    f1 = spy(t1)
    t1.train()
    t5 = mk("oc5", 5)
    assert t5.pool_scan is not None
    f5 = spy(t5)
    t5.train()
    assert len(f1) == len(f5) == 3  # steps 1, 11, 21
    for x, y in zip(f1, f5):
        np.testing.assert_array_equal(x, y)


def test_epoch_shuffle_matches_host_truth():
    """The pool's jitted epoch shuffle must equal pool[perm] computed on
    host — bit-exact (r5: the jnp.take formulation MISCOMPILED on the TPU
    backend at mid-size pools, fabricating NaNs from clean inputs and
    NaN-ing every 200^2-class training at step 1; the bracket-index
    formulation validated clean at all probed sizes;
    tools/pool_miscompile_probe.py). On CPU both forms are fine — this
    test pins the formulation's SEMANTICS; the standalone probe guards
    the backend."""
    import jax

    n, B, F = 10_240, 256, 9
    rng = np.random.default_rng(3)
    pool_h = rng.uniform(0.1, 1.0, size=(n, F)).astype(np.float32)
    p = DeviceRayPool(pool_h, batch_size=B, seed=5)
    stack = np.asarray(p.ensure_epoch(2))
    key = jax.random.fold_in(jax.random.PRNGKey(5), 2)
    perm = np.asarray(jax.random.permutation(key, n))[: (n // B) * B]
    want = pool_h[perm].reshape(n // B, B, F)
    np.testing.assert_array_equal(stack, want)
    assert not np.isnan(stack).any()
