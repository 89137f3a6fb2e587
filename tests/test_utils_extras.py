"""utils helpers, remat flag, tensorboard wiring."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.utils import to8b, save_png, load_png


def test_to8b():
    x = np.array([-0.5, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_array_equal(to8b(x), [0, 0, 127, 255, 255])


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_png(p, img)
    back = load_png(p)
    assert back.shape == (8, 8, 3)
    assert np.abs(back - img).max() < 1.0 / 255 + 1e-6


def test_remat_matches_plain():
    import dataclasses

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.render import render_rays

    cfg = RenderConfig(N_samples=8, N_importance=8, perturb=False)
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    o = jnp.zeros((6, 3)).at[:, 2].set(4.0)
    d = jnp.ones((6, 3)) * jnp.array([0.1, 0.1, -1.0])

    def loss(p, c):
        return jnp.mean(render_rays(p, o, d, None, c)["rgb_map"] ** 2)

    cfg_r = dataclasses.replace(cfg, remat=True)
    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tensorboard_writes_events(synthetic_scene, tmp_path):
    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.train.loop import Trainer

    ds = BlenderDataset(synthetic_scene, "train", img_wh=(40, 40))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=8, N_importance=0, near=near, far=far, perturb=True)
    tc = TrainConfig(batch_size=128, iters=20, quick_val_interval=20,
                     full_val_interval=0, log_interval=10, quick_val_subset=1)
    tb_dir = str(tmp_path / "tb")
    t = Trainer(rc, tc, ds, ds, ds, save_dir=str(tmp_path / "out"),
                verbose=False, tensorboard_dir=tb_dir)
    t.train()
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no tensorboard event files written"
