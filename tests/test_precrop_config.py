"""Precrop / per-image sampling / --config file expansion."""

import os

import numpy as np

from nerfmlp_tpu.data.pipeline import RayBatchLoader


class _FakeDs:
    def __init__(self, n_images=3, H=10, W=10):
        n = n_images * H * W
        self.n_images, self.H, self.W = n_images, H, W
        # Encode the flat index into the ray origin so tests can decode it.
        idx = np.arange(n, dtype=np.float32)
        self.all_rays_o = np.stack([idx, idx, idx], -1)
        self.all_rays_d = np.ones((n, 3), np.float32)
        self.all_rgbs = np.zeros((n, 3), np.float32)


def test_precrop_restricts_to_center():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=64, seed=0)
    loader.set_precrop(0.5)
    for _ in range(5):
        b = loader.next_batch()
        flat = b[:, 0].astype(int)
        img = flat // 100
        row = (flat % 100) // 10
        col = flat % 10
        assert (img == img[0]).all()  # one image per batch under precrop
        # central 50% of a 10-wide image: rows/cols in [2.5, 7.5) -> {3..7}
        assert row.min() >= 2 and row.max() <= 7
        assert col.min() >= 2 and col.max() <= 7


def test_image_mode_single_image_batches():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=32, seed=1, image_mode=True)
    imgs = set()
    for _ in range(10):
        b = loader.next_batch()
        img = set((b[:, 0].astype(int) // 100).tolist())
        assert len(img) == 1
        imgs |= img
    assert len(imgs) > 1  # different images across batches


def test_precrop_off_restores_global_sampling():
    ds = _FakeDs()
    loader = RayBatchLoader.from_dataset(ds, batch_size=64, seed=0)
    loader.set_precrop(0.5)
    loader.next_batch()
    loader.set_precrop(1.0)
    b = loader.next_batch()
    assert len(set((b[:, 0].astype(int) // 100).tolist())) > 1  # global again


def test_config_file_expansion(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.train import parse_args

    cfg = tmp_path / "lego.cfg"
    cfg.write_text(
        "batch_size = 512\n"
        "iters = 777\n"
        "# a comment\n"
        "lindisp = true\n"
        "img_wh = 64 64\n"
        "coarse_loss = false\n"
    )
    args = parse_args(["--config", str(cfg), "--datadir", "/x", "--iters", "999"])
    assert args.batch_size == 512
    assert args.iters == 999          # explicit CLI flag wins
    assert args.lindisp is True
    assert args.coarse_loss is False  # 'false' values are dropped
    assert args.img_wh == [64, 64]


def test_config_file_falsy_disables_default_true_flags(tmp_path):
    """'use_pallas = False' in a --config file must actually disable
    pallas (default True): the expander emits the --no_pallas opt-out
    instead of silently dropping the line."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.train import parse_args

    cfg = tmp_path / "opt_out.cfg"
    cfg.write_text("use_pallas = False\nuse_viewdirs = 0\n")
    args = parse_args(["--config", str(cfg), "--datadir", "/x"])
    assert args.use_pallas is False
    assert args.use_viewdirs is False
    # Explicit CLI still wins over the config file.
    args2 = parse_args(["--config", str(cfg), "--datadir", "/x", "--use_viewdirs"])
    assert args2.use_viewdirs is True
