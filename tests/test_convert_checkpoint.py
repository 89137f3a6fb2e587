"""scripts/convert_checkpoint.py — every format pair round-trips to the
same weights. Oracle: numerical identity of the leaves across conversion
chains (the per-format mappings themselves are oracled independently in
test_import_tf.py / test_import_torch.py against the official layouts)."""

import jax
import numpy as np
import pytest

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.train.checkpoint import (
    load_params_any, save_checkpoint,
)
from scripts.convert_checkpoint import main as convert


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=0, atol=0,
        )


@pytest.fixture
def params():
    return {"coarse": init_model(jax.random.PRNGKey(3),
                                 RenderConfig().model_config())}


def test_ckpt_pth_npy_chain(tmp_path, params):
    """ckpt -> pth -> ckpt -> npy -> (load) all carry identical weights."""
    src = str(tmp_path / "a.ckpt")
    save_checkpoint(src, params)
    pth = convert(["--in", src, "--out", str(tmp_path / "b.pth")])
    ck2 = convert(["--in", pth, "--out", str(tmp_path / "c.ckpt")])
    npy = convert(["--in", ck2, "--out", str(tmp_path / "d.npy")])

    cfg = RenderConfig().model_config()
    for path in (pth, ck2, npy):
        rt = load_params_any(path, params, cfg)
        _leaves_equal(rt["coarse"], params["coarse"])


def test_full_state_params_extracted(tmp_path, params):
    """A metrics_latest.ckpt-style full training state converts by
    extracting its params (optimizer moments have no .pth/.npy analog)."""
    state = {
        "step": 7,
        "params": params,
        "opt_state": {"m": np.zeros(3)},
        "rng": np.zeros(2, np.uint32),
    }
    src = str(tmp_path / "metrics_latest.ckpt")
    save_checkpoint(src, state)
    out = convert(["--in", src, "--out", str(tmp_path / "params.ckpt")])
    rt = load_params_any(out, params, RenderConfig().model_config())
    _leaves_equal(rt["coarse"], params["coarse"])


def test_separate_fine_net_selection(tmp_path):
    """--net fine exports the fine net of a two-net checkpoint; asking for
    a fine net that is not there fails loudly."""
    rc = RenderConfig(separate_fine=True, width_fine=128)
    k = jax.random.PRNGKey(0)
    two = {
        "coarse": init_model(k, rc.model_config()),
        "fine": init_model(k, rc.model_config(fine=True)),
    }
    src = str(tmp_path / "two.ckpt")
    save_checkpoint(src, two)
    out = convert(["--in", src, "--out", str(tmp_path / "fine.pth"),
                   "--net", "fine", "--separate_fine",
                   "--netwidth_fine", "128"])
    from nerfmlp_tpu.models.import_torch import load_pth

    rt = load_pth(out, rc.model_config(fine=True))
    _leaves_equal(rt, two["fine"])

    coarse_only = str(tmp_path / "one.ckpt")
    save_checkpoint(coarse_only, {"coarse": two["coarse"]})
    with pytest.raises(SystemExit, match="no separate fine"):
        convert(["--in", coarse_only, "--out", str(tmp_path / "x.pth"),
                 "--net", "fine"])


def test_load_params_any_full_state(tmp_path, params):
    """load_params_any extracts params from a full TrainState file
    directly — `--ckpt metrics_latest.ckpt` works in every render CLI
    (r3 review: it previously crashed with a flax structure error)."""
    state = {
        "step": 3,
        "params": params,
        "opt_state": {"m": np.zeros(3)},
        "rng": np.zeros(2, np.uint32),
    }
    path = str(tmp_path / "metrics_latest.ckpt")
    save_checkpoint(path, state)
    rt = load_params_any(path, params, RenderConfig().model_config())
    _leaves_equal(rt["coarse"], params["coarse"])


def test_load_params_any_with_step(tmp_path, params):
    """with_step=True returns (params, step) in ONE decode: from the
    state for a no-step-in-name full-TrainState file, from the filename
    for stepped names (serving's hot reload uses this for /health)."""
    state = {
        "step": 41,
        "params": params,
        "opt_state": {"m": np.zeros(3)},
        "rng": np.zeros(2, np.uint32),
    }
    path = str(tmp_path / "metrics_latest.ckpt")
    save_checkpoint(path, state)
    cfg = RenderConfig().model_config()
    rt, step = load_params_any(path, params, cfg, with_step=True)
    _leaves_equal(rt["coarse"], params["coarse"])
    assert step == 41
    # Stepped filename wins without needing the state.
    p2 = str(tmp_path / "model_500.ckpt")
    save_checkpoint(p2, params)
    rt2, step2 = load_params_any(p2, params, cfg, with_step=True)
    assert step2 == 500
    _leaves_equal(rt2["coarse"], params["coarse"])


def test_net_selection_honored_for_ckpt_destination(tmp_path):
    """--net fine with a .ckpt destination writes a ONE-net checkpoint
    (it was silently ignored, r3 review)."""
    rc = RenderConfig(separate_fine=True, width_fine=128)
    k = jax.random.PRNGKey(1)
    two = {
        "coarse": init_model(k, rc.model_config()),
        "fine": init_model(k, rc.model_config(fine=True)),
    }
    src = str(tmp_path / "two.ckpt")
    save_checkpoint(src, two)
    out = convert(["--in", src, "--out", str(tmp_path / "f.ckpt"),
                   "--net", "fine", "--separate_fine",
                   "--netwidth_fine", "128"])
    from flax import serialization

    with open(out, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    assert set(raw.keys()) == {"coarse"}
    rt = load_params_any(
        out, {"coarse": two["fine"]},
        RenderConfig(width=128).model_config(),
    )
    _leaves_equal(rt["coarse"], two["fine"])
