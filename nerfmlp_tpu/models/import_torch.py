"""Import of the torch reference's ``.pth`` checkpoints.

The reference writes two ``.pth`` shapes (SURVEY §5.4 formats (a)/(b)):
  (a) bare ``model.state_dict()`` — ``model_best.pth``, ``model_{step}.pth``,
      ``model_final.pth`` (scripts/train.py:453,481,498,564);
  (b) composite training dicts ``{model_state_dict, optimizer_state_dict,
      metrics...}`` — ``metrics_latest.pth``, ``model_full_val_final.pth``
      (scripts/train.py:468-472,576-585).
Its render CLI loads (a) via ``model.load_state_dict(torch.load(path))``
(scripts/render_example.py:207) and its trainer resumes from (b)
(scripts/train.py:296-305).

torch ``nn.Linear`` stores weights ``(out_features, in_features)``
(nerfmlp/model.py:41-55 names: ``pts_linears.{i}``, ``sigma_linear``,
``bottleneck_linear``, ``view_linear``, ``rgb_linear``, or
``output_linear`` without viewdirs) — Flax ``Dense`` kernels are
``(in, out)``, so every weight transposes; biases map verbatim. The skip
concatenation order matches (both put the encoded input FIRST:
model.py:64 ``cat([x, h])`` == models/mlp.py:68), so no row permutation
is needed.

This file never imports torch at module scope: the ``.pth`` path is the
only place the framework touches torch, and it must stay optional.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from nerfmlp_tpu.config import ModelConfig
from nerfmlp_tpu.models.import_tf import expected_shapes


# torch reference layer name -> our Flax layer name (nerfmlp/model.py:41-55
# vs models/mlp.py:69-79).
_HEAD_MAP = {
    "sigma_linear": "sigma",
    "bottleneck_linear": "bottleneck",
    "view_linear": "view",
    "rgb_linear": "rgb",
    "output_linear": "output",
}


def _layer_names(cfg: ModelConfig) -> Dict[str, str]:
    names = {f"pts_linears.{i}": f"pts_{i}" for i in range(cfg.depth)}
    if cfg.use_viewdirs:
        for k in ("sigma_linear", "bottleneck_linear", "view_linear", "rgb_linear"):
            names[k] = _HEAD_MAP[k]
    else:
        names["output_linear"] = _HEAD_MAP["output_linear"]
    return names


def params_from_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    cfg: Optional[ModelConfig] = None,
) -> Dict:
    """torch ``state_dict()`` -> Flax param pytree for :class:`NeRFMLP`.

    Accepts torch tensors or numpy arrays as values. Weights are
    transposed ``(out, in) -> (in, out)``; shapes are validated against
    the architecture so a wrong ``--netdepth/--netwidth`` fails loudly
    instead of silently loading garbage.
    """
    cfg = cfg or ModelConfig()
    names = _layer_names(cfg)
    exp = expected_shapes(cfg)
    # expected_shapes lists (kernel, bias) pairs in official .npy order:
    # trunk 0..D-1, then bottleneck, view, rgb, sigma (import_tf.py:29-34).
    order = [f"pts_{i}" for i in range(cfg.depth)] + (
        ["bottleneck", "view", "rgb", "sigma"] if cfg.use_viewdirs else ["output"]
    )
    exp_by_name = {
        name: (exp[2 * i], exp[2 * i + 1]) for i, name in enumerate(order)
    }

    def to_np(v) -> np.ndarray:
        if hasattr(v, "detach"):  # torch tensor, without importing torch
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    missing = [
        k for k in names
        if f"{k}.weight" not in state_dict or f"{k}.bias" not in state_dict
    ]
    if missing:
        raise ValueError(
            f"torch state_dict is missing layers (or their biases) "
            f"{missing} for this architecture (depth={cfg.depth}, "
            f"use_viewdirs={cfg.use_viewdirs}); "
            f"present keys: {sorted(state_dict.keys())[:8]}..."
        )
    extra = {
        k.rsplit(".", 1)[0]
        for k in state_dict
        if k.rsplit(".", 1)[0] not in names
    }
    if extra:
        raise ValueError(
            f"torch state_dict has layers {sorted(extra)} this architecture "
            f"does not (expected depth={cfg.depth}) — pass the matching "
            f"--netdepth/--netwidth"
        )

    params: Dict = {}
    for torch_name, our_name in names.items():
        kernel = to_np(state_dict[f"{torch_name}.weight"]).T  # (out,in)->(in,out)
        bias = to_np(state_dict[f"{torch_name}.bias"])
        want_k, want_b = exp_by_name[our_name]
        if kernel.shape != want_k or bias.shape != want_b:
            raise ValueError(
                f"layer {torch_name}: kernel {kernel.shape} / bias "
                f"{bias.shape}, expected {want_k} / {want_b} — architecture "
                f"mismatch"
            )
        params[our_name] = {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(bias),
        }
    return params


def load_pth(path: str, cfg: Optional[ModelConfig] = None) -> Dict:
    """Load a reference ``.pth`` checkpoint (bare state_dict OR composite
    ``{model_state_dict, ...}`` training dict) into our param pytree.

    Requires torch (available in this environment; the framework's compute
    path never touches it)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"loading {path} requires torch for .pth deserialization: {e}"
        )
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Composite dicts carry plain-python metrics that strict
        # weights_only deserialization can reject on some torch versions.
        blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]  # composite format (b)
    if not isinstance(blob, (dict, Mapping)):
        raise ValueError(f"{path} does not contain a torch state_dict")
    return params_from_torch_state_dict(blob, cfg)


def params_to_torch_state_dict(params: Dict, cfg: Optional[ModelConfig] = None):
    """Flax param pytree -> a torch ``state_dict`` (the export mirror, so a
    model trained here can be loaded by the reference's render CLI)."""
    import torch

    cfg = cfg or ModelConfig()
    sd = {}
    for torch_name, our_name in _layer_names(cfg).items():
        sd[f"{torch_name}.weight"] = torch.from_numpy(
            np.asarray(params[our_name]["kernel"], dtype=np.float32).T.copy()
        )
        sd[f"{torch_name}.bias"] = torch.from_numpy(
            np.asarray(params[our_name]["bias"], dtype=np.float32).copy()
        )
    return sd
