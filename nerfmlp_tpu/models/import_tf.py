"""Import/export of official bmild/nerf ``.npy`` weight lists.

The official TF implementation checkpoints via
``np.save(path, net.get_weights())`` (example/run_nerf.py:835-839),
producing an object array of [kernel, bias, kernel, bias, ...] in layer
order: 16 trunk arrays (8 layers), then bottleneck, view, rgb, sigma pairs
— 24 arrays with viewdirs (nerfmlp/model.py:83-127 documents the order).

TF/Keras kernels are stored (in_dim, out_dim) — the SAME layout as Flax
``nn.Dense`` — so unlike the torch reference (which transposes,
model.py:95) this import is a pure reshape-free mapping. This path is the
PSNR-parity bootstrap: load official Lego weights, render, diff.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from nerfmlp_tpu.config import ModelConfig


def _trunk_names(cfg: ModelConfig) -> List[str]:
    return [f"pts_{i}" for i in range(cfg.depth)]


def _head_names(cfg: ModelConfig) -> List[str]:
    # Official .npy order after the trunk: bottleneck, view, rgb, sigma
    # (nerfmlp/model.py:86-90).
    if cfg.use_viewdirs:
        return ["bottleneck", "view", "rgb", "sigma"]
    return ["output"]


def expected_shapes(cfg: Optional[ModelConfig] = None) -> List[tuple]:
    """Kernel/bias shapes in official array order, for validation dumps."""
    cfg = cfg or ModelConfig()
    shapes = []
    for i in range(cfg.depth):
        d_in = cfg.input_ch if i == 0 else cfg.width
        if i in cfg.skips:
            # The model concatenates the encoded input before layer i
            # (including a hypothetical skip at 0, where h == x).
            d_in = d_in + cfg.input_ch
        shapes += [(d_in, cfg.width), (cfg.width,)]
    if cfg.use_viewdirs:
        shapes += [(cfg.width, cfg.bottleneck_ch), (cfg.bottleneck_ch,)]
        shapes += [
            (cfg.bottleneck_ch + cfg.input_ch_views, cfg.view_width),
            (cfg.view_width,),
        ]
        shapes += [(cfg.view_width, 3), (3,)]
        shapes += [(cfg.width, 1), (1,)]
    else:
        shapes += [(cfg.width, cfg.output_ch), (cfg.output_ch,)]
    return shapes


def params_from_numpy(
    np_arrays: Sequence[np.ndarray],
    cfg: Optional[ModelConfig] = None,
    verbose: bool = False,
) -> Dict:
    """Official weight list -> Flax param pytree for :class:`NeRFMLP`."""
    cfg = cfg or ModelConfig()
    names = _trunk_names(cfg) + _head_names(cfg)
    if len(np_arrays) != 2 * len(names):
        raise ValueError(
            f"expected {2 * len(names)} arrays for this architecture, "
            f"got {len(np_arrays)}"
        )
    exp = expected_shapes(cfg)
    params: Dict = {}
    for li, name in enumerate(names):
        kernel = np.asarray(np_arrays[2 * li], dtype=np.float32)
        bias = np.asarray(np_arrays[2 * li + 1], dtype=np.float32)
        if kernel.shape != exp[2 * li] or bias.shape != exp[2 * li + 1]:
            raise ValueError(
                f"layer {name}: got kernel {kernel.shape} / bias {bias.shape}, "
                f"expected {exp[2 * li]} / {exp[2 * li + 1]}"
            )
        if verbose:
            print(f"loading {name}: kernel {kernel.shape}, bias {bias.shape}")
        params[name] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    return params


def params_to_numpy(params: Dict, cfg: Optional[ModelConfig] = None) -> List[np.ndarray]:
    """Flax param pytree -> official-order weight list (round-trip export)."""
    cfg = cfg or ModelConfig()
    out: List[np.ndarray] = []
    for name in _trunk_names(cfg) + _head_names(cfg):
        out.append(np.asarray(params[name]["kernel"], dtype=np.float32))
        out.append(np.asarray(params[name]["bias"], dtype=np.float32))
    return out


def load_npy_weights(path: str) -> List[np.ndarray]:
    """Load an official ``.npy`` object-array checkpoint from disk."""
    arrs = np.load(path, allow_pickle=True)
    return [np.asarray(a) for a in arrs]
