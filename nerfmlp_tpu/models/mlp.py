"""The NeRF MLP as a Flax module.

Architecture parity with nerfmlp/model.py:28-81:
  * ``depth`` (8) Dense+ReLU trunk layers of ``width`` (256),
  * the *encoded* input is concatenated into the trunk immediately before
    layer index 5 (model.py:62-64) — equivalent to the official TF layout
    that concatenates after layer 4 (example/run_nerf_helpers.py:94-97),
    so the official 24-array weight list maps one-to-one,
  * view-dependent head: sigma (256->1), bottleneck (256->256),
    view layer (256+27->128) + ReLU, rgb (128->3); output is
    ``concat([rgb, sigma])`` — sigma LAST (model.py:77),
  * without viewdirs: a single output layer (256->output_ch).

TPU notes: the matmuls are (N, <=384) x (<=384, 256) — MXU work comes from
making N large (rays x samples are flattened before the call). Layer names
are stable (`pts_0..pts_{D-1}`, `sigma`, `bottleneck`, `view`, `rgb`,
`output`) because the TF importer and the Pallas kernel address them by
name. ``param_dtype`` stays float32; ``compute_dtype`` may be bfloat16 so
the MXU runs at full rate while optimizer state stays fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import ModelConfig


class NeRFMLP(nn.Module):
    cfg: ModelConfig = ModelConfig()
    compute_dtype: Any = jnp.float32
    # fp32 matmul strategy: "highest" (6 bf16 passes — exact-parity path)
    # or "high" (3 passes, bf16x3 — ~1e-6 relative error at ~2x speed).
    # bfloat16 mode always uses the fast single-pass DEFAULT.
    fp32_precision: str = "highest"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, viewdirs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.cfg
        # In float32 mode, force multi-pass MXU matmuls: TPU matmuls
        # default to bfloat16 inputs, which costs ~1e-2 absolute error per
        # layer and breaks golden-weight parity. bfloat16 mode keeps the
        # fast default (one MXU pass).
        if jnp.dtype(self.compute_dtype) == jnp.float32:
            precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
            }[self.fp32_precision]
        else:
            precision = jax.lax.Precision.DEFAULT
        dense = lambda feat, name: nn.Dense(
            feat,
            name=name,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            precision=precision,
        )
        x = x.astype(self.compute_dtype)
        h = x
        for i in range(cfg.depth):
            if i in cfg.skips:
                h = jnp.concatenate([x, h], axis=-1)
            h = nn.relu(dense(cfg.width, f"pts_{i}")(h))

        if cfg.use_viewdirs and viewdirs is not None:
            viewdirs = viewdirs.astype(self.compute_dtype)
            sigma = dense(1, "sigma")(h)
            bottleneck = dense(cfg.bottleneck_ch, "bottleneck")(h)
            h = jnp.concatenate([bottleneck, viewdirs], axis=-1)
            h = nn.relu(dense(cfg.view_width, "view")(h))
            rgb = dense(3, "rgb")(h)
            return jnp.concatenate([rgb, sigma], axis=-1)
        return dense(cfg.output_ch, "output")(h)


def init_model(
    rng: jax.Array,
    cfg: Optional[ModelConfig] = None,
    compute_dtype: Any = jnp.float32,
) -> Dict:
    """Initialize parameters; returns the (unboxed) param pytree."""
    cfg = cfg or ModelConfig()
    model = NeRFMLP(cfg=cfg, compute_dtype=compute_dtype)
    x = jnp.zeros((1, cfg.input_ch), jnp.float32)
    v = jnp.zeros((1, cfg.input_ch_views), jnp.float32) if cfg.use_viewdirs else None
    variables = model.init(rng, x, v)
    return variables["params"]


def apply_model(
    params: Dict,
    x: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray] = None,
    cfg: Optional[ModelConfig] = None,
    compute_dtype: Any = jnp.float32,
    fp32_precision: str = "highest",
) -> jnp.ndarray:
    cfg = cfg or ModelConfig()
    model = NeRFMLP(cfg=cfg, compute_dtype=compute_dtype,
                    fp32_precision=fp32_precision)
    return model.apply({"params": params}, x, viewdirs)
