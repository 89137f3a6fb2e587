"""nerfmlp_tpu — a TPU-native NeRF framework (JAX / Flax / Pallas / GSPMD).

A ground-up re-design of the capabilities of the ``nerf-mlp`` reference
(PyTorch / Apple-MPS) for TPU hardware:

* the 8x256 skip-connection NeRF MLP with positional encoding is a
  jit-compiled Flax module whose encode->MLP->(rgb, sigma) hot path can run
  as a single fused Pallas TPU kernel (weights resident in VMEM),
* the volume renderer (stratified sampling, inverse-CDF hierarchical
  sampling, transmittance compositing) is a set of pure, fully vectorized
  XLA functions with no Python per-ray loops,
* training scales over a ``jax.sharding.Mesh`` with data-parallel ray
  batches (GSPMD; gradient reduction rides ICI),
* checkpoints, metrics JSON, and CLI flags keep the reference's semantics
  (reference: scripts/train.py, nerfmlp/renderer.py in dgsmith7/nerf-mlp).
"""

__version__ = "1.0.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compiles across processes (each CLI invocation would
    otherwise re-pay 30-60s of TPU compilation). Opt out by setting
    NERFMLP_TPU_NO_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("NERFMLP_TPU_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "nerfmlp_tpu", "jax_cache"
            ),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard dependency


_enable_compilation_cache()

from nerfmlp_tpu.config import ModelConfig, RenderConfig, TrainConfig
from nerfmlp_tpu.models.mlp import NeRFMLP, init_model
from nerfmlp_tpu.models.import_tf import params_from_numpy, params_to_numpy
from nerfmlp_tpu.ops.render import render_rays, render_image
from nerfmlp_tpu.data.blender import BlenderDataset, srgb_to_linear, linear_to_srgb
from nerfmlp_tpu.data.pipeline import RayBatchLoader, auto_tune_batch_size

__all__ = [
    "ModelConfig",
    "RenderConfig",
    "TrainConfig",
    "NeRFMLP",
    "init_model",
    "params_from_numpy",
    "params_to_numpy",
    "render_rays",
    "render_image",
    "BlenderDataset",
    "RayBatchLoader",
    "auto_tune_batch_size",
    "srgb_to_linear",
    "linear_to_srgb",
    "__version__",
]
