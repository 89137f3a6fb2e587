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
