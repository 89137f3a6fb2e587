from nerfmlp_tpu.data.blender import BlenderDataset, srgb_to_linear, linear_to_srgb
from nerfmlp_tpu.data.pipeline import RayBatchLoader, auto_tune_batch_size
from nerfmlp_tpu.data.synthetic import make_synthetic_scene

__all__ = [
    "BlenderDataset",
    "RayBatchLoader",
    "auto_tune_batch_size",
    "make_synthetic_scene",
    "srgb_to_linear",
    "linear_to_srgb",
]
