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


def image_viewdirs(dataset, idx: int):
    """World-space per-pixel view directions for one image, or ``None``
    for metric datasets (only NDC/LLFF loaders carry them — the view
    branch must see pre-NDC world directions, run_nerf.py:297-312)."""
    fn = getattr(dataset, "image_viewdirs", None)
    return fn(idx) if fn is not None else None
