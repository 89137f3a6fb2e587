from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.rays import get_rays, ndc_rays, look_at_matrix
from nerfmlp_tpu.ops.sampling import stratified_sample, sample_pdf
from nerfmlp_tpu.ops.integrate import composite_rays
from nerfmlp_tpu.ops.mesh import extract_mesh, mesh_from_volume, save_mesh

__all__ = [
    "extract_mesh",
    "mesh_from_volume",
    "save_mesh",
    "positional_encoding",
    "get_rays",
    "ndc_rays",
    "look_at_matrix",
    "stratified_sample",
    "sample_pdf",
    "composite_rays",
]
