from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.rays import get_rays, ndc_rays, look_at_matrix
from nerfmlp_tpu.ops.sampling import stratified_sample, sample_pdf
from nerfmlp_tpu.ops.integrate import composite_rays

__all__ = [
    "positional_encoding",
    "get_rays",
    "ndc_rays",
    "look_at_matrix",
    "stratified_sample",
    "sample_pdf",
    "composite_rays",
]
