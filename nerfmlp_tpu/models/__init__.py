from nerfmlp_tpu.models.mlp import NeRFMLP, init_model, apply_model
from nerfmlp_tpu.models.import_tf import params_from_numpy, params_to_numpy

__all__ = [
    "NeRFMLP",
    "init_model",
    "apply_model",
    "params_from_numpy",
    "params_to_numpy",
]
