from nerfmlp_tpu.utils.image import to8b, save_png, load_png
from nerfmlp_tpu.train.metrics import convert_for_json

__all__ = ["to8b", "save_png", "load_png", "convert_for_json"]
