from nerfmlp_tpu.train.metrics import psnr, ssim, calculate_etc, format_time_duration
from nerfmlp_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_metrics_json,
    load_metrics_json,
)
from nerfmlp_tpu.train.loop import Trainer

__all__ = [
    "psnr",
    "ssim",
    "calculate_etc",
    "format_time_duration",
    "save_checkpoint",
    "load_checkpoint",
    "save_metrics_json",
    "load_metrics_json",
    "Trainer",
]
