"""Small image helpers (reference: example/run_nerf_helpers.py:17 ``to8b``)."""

from __future__ import annotations

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    """[0,1] float image -> uint8 (clip + round, run_nerf_helpers.py:17)."""
    return (255 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to8b(arr)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    """PNG -> float32 [0,1] RGB array."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
