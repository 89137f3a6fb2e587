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


def write_video(path_base: str, frames, fps: int = 30) -> str:
    """Write uint8 frames as ``<path_base>.mp4`` (imageio/ffmpeg), falling
    back to an animated ``<path_base>.gif`` via PIL when no mp4 encoder is
    available in the environment. Returns the path actually written.

    The oracle dumps its i_video trajectories with imageio.mimwrite mp4
    fps=30 quality=8 (example/run_nerf.py:853-856).
    """
    frames = [np.asarray(f) for f in frames]
    frames = [f if f.dtype == np.uint8 else to8b(f) for f in frames]
    # Grayscale (disp) frames -> RGB for the encoders.
    frames = [np.repeat(f[..., None], 3, axis=-1) if f.ndim == 2 else f
              for f in frames]
    try:
        import imageio.v2 as imageio

        mp4 = path_base + ".mp4"
        imageio.mimwrite(mp4, frames, fps=fps, quality=8)
        return mp4
    except Exception:
        from PIL import Image

        gif = path_base + ".gif"
        pil = [Image.fromarray(f) for f in frames]
        pil[0].save(
            gif, save_all=True, append_images=pil[1:],
            duration=max(1000 // fps, 20), loop=0,
        )
        return gif
