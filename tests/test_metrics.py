"""PSNR/SSIM/ETA utilities."""

import numpy as np

from nerfmlp_tpu.train.metrics import (
    calculate_etc,
    convert_for_json,
    format_time_duration,
    psnr,
    psnr_images,
    ssim,
)


def test_psnr_closed_form():
    assert abs(psnr(0.01) - 20.0) < 1e-9
    assert abs(psnr(1.0) - 0.0) < 1e-9


def test_psnr_images():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(psnr_images(a, b) - 20.0) < 1e-6


def test_ssim_identical_is_one():
    img = np.random.default_rng(0).uniform(size=(32, 32, 3))
    assert abs(ssim(img, img) - 1.0) < 1e-9


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3))
    s_small = ssim(img, np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1))
    s_big = ssim(img, np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1))
    assert 0.9 < s_small <= 1.0
    assert s_big < s_small


def test_ssim_tiny_image_fallback():
    img = np.random.default_rng(0).uniform(size=(2, 2, 3))
    assert np.isnan(ssim(img, img))  # window can't fit -> nan, not crash


def test_etc():
    import time

    etc = calculate_etc(100, 1000, time.time() - 10, [0.01] * 100)
    assert etc["progress_percent"] == 10.0
    assert abs(etc["remaining_time"] - 9.0) < 1.0
    assert not etc["eta_unstable"]
    # Unstable: mean >> median.
    etc2 = calculate_etc(100, 1000, time.time(), [0.01] * 99 + [10.0])
    assert etc2["eta_unstable"]
    assert calculate_etc(0, 1000, time.time(), []) is None


def test_format_time_duration():
    assert format_time_duration(30) == "30s"
    assert format_time_duration(90) == "1.5m"
    assert format_time_duration(7200) == "2.0h"


def test_convert_for_json():
    import json

    obj = {"a": np.float32(1.5), "b": np.arange(3), "c": [np.int64(2)]}
    out = convert_for_json(obj)
    json.dumps(out)  # must be serializable
    assert out == {"a": 1.5, "b": [0, 1, 2], "c": [2]}
