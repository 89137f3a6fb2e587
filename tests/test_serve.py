"""Render server: request parsing, formats, thread safety, HTTP layer.

The served math is `ops/render.render_image_maps` (covered by
test_render/test_render_path); these tests pin the serving contract built
on top of it — the piece the reference lacks entirely (its inference story
is one-shot CLIs, /root/reference/scripts/render_example.py:166-275).
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.rays import pose_spherical
from nerfmlp_tpu.serve import (
    RenderServer, RenderService, RequestError,
)


def _service(**kw):
    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0,
                       perturb=False)
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    base = dict(H=16, W=16, focal=20.0, tile=256)
    base.update(kw)
    return RenderService(params, cfg, **base)


@pytest.fixture(scope="module")
def svc():
    return _service()


# ------------------------------------------------------------------ #
# Core rendering
# ------------------------------------------------------------------ #
def test_render_pose_shapes_and_determinism(svc):
    pose = pose_spherical(30.0, -30.0, 4.0)
    out = svc.render_pose(pose, maps=("rgb_map", "disp_map", "acc_map"))
    assert out["rgb_map"].shape == (16, 16, 3)
    assert out["disp_map"].shape == (16, 16)
    assert out["acc_map"].shape == (16, 16)
    assert np.isfinite(out["rgb_map"]).all()
    again = svc.render_pose(pose)["rgb_map"]
    np.testing.assert_array_equal(out["rgb_map"], again)


def test_render_pose_overrides_change_output(svc):
    pose = pose_spherical(0.0, -30.0, 4.0)
    base = svc.render_pose(pose)["rgb_map"]
    hi = svc.render_pose(pose, H=24, W=24)["rgb_map"]
    assert hi.shape == (24, 24, 3)
    # near/far are traced runtime args: overriding them re-renders
    # without a recompile and must change the image.
    tight = svc.render_pose(pose, near=3.5, far=4.5)["rgb_map"]
    assert np.abs(tight - base).max() > 0


def test_render_pose_accepts_3x4(svc):
    pose = pose_spherical(10.0, -20.0, 4.0)
    a = svc.render_pose(pose)["rgb_map"]
    b = svc.render_pose(pose[:3, :4])["rgb_map"]
    np.testing.assert_array_equal(a, b)


def test_render_pose_rejects_bad_inputs(svc):
    with pytest.raises(RequestError):
        svc.render_pose(np.eye(3, dtype=np.float32))  # wrong pose shape
    with pytest.raises(RequestError):
        svc.render_pose(np.full((4, 4), np.nan, np.float32))
    with pytest.raises(RequestError):
        svc.render_pose(pose_spherical(0, -30, 4), maps=("sigma_map",))
    with pytest.raises(RequestError):
        svc.render_pose(pose_spherical(0, -30, 4), H=10_000, W=10_000)


def test_max_pixels_guard():
    small = _service(max_pixels=16 * 16)
    small.render_pose(pose_spherical(0, -30, 4))  # exactly at the cap: ok
    with pytest.raises(RequestError):
        small.render_pose(pose_spherical(0, -30, 4), H=17, W=16)


# ------------------------------------------------------------------ #
# render_request: camera specs and formats
# ------------------------------------------------------------------ #
def test_request_camera_specs_agree(svc):
    pose = pose_spherical(45.0, -30.0, 4.0)
    via_c2w, _ = svc.render_request(
        {"c2w": pose.tolist(), "format": "npy"})
    via_sph, _ = svc.render_request(
        {"theta": 45.0, "phi": -30.0, "radius": 4.0, "format": "npy"})
    a = np.load(io.BytesIO(via_c2w))
    b = np.load(io.BytesIO(via_sph))
    np.testing.assert_array_equal(a, b)


def test_request_look_at_camera(svc):
    body, ctype = svc.render_request(
        {"eye": [0, -4, 0], "target": [0, 0, 0], "format": "npy"})
    assert ctype == "application/octet-stream"
    assert np.load(io.BytesIO(body)).shape == (16, 16, 3)


def test_request_png_default(svc):
    from PIL import Image

    body, ctype = svc.render_request({"theta": 0, "phi": -30, "radius": 4})
    assert ctype == "image/png"
    img = Image.open(io.BytesIO(body))
    assert img.size == (16, 16)


def test_request_json_multiple_maps(svc):
    body, ctype = svc.render_request(
        {"theta": 0, "phi": -30, "radius": 4, "format": "json",
         "maps": ["rgb_map", "depth_map"]})
    assert ctype == "application/json"
    out = json.loads(body)
    assert np.asarray(out["rgb_map"]).shape == (16, 16, 3)
    assert np.asarray(out["depth_map"]).shape == (16, 16)


def test_request_brightness_and_gamma(svc):
    req = {"theta": 0, "phi": -30, "radius": 4, "format": "npy"}
    plain = np.load(io.BytesIO(svc.render_request(req)[0]))
    bright = np.load(io.BytesIO(
        svc.render_request({**req, "brightness": 2.0})[0]))
    # brightness multiplies then clips (reference CLI order, :246-252)
    np.testing.assert_allclose(
        bright, np.clip(plain * 2.0, 0, 1), atol=1e-6)
    gamma = np.load(io.BytesIO(svc.render_request({**req, "gamma": True})[0]))
    assert not np.allclose(gamma, plain)


def test_request_errors(svc):
    cases = [
        {},                                           # no camera
        {"theta": 0, "phi": -30, "radius": 4, "c2w": np.eye(4).tolist()},
        {"eye": [0, -4, 0]},                          # missing target
        {"theta": 0, "phi": -30},                     # missing radius
        {"theta": 0, "phi": -30, "radius": 4, "format": "tiff"},
        {"theta": 0, "phi": -30, "radius": 4, "maps": ["disp_map"]},  # png
        {"theta": 0, "phi": -30, "radius": 4, "format": "npy",
         "maps": ["rgb_map", "disp_map"]},            # npy wants exactly 1
        [1, 2, 3],                                    # not a dict
    ]
    for req in cases:
        with pytest.raises(RequestError):
            svc.render_request(req)


def test_request_malformed_values_are_400(svc):
    cases = [
        {"theta": "abc", "phi": -30, "radius": 4},      # non-numeric angle
        {"c2w": [[1, 2], [3]]},                         # ragged matrix
        {"eye": ["x", 0, 0], "target": [0, 0, 0]},      # non-numeric eye
        {"theta": 0, "phi": -30, "radius": 4, "H": "abc"},
        {"theta": 0, "phi": -30, "radius": 4, "near": "close"},
        {"theta": 0, "phi": -30, "radius": 4, "brightness": "bright"},
    ]
    for req in cases:
        with pytest.raises(RequestError):  # -> HTTP 400, never a 500
            svc.render_request(req)


def test_warmup_excluded_from_latency_stats():
    s = _service(log=lambda *a: None)
    s.warmup()
    h = s.health()
    assert h["warm"] and h["warmup_s"] > 0
    # The compile-dominated warmup must not poison serving percentiles.
    assert h["renders"] == 0 and h["latency"] is None
    s.render_pose(pose_spherical(0, -30, 4))
    assert s.health()["renders"] == 1


def test_viewdirs_c2w_changes_appearance_only(svc):
    geo = pose_spherical(0.0, -30.0, 4.0)
    moving = pose_spherical(90.0, -30.0, 4.0)
    base = svc.render_pose(geo, maps=("rgb_map", "depth_map"))
    vd = svc.render_pose(geo, viewdirs_c2w=moving,
                         maps=("rgb_map", "depth_map"))
    # Static-cam trick (run_nerf.py:299-302): geometry (depth) is pinned
    # by `geo`, appearance follows the moving view direction.
    np.testing.assert_allclose(vd["depth_map"], base["depth_map"],
                               atol=1e-5)
    assert np.abs(vd["rgb_map"] - base["rgb_map"]).max() > 1e-6


def test_concurrent_requests_serialize_correctly(svc):
    pose = pose_spherical(20.0, -30.0, 4.0)
    want = svc.render_pose(pose)["rgb_map"]
    results, errors = [None] * 8, []

    def worker(i):
        try:
            results[i] = svc.render_pose(pose)["rgb_map"]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results:
        np.testing.assert_array_equal(r, want)


def test_spec_and_counters(svc):
    spec = svc.spec()
    assert spec["defaults"]["H"] == 16
    assert spec["render_config"]["N_samples"] == 8
    assert svc.renders > 0
    h = svc.health()
    assert h["status"] == "ok" and h["renders"] == svc.renders
    assert h["latency"]["n"] >= 1 and h["latency"]["p50_ms"] > 0


# ------------------------------------------------------------------ #
# Hot checkpoint reload
# ------------------------------------------------------------------ #
def _save_params(path, seed):
    from nerfmlp_tpu.train.checkpoint import save_checkpoint

    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    params = {"coarse": init_model(jax.random.PRNGKey(seed),
                                   cfg.model_config())}
    save_checkpoint(path, params)
    return params


def _reloadable_service(tmp_path, **kw):
    from nerfmlp_tpu.train.checkpoint import load_params_any

    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    template = {"coarse": init_model(jax.random.PRNGKey(0),
                                     cfg.model_config())}
    ckpt = str(tmp_path / "model_100.ckpt")
    _save_params(ckpt, seed=0)
    params = load_params_any(ckpt, template, cfg.model_config())
    return RenderService(
        params, cfg, H=16, W=16, focal=20.0, tile=256,
        reload_fn=lambda p: load_params_any(p, template, cfg.model_config()),
        watch_dir=str(tmp_path), ckpt_path=ckpt, log=lambda *a: None,
        **kw,
    )


def test_swap_params_changes_output(svc):
    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    pose = pose_spherical(0.0, -30.0, 4.0)
    before = svc.render_pose(pose)["rgb_map"]
    old_params, old_reloads = svc.params, svc.reloads
    try:
        svc.swap_params({"coarse": init_model(jax.random.PRNGKey(7),
                                              cfg.model_config())})
        after = svc.render_pose(pose)["rgb_map"]
        assert svc.reloads == old_reloads + 1
        assert np.abs(after - before).max() > 0
    finally:
        svc.swap_params(old_params)


def test_reload_picks_newest_checkpoint(tmp_path):
    svc = _reloadable_service(tmp_path)
    pose = pose_spherical(0.0, -30.0, 4.0)
    first = svc.render_pose(pose)["rgb_map"]

    # force=False with nothing new: a no-op
    assert svc.reload(force=False) is None

    # A newer step lands (different weights) -> watcher-mode reload
    # discovers it exactly like auto-resume would.
    _save_params(str(tmp_path / "model_200.ckpt"), seed=1)
    info = svc.reload(force=False)
    assert info is not None and info["step"] == 200
    second = svc.render_pose(pose)["rgb_map"]
    assert np.abs(second - first).max() > 0
    assert svc.health()["ckpt"]["step"] == 200

    # Unchanged again -> no-op; force=True reloads anyway.
    assert svc.reload(force=False) is None
    assert svc.reload(force=True)["step"] == 200


def test_reload_without_support_raises(svc):
    with pytest.raises(RequestError):
        svc.reload()


def test_latest_params_checkpoint_prefers_stepped(tmp_path):
    from nerfmlp_tpu.serve import latest_params_checkpoint

    assert latest_params_checkpoint(str(tmp_path / "missing")) is None
    assert latest_params_checkpoint(str(tmp_path)) is None
    # Only the full train state exists (run just started): fall back.
    (tmp_path / "metrics_latest.ckpt").write_bytes(b"x")
    got = latest_params_checkpoint(str(tmp_path))
    assert got.endswith("metrics_latest.ckpt")
    # Stepped params-only layers win over the (heavier) full state, by
    # step — and stepless model_best/model_final never match.
    (tmp_path / "model_best.ckpt").write_bytes(b"x")
    (tmp_path / "model_1000_latest.ckpt").write_bytes(b"x")
    (tmp_path / "model_2000_latest.ckpt").write_bytes(b"x")
    (tmp_path / "model_1000.ckpt").write_bytes(b"x")
    got = latest_params_checkpoint(str(tmp_path))
    assert got.endswith("model_2000_latest.ckpt")


def test_watch_thread_swaps(tmp_path):
    svc = _reloadable_service(tmp_path)
    pose = pose_spherical(0.0, -30.0, 4.0)
    first = svc.render_pose(pose)["rgb_map"]
    thread = svc.watch(0.05)
    try:
        _save_params(str(tmp_path / "model_300.ckpt"), seed=2)
        deadline = time.time() + 10
        while svc.reloads == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert svc.reloads >= 1
        assert svc.ckpt["step"] == 300
        assert np.abs(svc.render_pose(pose)["rgb_map"] - first).max() > 0
    finally:
        thread.stop_event.set()
        thread.join(timeout=5)


# ------------------------------------------------------------------ #
# HTTP layer
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def server_url():
    server = RenderServer(_service(), host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    server.server_close()
    thread.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _post(url, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_http_health_and_spec(server_url):
    status, body, ctype = _get(server_url + "/health")
    assert status == 200 and ctype == "application/json"
    assert json.loads(body)["status"] == "ok"
    status, body, _ = _get(server_url + "/spec")
    assert status == 200
    assert json.loads(body)["defaults"]["W"] == 16


def test_http_render_png(server_url):
    from PIL import Image

    status, body, ctype = _post(
        server_url + "/render",
        json.dumps({"theta": 0, "phi": -30, "radius": 4}).encode())
    assert status == 200 and ctype == "image/png"
    assert Image.open(io.BytesIO(body)).size == (16, 16)


def test_http_reload_endpoint(tmp_path):
    svc = _reloadable_service(tmp_path)
    server = RenderServer(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        _save_params(str(tmp_path / "model_500.ckpt"), seed=3)
        status, body, _ = _post(url + "/reload", b"")
        assert status == 200
        out = json.loads(body)
        assert out["reloaded"] is True and out["step"] == 500
        status, body, _ = _get(url + "/health")
        h = json.loads(body)
        assert h["reloads"] == 1 and h["ckpt"]["step"] == 500
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_http_errors(server_url):
    status, body, _ = _post(server_url + "/render", b"{not json")
    assert status == 400 and b"bad JSON" in body
    status, body, _ = _post(server_url + "/render",
                            json.dumps({"format": "png"}).encode())
    assert status == 400
    assert "camera spec" in json.loads(body)["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server_url + "/health/nope")
    assert e.value.code == 404
    status, body, _ = _post(server_url + "/nope", b"{}")
    assert status == 404
    # /reload on a server started without reload support -> 400
    status, body, _ = _post(server_url + "/reload", b"")
    assert status == 400
    assert "without reload support" in json.loads(body)["error"]


# ------------------------------------------------------------------ #
# CLI wiring (build_service from a real checkpoint + scene)
# ------------------------------------------------------------------ #
def test_cli_build_service(tmp_path, synthetic_scene):
    from nerfmlp_tpu.train.checkpoint import save_checkpoint
    from scripts.serve import build_service

    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    params = {"coarse": init_model(jax.random.PRNGKey(0),
                                   cfg.model_config())}
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, params)

    # Parse with the REAL parser, then stop before serve().
    import scripts.serve as serve_cli

    argv = ["--ckpt", ckpt, "--datadir", synthetic_scene,
            "--img_wh", "16", "16", "--N_samples", "8",
            "--N_importance", "4", "--compute_dtype", "float32",
            "--no_pallas", "--tile", "256"]
    p = serve_cli.build_parser()
    svc = build_service(p.parse_args(argv), p)
    assert svc.defaults["W"] == 16
    assert svc.defaults["near"] == 2.0 and svc.defaults["far"] == 6.0
    assert svc.defaults["focal"] > 0
    out = svc.render_pose(pose_spherical(0, -30, 4))
    assert out["rgb_map"].shape == (16, 16, 3)

    # Explicit focal path: no datadir needed at all.
    argv2 = ["--ckpt", ckpt, "--focal", "20.0", "--near", "2", "--far", "6",
             "--img_wh", "16", "16", "--N_samples", "8",
             "--N_importance", "4", "--compute_dtype", "float32",
             "--no_pallas"]
    svc2 = build_service(p.parse_args(argv2), p)
    assert svc2.defaults["focal"] == 20.0


def _write_llff_scene(d):
    """Minimal forward-facing poses_bounds.npy capture (see test_llff)."""
    from PIL import Image

    img_dir = d / "images"
    img_dir.mkdir(parents=True)
    n, h, w, f = 8, 30, 40, 50.0
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.02 * i]
        m = np.concatenate(
            [-c2w[:3, 1:2], c2w[:3, 0:1], c2w[:3, 2:3], c2w[:3, 3:4]], axis=1
        )
        hwf = np.array([[h], [w], [f]], dtype=np.float32)
        rows.append(np.concatenate(
            [np.concatenate([m, hwf], 1).ravel(), [2.0, 8.0]]))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"img_{i:03d}.png")
    np.save(d / "poses_bounds.npy", np.stack(rows).astype(np.float64))
    return str(d)


def test_cli_llff_ndc_and_background(tmp_path):
    """Serving an NDC-trained LLFF checkpoint must configure NDC rays and
    a non-white background — the same rules as render_video.py:81-119
    (an ndc=False config renders metric rays through an NDC-trained net:
    deterministically wrong frames with no error)."""
    from nerfmlp_tpu.train.checkpoint import save_checkpoint
    from scripts.serve import build_parser, build_service

    scene = _write_llff_scene(tmp_path / "llff")
    cfg = RenderConfig(N_samples=8, N_importance=4)
    save_checkpoint(str(tmp_path / "m.ckpt"),
                    {"coarse": init_model(jax.random.PRNGKey(0),
                                          cfg.model_config())})
    p = build_parser()
    base = ["--ckpt", str(tmp_path / "m.ckpt"), "--dataset_type", "llff",
            "--img_wh", "16", "12", "--N_samples", "8",
            "--N_importance", "4", "--no_pallas",
            "--compute_dtype", "float32"]

    svc = build_service(p.parse_args(base + ["--datadir", scene]), p)
    assert svc.cfg.ndc is True          # forward-facing capture default
    assert svc.cfg.white_bkgd is False  # real photos keep their background
    assert svc.defaults["near"] == 0.0 and svc.defaults["far"] == 1.0
    out = svc.render_pose(pose_spherical(0, -30, 4))
    assert np.isfinite(out["rgb_map"]).all()

    # Dataset-free serving keeps the same rules from the flags alone.
    flags = base + ["--focal", "50", "--near", "0", "--far", "1"]
    assert build_service(p.parse_args(flags), p).cfg.ndc is True
    svc = build_service(p.parse_args(flags + ["--no_ndc"]), p)
    assert svc.cfg.ndc is False
    svc = build_service(p.parse_args(flags + ["--spherify"]), p)
    assert svc.cfg.ndc is False         # 360 captures train on metric rays


def test_cli_requires_focal_or_datadir(tmp_path):
    import scripts.serve as serve_cli

    from nerfmlp_tpu.train.checkpoint import save_checkpoint

    cfg = RenderConfig(N_samples=8, N_importance=4)
    params = {"coarse": init_model(jax.random.PRNGKey(0),
                                   cfg.model_config())}
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params)
    with pytest.raises(SystemExit):
        serve_cli.main(["--ckpt", ckpt, "--no_warmup"])


# ------------------------------------------------------------------ #
# Multi-chip serving (8 fake devices) + round-4 hardening
# ------------------------------------------------------------------ #
def test_sharded_service_matches_single_device(svc):
    """On an 8-device data-parallel mesh the service renders each frame
    through parallel/render_parallel.py; output must equal the
    single-device renderer's (same params: both seeds are PRNGKey(0))."""
    from nerfmlp_tpu.parallel.mesh import make_mesh

    sharded = _service(mesh=make_mesh(n_devices=8), log=lambda *a: None)
    assert sharded.mesh is not None
    pose = pose_spherical(30.0, -30.0, 4.0)
    want = svc.render_pose(pose, maps=("rgb_map", "disp_map"))
    got = sharded.render_pose(pose, maps=("rgb_map", "disp_map"))
    np.testing.assert_allclose(got["rgb_map"], want["rgb_map"], atol=1e-6)
    np.testing.assert_allclose(got["disp_map"], want["disp_map"], atol=1e-6)
    # Stats/counters work through the sharded path too.
    assert sharded.health()["renders"] == 1


def test_sharded_service_divides_tile_across_mesh(monkeypatch):
    """``tile`` is rays per DISPATCH in both modes (the batch CLIs'
    contract, utils/cli.py::render_frame): the sharded path must hand
    render_image_sharded tile/n_dev, not the full value — otherwise an
    8-chip server dispatches 8x more rays than asked and pads small
    frames up to tile*n_dev."""
    import nerfmlp_tpu.serve as serve_mod
    from nerfmlp_tpu.parallel import render_parallel
    from nerfmlp_tpu.parallel.mesh import make_mesh

    sharded = _service(mesh=make_mesh(n_devices=8), log=lambda *a: None)
    seen = {}
    orig = render_parallel.render_image_sharded

    def spy(*a, **kw):
        seen["tile"] = kw["tile"]
        return orig(*a, **kw)

    monkeypatch.setattr(render_parallel, "render_image_sharded", spy)
    sharded.tile = 4096
    sharded.render_pose(pose_spherical(10.0, -20.0, 4.0))
    assert seen["tile"] == 512  # 4096 / 8 devices
    # The floor keeps tiny tiles from under-filling a chip.
    sharded.tile = 64
    sharded.render_pose(pose_spherical(10.0, -20.0, 4.0))
    assert seen["tile"] == 256


def test_sharded_service_swap_keeps_placement(svc):
    """swap_params on a sharded service re-replicates the new weights and
    changes the served image (placement happens at swap, not per frame)."""
    from nerfmlp_tpu.parallel.mesh import make_mesh

    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    sharded = _service(mesh=make_mesh(n_devices=8), log=lambda *a: None)
    pose = pose_spherical(0.0, -30.0, 4.0)
    before = sharded.render_pose(pose)["rgb_map"]
    sharded.swap_params({"coarse": init_model(jax.random.PRNGKey(7),
                                              cfg.model_config())})
    after = sharded.render_pose(pose)["rgb_map"]
    assert np.abs(after - before).max() > 0
    # The swapped params carry the replicated mesh sharding.
    leaf = jax.tree.leaves(sharded.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_mesh_ignored_when_not_data_parallel():
    from nerfmlp_tpu.parallel.mesh import make_mesh

    msgs = []
    s = _service(mesh=make_mesh(n_devices=1), log=msgs.append)
    assert s.mesh is None
    assert any("mesh ignored" in m for m in msgs)
    # Still renders fine on the single-device path.
    assert s.render_pose(pose_spherical(0, -30, 4))["rgb_map"].shape == (
        16, 16, 3)


def test_health_tail_percentiles():
    s = _service(log=lambda *a: None)
    with s._stats_lock:
        s._times.extend([0.010] * 98 + [0.100, 0.500])
        s.renders = 100
    lat = s.health()["latency"]
    assert lat["n"] == 100
    assert lat["p50_ms"] == 10.0
    assert lat["p95_ms"] == 10.0
    assert lat["p99_ms"] == 100.0
    assert lat["max_ms"] == 500.0


def test_request_maps_and_up_validation(svc):
    # Non-iterable / wrongly-typed "maps" must be a 400, not a 500.
    with pytest.raises(RequestError):
        svc.render_request({"theta": 0, "phi": -30, "radius": 4,
                            "format": "json", "maps": 5})
    with pytest.raises(RequestError):
        svc.render_request({"theta": 0, "phi": -30, "radius": 4,
                            "format": "json", "maps": [1, 2]})
    # A wrong-shaped "up" vector likewise.
    with pytest.raises(RequestError):
        svc.render_request({"eye": [0, -4, 0], "target": [0, 0, 0],
                            "up": [0, 1], "format": "npy"})
    # Convenience: one map as a bare string is accepted.
    body, _ = svc.render_request({"theta": 0, "phi": -30, "radius": 4,
                                  "format": "npy", "maps": "disp_map"})
    assert np.load(io.BytesIO(body)).shape == (16, 16)


def test_http_body_cap(server_url):
    from nerfmlp_tpu.serve import MAX_BODY_BYTES

    big = b'{"pad": "' + b"x" * MAX_BODY_BYTES + b'"}'
    status, body, _ = _post(server_url + "/render", big)
    assert status == 413
    assert "exceeds" in json.loads(body)["error"]


def test_failed_swap_not_committed(tmp_path):
    """A reload whose occupancy rebuild (or swap) fails must NOT commit
    the checkpoint metadata — otherwise /health lies and the force=False
    watcher skips that checkpoint forever (r3 advisor)."""
    svc = _reloadable_service(tmp_path)
    before = dict(svc.ckpt)

    def boom(params):
        raise RuntimeError("grid rebuild failed")

    svc.occ_rebuild_fn = boom
    _save_params(str(tmp_path / "model_500.ckpt"), seed=3)
    with pytest.raises(RuntimeError):
        svc.reload(force=False)
    assert svc.ckpt == before and svc.reloads == 0
    # Clear the fault: the watcher-mode retry now picks the SAME
    # checkpoint up (it was never marked as served).
    svc.occ_rebuild_fn = None
    info = svc.reload(force=False)
    assert info is not None and info["step"] == 500
    assert svc.reloads == 1


def test_reload_no_watch_dir_message():
    s = _service(reload_fn=lambda p: p, watch_dir=None, ckpt_path=None,
                 log=lambda *a: None)
    with pytest.raises(RequestError, match="no watch dir"):
        s.reload(force=True)


def test_metrics_latest_reports_true_step(tmp_path):
    """The metrics_latest.ckpt fallback must report the step stored IN the
    state, not 0 (its filename carries none) — r3 advisor."""
    import jax.numpy as jnp

    from nerfmlp_tpu.config import TrainConfig
    from nerfmlp_tpu.parallel.train_step import create_train_state
    from nerfmlp_tpu.train.checkpoint import load_params_any, save_checkpoint

    cfg = RenderConfig(N_samples=8, N_importance=4, near=2.0, far=6.0)
    watch = tmp_path / "run"
    watch.mkdir()
    state = create_train_state(cfg, TrainConfig(batch_size=32))
    state = state.replace(step=jnp.asarray(777, jnp.int32))
    save_checkpoint(str(watch / "metrics_latest.ckpt"), state)

    template = {"coarse": init_model(jax.random.PRNGKey(0),
                                     cfg.model_config())}
    svc = _service(
        reload_fn=lambda p: load_params_any(p, template, cfg.model_config()),
        watch_dir=str(watch), log=lambda *a: None,
    )
    info = svc.reload(force=True)
    assert info["path"].endswith("metrics_latest.ckpt")
    assert info["step"] == 777
    assert svc.health()["ckpt"]["step"] == 777


def test_http_negative_content_length_rejected(server_url):
    """A negative Content-Length must be a 400, not an unbounded
    read-until-EOF (it would dodge the MAX_BODY_BYTES cap AND make
    rfile.read(-1) buffer whatever the client streams)."""
    import http.client

    host, port = server_url.rsplit("//", 1)[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/render")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"Content-Length" in resp.read()
    finally:
        conn.close()


def test_http_oversize_body_rejected(server_url):
    """Bodies over MAX_BODY_BYTES get a 413 without being buffered."""
    import http.client

    from nerfmlp_tpu.serve import MAX_BODY_BYTES

    host, port = server_url.rsplit("//", 1)[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        body = b"x" * (MAX_BODY_BYTES + 1)
        conn.request("POST", "/render", body=body)
        resp = conn.getresponse()
        assert resp.status == 413
    finally:
        conn.close()


def test_reload_fn_tuple_step_single_decode(tmp_path):
    """A reload_fn returning (params, step) supplies /health's step in the
    same decode — RenderService must NOT re-read the checkpoint file."""
    import nerfmlp_tpu.serve as serve_mod

    svc = _reloadable_service(tmp_path)
    svc.reload_fn = lambda p: (
        {"coarse": init_model(jax.random.PRNGKey(5),
                              RenderConfig(N_samples=8, N_importance=4,
                                           near=2.0, far=6.0).model_config())},
        777,
    )
    calls = []
    orig = serve_mod._ckpt_step
    serve_mod._ckpt_step = lambda p: calls.append(p) or 0
    try:
        _save_params(str(tmp_path / "model_300.ckpt"), seed=2)
        info = svc.reload(force=False)
    finally:
        serve_mod._ckpt_step = orig
    assert info["step"] == 777
    assert calls == []  # no second decode of the checkpoint
    assert svc.health()["ckpt"]["step"] == 777


# ------------------------------------------------------------------ #
# Admission control / load shedding
# ------------------------------------------------------------------ #
def _wait_until(pred, timeout=10.0):
    t0 = time.time()
    while not pred():
        if time.time() - t0 > timeout:
            raise AssertionError("condition not reached in time")
        time.sleep(0.01)


def test_admission_sheds_excess_requests():
    """With max_queue=1, a request arriving while one renders raises
    ServiceOverloaded; the admitted request completes normally and the
    rejection is counted in /health."""
    from nerfmlp_tpu.serve import ServiceOverloaded

    svc = _service(max_queue=1)
    pose = pose_spherical(20.0, -30.0, 4.0)
    svc.render_pose(pose)  # compile outside the contention window
    results, errors = [], []

    with svc._lock:  # park the admitted request at the dispatch lock
        def admitted():
            try:
                results.append(svc.render_pose(pose)["rgb_map"])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        t = threading.Thread(target=admitted)
        t.start()
        _wait_until(lambda: svc._inflight == 1)
        with pytest.raises(ServiceOverloaded):
            svc.render_pose(pose)
    t.join(timeout=30)
    assert not errors and len(results) == 1
    h = svc.health()
    assert h["queued"] == 0
    assert h["rejected"] == 1
    assert h["max_queue"] == 1


def test_admission_unbounded_and_warmup_bypass():
    """max_queue=0 never sheds; the warmup render (_record_stats=False)
    bypasses admission even when the queue reads full."""
    pose = pose_spherical(20.0, -30.0, 4.0)
    svc = _service(max_queue=0)
    with svc._stats_lock:
        svc._inflight = 99  # simulate heavy load
    try:
        svc.render_pose(pose)  # unbounded: admitted regardless
    finally:
        with svc._stats_lock:
            svc._inflight = 0

    svc2 = _service(max_queue=1)
    with svc2._stats_lock:
        svc2._inflight = 1  # queue reads full
    try:
        svc2.render_pose(pose, _record_stats=False)  # warmup path
    finally:
        with svc2._stats_lock:
            svc2._inflight = 0
    assert svc2.rejected == 0


def test_http_503_with_retry_after():
    """Over HTTP, a shed request gets 503, a Retry-After header, and a
    JSON body naming the queue bound."""
    svc = _service(max_queue=1)
    server = RenderServer(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    body = json.dumps({"theta": 0, "phi": -30, "radius": 4}).encode()
    try:
        status, _, _ = _post(url + "/render", body)
        assert status == 200  # compile + populate latency stats
        statuses = []

        with svc._lock:
            t = threading.Thread(
                target=lambda: statuses.append(_post(url + "/render", body))
            )
            t.start()
            _wait_until(lambda: svc._inflight == 1)
            req = urllib.request.Request(
                url + "/render", data=body, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30):
                    raise AssertionError("expected HTTP 503")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert int(e.headers["Retry-After"]) >= 1
                shed = json.loads(e.read())
                assert "max_queue=1" in shed["error"]
                assert shed["retry_after_s"] >= 1
        t.join(timeout=60)
        assert statuses and statuses[0][0] == 200  # parked request finished
        assert svc.health()["rejected"] == 1
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


# ------------------------------------------------------------------ #
# POST /mesh — geometry of the currently served weights
# ------------------------------------------------------------------ #
def _mesh_service(**kw):
    cfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                       perturb=False, depth=2, width=32,
                       aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0))
    params = {"coarse": init_model(jax.random.PRNGKey(0), cfg.model_config())}
    base = dict(H=16, W=16, focal=20.0, tile=256)
    base.update(kw)
    return RenderService(params, cfg, **base)


def test_mesh_request_json_then_ply():
    """JSON stats probe the sigma range; extracting at a threshold inside
    that range yields a parseable binary PLY with colors+normals."""
    from test_mesh import _parse_ply

    svc = _mesh_service()
    body, ctype = svc.mesh_request(
        {"resolution": 10, "threshold": 1e9, "format": "json"})
    assert ctype == "application/json"
    stats = json.loads(body)
    assert stats["verts"] == 0 and stats["faces"] == 0
    assert stats["sigma_max"] >= stats["sigma_min"] >= 0.0

    thr = 0.5 * (stats["sigma_min"] + stats["sigma_max"])
    body, ctype = svc.mesh_request({"resolution": 10, "threshold": thr})
    assert ctype == "application/octet-stream"
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".ply", delete=False) as f:
        f.write(body)
        path = f.name
    vdat, fdat, names = _parse_ply(path)
    assert names == ["x", "y", "z", "nx", "ny", "nz",
                     "red", "green", "blue"]
    assert len(fdat) > 0 and fdat.max() < len(vdat)
    assert svc.health()["meshes"] == 2
    assert svc.spec()["max_mesh_resolution"] == 256

    body, ctype = svc.mesh_request(
        {"resolution": 10, "threshold": thr, "format": "obj",
         "color": False})
    assert ctype.startswith("text/plain")
    lines = body.decode().splitlines()
    n_v = sum(1 for l in lines if l.startswith("v "))
    n_f = sum(1 for l in lines if l.startswith("f "))
    assert n_v == len(vdat) and n_f == len(fdat)


def test_mesh_request_validation():
    svc = _mesh_service()
    for bad in (
        {"resolution": 1},
        {"resolution": 100000},
        {"resolution": "huge"},
        {"threshold": float("nan")},
        {"format": "stl"},
        {"aabb": [0, 0, 0, -1, 1, 1]},   # min > max
        {"aabb": [0, 0, 0, 1, 1]},       # 5 values
        {"aabb": ["a"] * 6},
    ):
        with pytest.raises(RequestError):
            svc.mesh_request({"resolution": 6, **bad})

    # No AABB anywhere -> actionable error; explicit request aabb works.
    cfg = RenderConfig(N_samples=8, N_importance=0, near=2.0, far=6.0,
                       perturb=False, depth=2, width=32)
    params = {"coarse": init_model(jax.random.PRNGKey(0),
                                   cfg.model_config())}
    svc2 = RenderService(params, cfg, H=16, W=16, focal=20.0, tile=256)
    with pytest.raises(RequestError, match="aabb"):
        svc2.mesh_request({"resolution": 6})
    body, _ = svc2.mesh_request(
        {"resolution": 6, "threshold": 1e9, "format": "json",
         "aabb": [-1, -1, -1, 1, 1, 1]})
    assert json.loads(body)["faces"] == 0

    # max_mesh_resolution=0 disables the route.
    svc3 = _mesh_service(max_mesh_resolution=0)
    with pytest.raises(RequestError, match="disabled"):
        svc3.mesh_request({"resolution": 6})


def test_mesh_counts_against_admission_queue():
    """Mesh extraction holds a queue slot: with max_queue=1 and one
    request in flight, /mesh is shed like a render."""
    from nerfmlp_tpu.serve import ServiceOverloaded

    svc = _mesh_service(max_queue=1)
    with svc._stats_lock:
        svc._inflight = 1
    try:
        with pytest.raises(ServiceOverloaded):
            svc.mesh_request({"resolution": 6, "threshold": 1e9})
    finally:
        with svc._stats_lock:
            svc._inflight = 0
    assert svc.rejected == 1


def test_mesh_http_route():
    svc = _mesh_service()
    server = RenderServer(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        status, body, ctype = _post(
            url + "/mesh",
            json.dumps({"resolution": 8, "threshold": 1e9,
                        "format": "json"}).encode())
        assert status == 200 and ctype == "application/json"
        assert json.loads(body)["faces"] == 0
        # Malformed -> 400 with the validation message.
        req = urllib.request.Request(
            url + "/mesh", data=json.dumps({"format": "stl"}).encode(),
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30):
                raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "format" in json.loads(e.read())["error"]
        assert svc.health()["meshes"] == 1
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_mesh_request_on_sharded_service():
    """A multi-chip service extracts through the sharded grid eval; the
    result matches a single-device service bit-for-stat."""
    from nerfmlp_tpu.parallel.mesh import make_mesh

    single = _mesh_service()
    sharded = _mesh_service(mesh=make_mesh(n_devices=8),
                            log=lambda *a: None)
    req = {"resolution": 9, "threshold": 0.05, "format": "json"}
    a = json.loads(single.mesh_request(req)[0])
    b = json.loads(sharded.mesh_request(req)[0])
    for k in ("verts", "faces"):
        assert a[k] == b[k], (k, a, b)
    assert abs(a["sigma_max"] - b["sigma_max"]) < 1e-4


def test_mesh_request_gamma_changes_colors_only():
    svc = _mesh_service()
    stats = json.loads(svc.mesh_request(
        {"resolution": 8, "threshold": 1e9, "format": "json"})[0])
    thr = 0.5 * (stats["sigma_min"] + stats["sigma_max"])
    lin, _ = svc.mesh_request({"resolution": 8, "threshold": thr})
    srgb, _ = svc.mesh_request({"resolution": 8, "threshold": thr,
                                "gamma": True})
    # Same header and geometry byte-length; only color bytes may differ.
    assert len(lin) == len(srgb)
    head = lin.partition(b"end_header\n")[0]
    assert srgb.startswith(head)
    assert lin != srgb  # sRGB encode moved at least one color byte


def test_malformed_requests_never_500():
    """Deterministic fuzz over the request surface: every malformed body
    must map to a 4xx (RequestError/JSON/length handling), never a 500 —
    the server treats only genuine render bugs as 500s."""
    svc = _mesh_service()
    server = RenderServer(svc, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    bodies = [
        b"",                         # empty -> defaults, may 400 (no cam)
        b"not json at all",
        b"[1, 2, 3]",                # JSON but not an object
        b'"a string"',
        b"{}",                       # no camera spec
        json.dumps({"c2w": "nope"}).encode(),
        json.dumps({"c2w": [[1, 2], [3, 4]]}).encode(),
        json.dumps({"c2w": [[None] * 4] * 4}).encode(),
        b'{"c2w": [[Infinity,0,0,0],[0,1,0,0],[0,0,1,0],[0,0,0,1]]}',
        json.dumps({"theta": "x", "phi": 0, "radius": 1}).encode(),
        json.dumps({"eye": [0, 0], "target": [0, 0, 0]}).encode(),
        json.dumps({"eye": [0, 0, 4], "target": [0, 0, 0],
                    "up": [1, 2]}).encode(),
        json.dumps({"theta": 0, "phi": 0, "radius": 4,
                    "maps": 5}).encode(),
        json.dumps({"theta": 0, "phi": 0, "radius": 4,
                    "format": "exr"}).encode(),
        json.dumps({"theta": 0, "phi": 0, "radius": 4,
                    "H": -4}).encode(),
        json.dumps({"theta": 0, "phi": 0, "radius": 4,
                    "H": 10**9, "W": 10**9}).encode(),
        json.dumps({"theta": 0, "phi": 0, "radius": 4,
                    "brightness": "dark"}).encode(),
    ]
    mesh_bodies = [
        b"[]",
        json.dumps({"resolution": -1}).encode(),
        json.dumps({"resolution": "big"}).encode(),
        json.dumps({"threshold": None}).encode(),
        json.dumps({"aabb": "cube"}).encode(),
        json.dumps({"aabb": [1, 1, 1, 0, 0, 0]}).encode(),
        json.dumps({"format": "stl"}).encode(),
    ]
    try:
        for body in bodies:
            status, reply, _ = _post(url + "/render", body)
            assert 400 <= status < 500, (status, body, reply[:200])
        for body in mesh_bodies:
            status, reply, _ = _post(url + "/mesh", body)
            assert 400 <= status < 500, (status, body, reply[:200])
        # The server is still healthy afterwards.
        status, reply, _ = _get(url + "/health")
        assert status == 200 and json.loads(reply)["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)
