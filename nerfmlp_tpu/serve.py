"""Persistent render serving — load once, compile once, serve frames.

The reference's inference story is one-shot CLIs
(``/root/reference/scripts/render_example.py:166-275``,
``/root/reference/zoom_example.py:100-170``): every render pays process
startup + checkpoint load, and on a compiled backend would also pay
per-shape program compilation. For production serving on TPU that cost
structure is wrong — XLA programs are compiled per shape and live for
the process, so the natural unit is one PERSISTENT process that compiles
each render shape once and amortizes it over every later request. (On
this environment a fresh process additionally pays a multi-minute
first-op tunnel stall — see CLAUDE.md — which a resident server pays
exactly once.)

:class:`RenderService` is the embeddable core (checkpoint + config +
compiled-program cache behind a dispatch lock). :func:`serve` wraps it
in a threaded stdlib HTTP server — no extra dependencies — with a JSON
API:

    GET  /health    -> status, render count, warm flag, reload count,
                       served checkpoint, latency percentiles
    GET  /spec      -> model / render configuration + defaults
    POST /render    -> image bytes (png, default), .npy bytes, or JSON
    POST /reload    -> hot-swap to the newest checkpoint in the watch dir
    POST /mesh      -> density-isosurface mesh of the CURRENTLY SERVED
                       weights (ops/mesh.py): binary .ply (default),
                       .obj, or JSON stats; composes with hot reload —
                       extract geometry from a model while it trains

Hot reload serves a model WHILE IT TRAINS: point the watch dir at a
Trainer ``--save_dir`` and every new layered checkpoint (the same files
auto-resume discovers) is swapped in — same architecture means every
compiled program is reused, so a swap costs one weight upload and zero
recompiles. ``--watch N`` polls automatically; ``POST /reload`` forces.

``POST /render`` accepts one camera spec per request:

    {"c2w": [[...], ...]}                       # 3x4 or 4x4 camera-to-world
    {"eye": [x,y,z], "target": [x,y,z]}         # look-at (ops/rays.py)
    {"theta": deg, "phi": deg, "radius": r}     # blender spherical pose

plus optional ``H``/``W``/``focal``/``near``/``far`` overrides (defaults
from the server config; near/far are traced runtime args so overriding
them never recompiles), ``gamma`` (linear->sRGB), ``brightness``,
``format`` ("png" | "npy" | "json"), ``maps`` (non-png formats may ask
for any of rgb_map/disp_map/depth_map/acc_map), and ``viewdirs_c2w``
(the oracle's ``c2w_staticcam`` view-dependence trick,
``/root/reference/example/run_nerf.py:299-302``).

Device dispatch is serialized by a lock: one XLA program at a time per
chip (concurrent dispatch interleaves and slows both requests; two TPU
*processes* additionally serialize behind this environment's tunnel).
HTTP threads queue on the lock, so the server stays correct under
concurrent clients while the device runs at full tilt. Queue depth is
bounded (``max_queue``, default 8): excess requests are shed with HTTP
503 + Retry-After (~one median render) instead of stacking unbounded
queueing latency — measured 4 concurrent clients at 400² take p50 from
832 ms to 3159 ms by queueing alone (docs/RESULTS.md serving study).

Multi-chip: pass a data-parallel ``mesh`` (scripts/serve.py builds one by
default when >1 devices are visible) and every frame's pixel grid is
sharded over the devices via ``parallel/render_parallel.py`` — the same
sharded renderer the trainer and batch CLIs use — with params and the
occupancy grid placed replicated once per swap, never per frame.
``/health`` reports p50/p95/p99/max tail latencies over a rolling window.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from collections import deque
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from nerfmlp_tpu.config import RenderConfig

_VALID_MAPS = ("rgb_map", "disp_map", "depth_map", "acc_map")
# A camera-spec JSON body is a few hundred bytes; reject anything absurd
# before reading it into memory (a 4x4 pose + overrides fits in 1 MB with
# orders of magnitude to spare).
MAX_BODY_BYTES = 1 << 20


class RequestError(ValueError):
    """A malformed render request (maps to HTTP 400)."""


class ServiceOverloaded(RuntimeError):
    """Render queue is full (maps to HTTP 503 + Retry-After).

    Device dispatch is serialized behind one lock, so under sustained
    overload every accepted request adds a full render time of pure
    queueing latency (measured: 4 concurrent clients took p50 from 832 ms
    to 3159 ms at 400² — docs/RESULTS.md serving study). Shedding load at
    a bounded queue depth keeps accepted requests' latency bounded and
    tells clients when to retry instead of silently stacking them."""


class RenderService:
    """A loaded model + render config held resident for repeated frames.

    Thread-safe: ``render_request`` may be called from any number of
    threads; device dispatch is serialized internally.
    """

    def __init__(
        self,
        params: Dict,
        cfg: RenderConfig,
        H: int,
        W: int,
        focal: float,
        *,
        near: Optional[float] = None,
        far: Optional[float] = None,
        tile: int = 4096,
        occ_grid=None,
        max_pixels: int = 4096 * 4096,
        max_queue: int = 8,
        max_mesh_resolution: int = 256,
        reload_fn: Optional[Callable[[str], Dict]] = None,
        occ_rebuild_fn: Optional[Callable[[Dict], object]] = None,
        watch_dir: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        ckpt_step: Optional[int] = None,
        mesh=None,
        log=print,
    ):
        # Multi-chip serving: on a >1-device pure data-parallel mesh each
        # frame's pixel grid is sharded over the devices
        # (parallel/render_parallel.py — the same sharded renderer the
        # trainer and batch CLIs use), so a v5e-8 server drives all 8
        # chips instead of 1. Params/occ-grid are placed replicated ONCE
        # here (and on every swap) so per-frame dispatches ship no weights.
        self.mesh = None
        if mesh is not None:
            from nerfmlp_tpu.parallel.render_parallel import (
                data_parallel_mesh,
            )

            self.mesh = data_parallel_mesh(mesh)
            if self.mesh is None:
                log("(serve mesh ignored: not a >1-device pure "
                    "data-parallel mesh — rendering on one device)")
        self.params = self._place(params)
        self.cfg = cfg
        self.tile = int(tile)
        self.occ_grid = self._place(occ_grid)
        self.defaults = {
            "H": int(H),
            "W": int(W),
            "focal": float(focal),
            "near": float(cfg.near if near is None else near),
            "far": float(cfg.far if far is None else far),
        }
        # Refuse absurd shapes before they reach the device: each new
        # (padded) ray count is fine — the tile program is shared — but
        # host-side ray gen + assembly memory is O(H*W).
        self.max_pixels = int(max_pixels)
        # Admission control: at most max_queue requests rendering-or-
        # waiting at once (0 = unbounded); excess requests are shed with
        # ServiceOverloaded -> HTTP 503 + Retry-After instead of stacking
        # unbounded queueing latency behind the dispatch lock.
        self.max_queue = int(max_queue)
        self._inflight = 0
        self.rejected = 0
        # /mesh grid cap: G^3 MLP evals — 256^3 is ~17M points, seconds
        # on a chip but a deliberate ceiling against one request pinning
        # the device for minutes (0 disables the /mesh route entirely).
        self.max_mesh_resolution = int(max_mesh_resolution)
        self.meshes = 0
        self._mesh_times = deque(maxlen=16)  # wall seconds per extraction
        self._mesh_active = 0  # extractions in progress (Retry-After hint)
        # Hot reload: reload_fn loads a checkpoint path into a params
        # pytree (same architecture: the compiled programs are reused
        # as-is — a swap never recompiles); occ_rebuild_fn refreshes an
        # occupancy grid from the new weights so cached density can't go
        # stale against them.
        self.reload_fn = reload_fn
        self.occ_rebuild_fn = occ_rebuild_fn
        self.watch_dir = watch_dir
        self.ckpt = {
            "path": ckpt_path,
            "mtime": _mtime(ckpt_path),
            # The caller usually just decoded the checkpoint for params;
            # take its step rather than re-parsing the file here.
            "step": ckpt_step if ckpt_step is not None
            else _ckpt_step(ckpt_path),
        }
        self.reloads = 0
        self.log = log
        self.renders = 0
        self.warm = False
        self.warmup_s: Optional[float] = None
        self._times = deque(maxlen=128)  # per-render seconds (device time)
        self._lock = threading.Lock()          # device dispatch
        self._stats_lock = threading.Lock()    # _times/renders (cheap, for
        #                                        /health to read without
        #                                        queueing behind a render)
        self._reload_lock = threading.Lock()   # watcher vs POST /reload

    def _place(self, tree):
        """Replicate a pytree over the serve mesh (no-op without one)."""
        if tree is None or self.mesh is None:
            return tree
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    # -------------------------------------------------------------- #
    # Core rendering
    # -------------------------------------------------------------- #
    def render_pose(
        self,
        c2w: np.ndarray,
        H: Optional[int] = None,
        W: Optional[int] = None,
        focal: Optional[float] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        viewdirs_c2w: Optional[np.ndarray] = None,
        maps: Tuple[str, ...] = ("rgb_map",),
        _record_stats: bool = True,
    ) -> Dict[str, np.ndarray]:
        """Render one camera; returns requested maps as (H, W[, C]) arrays.

        Reproduces the per-pose body of the reference render loop
        (``/root/reference/scripts/render_example.py:226-275``) with the
        checkpoint, config, and compiled tile program held resident.
        """
        try:
            H = int(self.defaults["H"] if H is None else H)
            W = int(self.defaults["W"] if W is None else W)
            focal = float(self.defaults["focal"] if focal is None else focal)
            near = (self.defaults["near"] if near is None else float(near))
            far = (self.defaults["far"] if far is None else float(far))
        except (TypeError, ValueError) as e:
            raise RequestError(f"H/W/focal/near/far must be numeric: {e}")
        if H <= 0 or W <= 0 or H * W > self.max_pixels:
            raise RequestError(
                f"image shape {W}x{H} outside (0, {self.max_pixels}] pixels"
            )
        for m in maps:
            if m not in _VALID_MAPS:
                raise RequestError(f"unknown map {m!r}; valid: {_VALID_MAPS}")
        c2w = _as_pose(c2w, "c2w")
        if viewdirs_c2w is not None:
            viewdirs_c2w = _as_pose(viewdirs_c2w, "viewdirs_c2w")
        # Admission BEFORE any device work; the warmup render
        # (_record_stats=False, pre-traffic) bypasses it.
        with self._admit(_record_stats):
            return self._render_admitted(
                c2w, viewdirs_c2w, H, W, focal, near, far, maps,
                _record_stats,
            )

    @contextmanager
    def _admit(self, record: bool = True):
        """Admission slot: raises :class:`ServiceOverloaded` when
        ``max_queue`` requests are already rendering-or-waiting. Renders
        AND mesh extractions share the pool — both hold the device."""
        if record:
            with self._stats_lock:
                if self.max_queue and self._inflight >= self.max_queue:
                    self.rejected += 1
                    raise ServiceOverloaded(
                        f"{self._inflight} renders in flight "
                        f"(max_queue={self.max_queue})"
                    )
                self._inflight += 1
        try:
            yield
        finally:
            if record:
                with self._stats_lock:
                    self._inflight -= 1

    def _render_admitted(self, c2w, viewdirs_c2w, H, W, focal, near, far,
                         maps, _record_stats):
        from nerfmlp_tpu.ops.render import render_image_maps
        from nerfmlp_tpu.render_path import (
            rays_for_pose, rays_for_pose_device,
        )

        if self.mesh is None:
            # Hot path: rays are generated ON device from the 16-float
            # pose — uploading full (H*W, 3) ray arrays per request costs
            # ~0.55 s at 800² through the tunnel (docs/RESULTS.md).
            o, d, vd = rays_for_pose_device(
                c2w, H, W, focal, self.cfg, viewdirs_pose=viewdirs_c2w
            )
        else:
            # The sharded renderer places ray shards itself — host rays.
            o, d, vd = rays_for_pose(
                c2w, H, W, focal, self.cfg, viewdirs_pose=viewdirs_c2w
            )
        with self._lock:
            t0 = time.perf_counter()
            if self.mesh is not None:
                from nerfmlp_tpu.parallel.render_parallel import (
                    render_image_sharded,
                )

                # ``tile`` means rays per dispatch in BOTH modes (same
                # contract as the batch CLIs, utils/cli.py::render_frame):
                # divide it across the mesh so each chip's tile — and the
                # padding a small frame pays — stays comparable.
                n_dev = self.mesh.shape["data"]
                out = render_image_sharded(
                    self.params, o, d, H, W, self.cfg, self.mesh,
                    tile=max(256, -(-self.tile // n_dev)),
                    near=near, far=far,
                    occ_grid=self.occ_grid, viewdirs=vd, maps=tuple(maps),
                )
            else:
                out = render_image_maps(
                    self.params, o, d, H, W, self.cfg, tile=self.tile,
                    near=near, far=far, occ_grid=self.occ_grid,
                    viewdirs=vd, maps=tuple(maps),
                )
            # np.asarray is the host readback — the honest completion
            # point on this backend (block_until_ready is a no-op
            # through the tunnel, CLAUDE.md).
            result = {k: np.asarray(v) for k, v in out.items()}
            dt = time.perf_counter() - t0
        if _record_stats:
            with self._stats_lock:
                self._times.append(dt)
                self.renders += 1
        return result

    def warmup(self) -> float:
        """Compile + run the default-shape program once; returns seconds.

        The first render of a config pays tracing + XLA compilation (and,
        through this environment's tunnel, the first-op stall); serving
        processes do it at startup so no client request ever does.
        Excluded from the /health latency stats and render count — a
        compile-dominated 10-40 s first frame would poison the
        percentiles for 128 requests.
        """
        from nerfmlp_tpu.ops.rays import pose_spherical

        t0 = time.perf_counter()
        self.render_pose(pose_spherical(0.0, -30.0, 4.0),
                         _record_stats=False)
        dt = time.perf_counter() - t0
        self.warm = True
        self.warmup_s = dt
        self.log(f"warmup render ({self.defaults['W']}x{self.defaults['H']})"
                 f" in {dt:.1f}s — programs resident")
        return dt

    # -------------------------------------------------------------- #
    # Request handling (transport-independent)
    # -------------------------------------------------------------- #
    def render_request(self, req: Dict) -> Tuple[bytes, str]:
        """JSON request dict -> (body bytes, content type).

        The transport-independent core of ``POST /render`` — tests and
        embedders can call it without a socket.
        """
        if not isinstance(req, dict):
            raise RequestError("request body must be a JSON object")
        c2w = _pose_from_request(req)
        fmt = req.get("format", "png")
        maps_req = req.get("maps", ("rgb_map",))
        if isinstance(maps_req, str):
            maps_req = (maps_req,)
        if not isinstance(maps_req, (list, tuple)) or not all(
            isinstance(m, str) for m in maps_req
        ):
            raise RequestError(
                '"maps" must be a list of map names '
                f"(valid: {_VALID_MAPS})"
            )
        maps = tuple(maps_req)
        if fmt == "png" and maps != ("rgb_map",):
            raise RequestError('format "png" serves rgb_map only; use '
                               '"npy"/"json" for other maps')
        out = self.render_pose(
            c2w,
            H=req.get("H"), W=req.get("W"), focal=req.get("focal"),
            near=req.get("near"), far=req.get("far"),
            viewdirs_c2w=(
                _as_pose(req["viewdirs_c2w"], "viewdirs_c2w")
                if "viewdirs_c2w" in req else None
            ),
            maps=maps,
        )
        if "rgb_map" in out:
            # Output conditioning, same order as the reference CLI
            # (brightness then gamma, render_example.py:246-252).
            try:
                brightness = float(req.get("brightness", 1.0))
            except (TypeError, ValueError) as e:
                raise RequestError(f"brightness must be numeric: {e}")
            rgb = np.clip(out["rgb_map"] * brightness, 0.0, 1.0)
            if req.get("gamma"):
                from nerfmlp_tpu.data.blender import linear_to_srgb

                rgb = linear_to_srgb(rgb)
            out["rgb_map"] = rgb

        if fmt == "png":
            from PIL import Image

            buf = io.BytesIO()
            arr = (out["rgb_map"] * 255).round().astype(np.uint8)
            Image.fromarray(arr).save(buf, format="PNG")
            return buf.getvalue(), "image/png"
        if fmt == "npy":
            if len(maps) != 1:
                raise RequestError('format "npy" serves exactly one map; '
                                   'use "json" for several')
            buf = io.BytesIO()
            np.save(buf, out[maps[0]].astype(np.float32))
            return buf.getvalue(), "application/octet-stream"
        if fmt == "json":
            body = {k: np.asarray(v, np.float32).tolist()
                    for k, v in out.items()}
            return json.dumps(body).encode(), "application/json"
        raise RequestError(f"unknown format {fmt!r}; png | npy | json")

    def mesh_request(self, req: Dict) -> Tuple[bytes, str]:
        """``POST /mesh``: density-isosurface mesh of the served weights.

        Request keys (all optional unless the server has no AABB):
        ``resolution`` (grid nodes/axis, default 128, capped at
        ``max_mesh_resolution``), ``threshold`` (sigma iso level, default
        25), ``aabb`` (6 floats; default = the server's render-config
        AABB, e.g. from ``--aabb``), ``color`` (bake per-vertex RGB,
        default true), ``gamma`` (sRGB-encode the baked colors — the
        model outputs linear radiance, same knob as /render's "gamma";
        default false), ``format`` ("ply" binary | "obj" | "json"
        stats).

        Holds the same dispatch lock and admission slot as a render —
        it IS device work (G^3 MLP evals through ops/mesh.py) — so a
        mesh extraction queues behind frames and counts against
        ``max_queue``. Reads the params reference once, so a hot reload
        mid-extraction affects the next request, not this one.
        """
        if not isinstance(req, dict):
            raise RequestError("request body must be a JSON object")
        if not self.max_mesh_resolution:
            raise RequestError("mesh extraction disabled on this server "
                               "(max_mesh_resolution=0)")
        try:
            resolution = int(req.get("resolution", 128))
            threshold = float(req.get("threshold", 25.0))
        except (TypeError, ValueError) as e:
            raise RequestError(f"resolution/threshold must be numeric: {e}")
        if not 2 <= resolution <= self.max_mesh_resolution:
            raise RequestError(
                f"resolution must be in [2, {self.max_mesh_resolution}]"
            )
        if not np.isfinite(threshold):
            raise RequestError("threshold must be finite")
        aabb = req.get("aabb", self.cfg.aabb)
        if aabb is None:
            raise RequestError(
                'no scene bounds: pass "aabb": [xmin,ymin,zmin,'
                "xmax,ymax,zmax] or start the server with --aabb"
            )
        from nerfmlp_tpu.ops.mesh import _check_aabb

        try:
            aabb = _check_aabb(aabb)
        except (TypeError, ValueError) as e:
            raise RequestError(str(e))
        color = bool(req.get("color", True))
        gamma = bool(req.get("gamma", False))
        fmt = req.get("format", "ply")
        if fmt not in ("ply", "obj", "json"):
            raise RequestError(f"unknown format {fmt!r}; ply | obj | json")

        from nerfmlp_tpu.ops.mesh import extract_mesh, obj_str, ply_bytes

        with self._admit():
            with self._stats_lock:
                self._mesh_active += 1
            try:
                t0 = time.perf_counter()
                # device_lock=self._lock: extract_mesh holds the dispatch
                # lock ONLY for its device-heavy stages (density eval,
                # color bake) — the numpy welding/orientation between
                # them must not block renders on an idle chip. One
                # self.params read: a concurrent hot reload swaps the
                # attribute, never mutates the old tree.
                mesh = extract_mesh(
                    self.params, self.cfg, resolution=resolution,
                    threshold=threshold, aabb=aabb, color=color,
                    gamma=gamma, mesh=self.mesh, device_lock=self._lock,
                )
                dt = time.perf_counter() - t0
            finally:
                with self._stats_lock:
                    self._mesh_active -= 1
        with self._stats_lock:
            self.meshes += 1
            self._mesh_times.append(dt)
        self.log(f"mesh {resolution}^3 iso {threshold:g}: "
                 f"{len(mesh['verts'])} verts / {len(mesh['faces'])} faces "
                 f"in {dt:.1f}s")
        if fmt == "json":
            return json.dumps({
                "verts": len(mesh["verts"]),
                "faces": len(mesh["faces"]),
                "sigma_min": mesh["sigma_min"],
                "sigma_max": mesh["sigma_max"],
                "resolution": resolution,
                "threshold": threshold,
                "aabb": list(aabb),
                "seconds": round(dt, 3),
            }).encode(), "application/json"
        if fmt == "obj":
            body = obj_str(mesh["verts"], mesh["faces"],
                           colors=mesh.get("colors"))
            return body.encode(), "text/plain; charset=utf-8"
        return ply_bytes(
            mesh["verts"], mesh["faces"], colors=mesh.get("colors"),
            normals=mesh["normals"], binary=True,
        ), "application/octet-stream"

    def spec(self) -> Dict:
        import dataclasses

        return {
            "defaults": dict(self.defaults),
            "tile": self.tile,
            "max_pixels": self.max_pixels,
            "max_queue": self.max_queue,
            "max_mesh_resolution": self.max_mesh_resolution,
            "occupancy": self.occ_grid is not None,
            "hot_reload": self.reload_fn is not None,
            "watch_dir": self.watch_dir,
            "render_config": dataclasses.asdict(self.cfg),
        }

    def retry_after_s(self) -> int:
        """Whole-second Retry-After hint for shed requests: one median
        render (a queue slot frees roughly that often), floor 1 s. While
        a mesh extraction is in flight the hint stretches to one median
        extraction (first one: a conservative 30 s — it also pays the
        compile) — a render-sized hint during a G^3 extraction would
        have clients collecting 503s every second."""
        with self._stats_lock:
            times = sorted(self._times)
            mesh_times = sorted(self._mesh_times)
            mesh_active = self._mesh_active
        hint = times[len(times) // 2] if times else 1.0
        if mesh_active:
            hint = max(
                hint, mesh_times[len(mesh_times) // 2] if mesh_times
                else 30.0,
            )
        return max(1, round(hint))

    def health(self) -> Dict:
        # Stats lock only: /health must answer instantly even while a
        # multi-second render holds the dispatch lock.
        with self._stats_lock:
            raw = list(self._times)
            renders = self.renders
            meshes = self.meshes
            inflight = self._inflight
            rejected = self.rejected
        times = sorted(raw)
        lat = None
        if times:
            # Nearest-rank percentiles over the rolling window — tails
            # (p95/p99) are what a serving endpoint is judged on.
            import math

            def pct(q: float) -> float:
                i = max(0, math.ceil(q * len(times)) - 1)
                return times[min(i, len(times) - 1)]

            lat = {
                "n": len(times),
                "p50_ms": round(pct(0.50) * 1e3, 2),
                "p95_ms": round(pct(0.95) * 1e3, 2),
                "p99_ms": round(pct(0.99) * 1e3, 2),
                "max_ms": round(times[-1] * 1e3, 2),
                "last_ms": round(raw[-1] * 1e3, 2),
            }
        return {
            "status": "ok",
            "renders": renders,
            "meshes": meshes,
            # Queue pressure: requests rendering-or-waiting right now,
            # the admission bound, and how many were shed with 503.
            "queued": inflight,
            "max_queue": self.max_queue,
            "rejected": rejected,
            "warm": self.warm,
            "warmup_s": None if self.warmup_s is None
            else round(self.warmup_s, 2),
            "reloads": self.reloads,
            "ckpt": dict(self.ckpt),
            "latency": lat,
        }

    # -------------------------------------------------------------- #
    # Hot checkpoint reload (serve a model while it trains)
    # -------------------------------------------------------------- #
    def swap_params(self, params: Dict, source: str = "<direct>") -> None:
        """Atomically replace the served weights (and occupancy grid).

        Same-architecture params reuse every compiled program — a swap
        costs one host->device upload, never a recompile. In-flight
        renders finish on the old weights; the next request sees the new.
        """
        params = self._place(params)
        occ = self._place(
            self.occ_rebuild_fn(params) if self.occ_rebuild_fn else None
        )
        with self._lock:
            self.params = params
            if self.occ_rebuild_fn:
                self.occ_grid = occ
            self.reloads += 1
        self.log(f"params swapped from {source} (reload #{self.reloads})")

    def reload(self, force: bool = True) -> Optional[Dict]:
        """Load the newest checkpoint and serve it; returns reload info.

        The path is the newest params checkpoint in ``watch_dir``
        (:func:`latest_params_checkpoint` — highest-step
        ``model_{step}*.ckpt``, the serving counterpart of auto-resume's
        discovery, oracle run_nerf.py:439-456) or, with no watch dir,
        the originally-served checkpoint file. No caller-supplied paths:
        the HTTP layer must not load arbitrary files.

        ``force=False`` (the watcher's mode) is a no-op unless the
        resolved (path, mtime) differs from what is being served.
        """
        if self.reload_fn is None:
            raise RequestError("server was started without reload support")
        # One reload at a time: the watcher thread and POST /reload must
        # not interleave resolve->load->swap, or an older checkpoint can
        # be swapped in last while self.ckpt reports the newer one.
        with self._reload_lock:
            path = (latest_params_checkpoint(self.watch_dir)
                    if self.watch_dir else self.ckpt["path"])
            if path is None:
                if force:
                    if self.watch_dir is None:
                        raise RequestError(
                            "server has no watch dir and no original "
                            "checkpoint path — nothing to reload")
                    raise RequestError(
                        f"no checkpoint found in {self.watch_dir!r}")
                return None
            mtime = _mtime(path)
            if not force and (path, mtime) == (self.ckpt["path"],
                                               self.ckpt["mtime"]):
                return None
            loaded = self.reload_fn(path)
            # reload_fn may return (params, step) — one decode instead
            # of re-parsing the checkpoint just for /health's step.
            step = None
            if isinstance(loaded, tuple):
                loaded, step = loaded
            # Swap FIRST, record the metadata only once the new weights
            # are actually served: committing self.ckpt before a failed
            # swap would make /health lie AND make the force=False
            # watcher skip this checkpoint forever ((path, mtime) would
            # already match) — stale weights served silently.
            self.swap_params(loaded, source=path)
            self.ckpt = {"path": path, "mtime": mtime,
                         "step": step if step is not None
                         else _ckpt_step(path)}
            return dict(self.ckpt)

    def watch(self, interval_s: float,
              stop: Optional[threading.Event] = None) -> threading.Thread:
        """Poll ``watch_dir`` and hot-swap newer checkpoints (daemon).

        The live-training companion: point ``watch_dir`` at a Trainer's
        ``--save_dir`` and every new ``metrics_latest.ckpt`` /
        ``model_{step}*.ckpt`` is served within one interval — a render
        preview of the run as it trains.
        """
        stop = stop or threading.Event()

        def loop():
            while not stop.wait(interval_s):
                try:
                    info = self.reload(force=False)
                    if info:
                        self.log(f"watch: now serving step {info['step']}"
                                 f" ({os.path.basename(info['path'])})")
                except Exception as e:  # mid-write file etc.: retry later
                    self.log(f"watch: reload failed ({e}); retrying")

        thread = threading.Thread(target=loop, daemon=True,
                                  name="ckpt-watch")
        thread.stop_event = stop  # type: ignore[attr-defined]
        thread.start()
        return thread


def latest_params_checkpoint(save_dir: str) -> Optional[str]:
    """Newest checkpoint for SERVING from a Trainer save dir.

    Differs from auto-resume's ``latest_checkpoint`` deliberately:
    resume wants ``metrics_latest.ckpt`` (full train state, optimizer
    moments included); serving wants the highest-step params-only
    ``model_{step}[_latest].ckpt`` — a third of the bytes to load and an
    honest step number for /health. Falls back to ``metrics_latest.ckpt``
    (load_params_any extracts its params) only when no stepped
    checkpoint exists yet.
    """
    from nerfmlp_tpu.train.checkpoint import step_from_filename

    if not os.path.isdir(save_dir):
        return None
    best: Tuple[int, float, Optional[str]] = (0, 0.0, None)
    for name in os.listdir(save_dir):
        if name.startswith("model_") and name.endswith(".ckpt"):
            step = step_from_filename(name)
            if step <= 0:  # model_best/model_final carry no step
                continue
            key = (step, _mtime(os.path.join(save_dir, name)) or 0.0, name)
            if key[:2] > best[:2]:
                best = key
    if best[2] is not None:
        return os.path.join(save_dir, best[2])
    cand = os.path.join(save_dir, "metrics_latest.ckpt")
    return cand if os.path.exists(cand) else None


def _ckpt_step(path: Optional[str]) -> int:
    """Honest step for /health: from the filename, else from inside a
    full-TrainState checkpoint (``metrics_latest.ckpt`` carries no step
    in its NAME but holds the true one in its state)."""
    if not path:
        return 0
    from nerfmlp_tpu.train.checkpoint import (
        step_from_filename,
        step_in_checkpoint,
    )

    return step_from_filename(path) or step_in_checkpoint(path)


def _mtime(path: Optional[str]) -> Optional[float]:
    try:
        return os.path.getmtime(path) if path else None
    except OSError:
        return None


def _as_pose(x, name: str) -> np.ndarray:
    try:
        pose = np.asarray(x, dtype=np.float32)
    except (TypeError, ValueError) as e:  # ragged / non-numeric input
        raise RequestError(f"{name} is not a numeric matrix: {e}")
    if pose.shape == (3, 4):
        pose = np.concatenate(
            [pose, np.array([[0, 0, 0, 1]], np.float32)], axis=0
        )
    if pose.shape != (4, 4):
        raise RequestError(f"{name} must be 3x4 or 4x4, got {pose.shape}")
    if not np.all(np.isfinite(pose)):
        raise RequestError(f"{name} contains non-finite values")
    return pose


def _pose_from_request(req: Dict) -> np.ndarray:
    """One camera per request: c2w | eye/target | theta/phi/radius."""
    from nerfmlp_tpu.ops.rays import look_at_matrix, pose_spherical

    specs = [k for k in ("c2w", "eye", "theta") if k in req]
    if len(specs) != 1:
        raise RequestError(
            'exactly one camera spec required: "c2w", "eye"+"target", or '
            '"theta"+"phi"+"radius"'
        )
    if "c2w" in req:
        return _as_pose(req["c2w"], "c2w")
    if "eye" in req:
        if "target" not in req:
            raise RequestError('"eye" camera needs "target"')
        try:
            eye = np.asarray(req["eye"], np.float32)
            target = np.asarray(req["target"], np.float32)
            up = np.asarray(req["up"], np.float32) if "up" in req else None
        except (TypeError, ValueError) as e:
            raise RequestError(f'"eye"/"target"/"up" must be numeric: {e}')
        if eye.shape != (3,) or target.shape != (3,):
            raise RequestError('"eye"/"target" must be 3-vectors')
        if up is not None and up.shape != (3,):
            raise RequestError('"up" must be a 3-vector')
        return look_at_matrix(eye, target, up)
    try:
        return pose_spherical(
            float(req["theta"]), float(req["phi"]), float(req["radius"])
        )
    except KeyError as e:
        raise RequestError(f'spherical camera needs "theta","phi","radius"'
                           f" (missing {e})")
    except (TypeError, ValueError) as e:
        raise RequestError(f"theta/phi/radius must be numeric: {e}")


# ------------------------------------------------------------------ #
# HTTP layer (stdlib only)
# ------------------------------------------------------------------ #
class _Handler(BaseHTTPRequestHandler):
    # Socket timeout (StreamRequestHandler honors this): a client that
    # advertises a body and then stalls would otherwise block its handler
    # thread in rfile.read() forever — N such connections starve the
    # ThreadingHTTPServer. On timeout the read raises and the connection
    # is closed; 60 s is generous against the multi-second renders.
    timeout = 60

    # Quiet by default: per-request stderr lines are the service log's job.
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    @property
    def service(self) -> RenderService:
        return self.server.service  # type: ignore[attr-defined]

    def _reply(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj) -> None:
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):  # noqa: N802
        if self.path == "/health":
            self._reply_json(200, self.service.health())
        elif self.path == "/spec":
            self._reply_json(200, self.service.spec())
        else:
            self._reply_json(404, {"error": f"no route {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path not in ("/render", "/reload", "/mesh"):
            self._reply_json(404, {"error": f"no route {self.path}"})
            return
        try:
            if self.path == "/reload":
                # Reloads the newest checkpoint from the CONFIGURED
                # watch dir / ckpt path only — no paths from the wire.
                info = self.service.reload(force=True)
                self._reply_json(200, {"reloaded": True, **info})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                # The advertised body was never read — keep-alive would
                # parse it as the next request line. Close instead.
                self._reply_json(400, {"error": "bad Content-Length"})
                self.close_connection = True
                return
            if n < 0:
                # A negative length would both dodge the size cap below
                # AND turn rfile.read(n) into read-until-EOF — exactly
                # the unbounded buffering the cap exists to prevent.
                self._reply_json(400, {"error": "bad Content-Length"})
                self.close_connection = True
                return
            if n > MAX_BODY_BYTES:
                # Reject without BUFFERING: an unbounded read-into-memory
                # would let any client exhaust host RAM with one giant
                # body. Drain-and-discard in bounded chunks (so a
                # well-behaved client sees the 413 rather than a broken
                # pipe); past the drain cap, just close the connection.
                remaining = n
                if n <= 8 * MAX_BODY_BYTES:
                    while remaining > 0:
                        chunk = self.rfile.read(min(65536, remaining))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                self._reply_json(413, {
                    "error": f"request body {n} bytes exceeds "
                             f"{MAX_BODY_BYTES} (a camera spec is tiny)"
                })
                self.close_connection = True
                return
            req = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/mesh":
                body, ctype = self.service.mesh_request(req)
            else:
                body, ctype = self.service.render_request(req)
            self._reply(200, body, ctype)
        except RequestError as e:
            self._reply_json(400, {"error": str(e)})
        except ServiceOverloaded as e:
            # Load shed: the render queue is at max_queue. 503 with a
            # Retry-After of ~one median render so clients back off
            # instead of stacking unbounded queueing latency.
            retry = self.service.retry_after_s()
            body = json.dumps(
                {"error": str(e), "retry_after_s": retry}
            ).encode()
            self.send_response(503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Retry-After", str(retry))
            self.end_headers()
            self.wfile.write(body)
        except json.JSONDecodeError as e:
            self._reply_json(400, {"error": f"bad JSON: {e}"})
        except Exception as e:  # render bug: report, keep serving
            self.service.log(f"request failed: {type(e).__name__}: {e}")
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})


class RenderServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the :class:`RenderService`."""

    daemon_threads = True

    def __init__(self, service: RenderService, host: str = "127.0.0.1",
                 port: int = 0):
        super().__init__((host, port), _Handler)
        self.service = service


def serve(service: RenderService, host: str = "127.0.0.1", port: int = 8008,
          warmup: bool = True, watch_interval: float = 0.0) -> None:
    """Blocking server loop (the ``scripts/serve.py`` entry point)."""
    server = RenderServer(service, host, port)
    if warmup:
        service.warmup()
    if watch_interval > 0:
        service.watch(watch_interval)
        service.log(f"watching {service.watch_dir} every "
                    f"{watch_interval:g}s for newer checkpoints")
    h, p = server.server_address[:2]
    service.log(f"serving on http://{h}:{p}  "
                f"(POST /render, POST /reload, GET /health, GET /spec)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        service.log("shutting down")
    finally:
        server.server_close()
