"""The training loop: logging, quick/full validation, layered checkpoints,
resume — behavioral parity with scripts/train.py:365-740, with the
documented flaws fixed (SURVEY §3.1/3.3):

  * validation renders WHOLE held-out images (PSNR + SSIM on images, not
    shuffled ray batches),
  * ``full_val_interval`` actually triggers mid-training full validation,
  * per-iteration timing is measured per step, async: device scalars are
    only read back at log/val boundaries, so the hot loop never syncs.
"""

from __future__ import annotations

import dataclasses
import os
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.data import image_viewdirs
from nerfmlp_tpu.data.pipeline import RayBatchLoader
from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step
from nerfmlp_tpu.train import checkpoint as ckpt
from nerfmlp_tpu.train.metrics import (
    calculate_etc,
    format_time_duration,
    get_memory_usage_gb,
    psnr_images,
    ssim,
)


def dispatch_window(
    step: int, iters: int, max_w: int, intervals, stop_steps=()
) -> int:
    """Size of the dispatch window starting at ``step`` (1-based, inclusive).

    The window [step, step+w-1] may contain a host-action step ONLY at its
    last position, so every ``step % interval == 0`` event block fires on
    exactly the same steps as single-step dispatch. ``intervals``: active
    periods whose multiples need host work (logging, validation,
    checkpoints, render events, occupancy refresh). ``stop_steps``: one-off
    boundaries (the precrop transition). Zero/None entries are ignored.
    """
    w = min(max_w, iters - step + 1)
    for ivl in intervals:
        if ivl:
            nxt = ((step + ivl - 1) // ivl) * ivl  # next multiple >= step
            w = min(w, nxt - step + 1)
    for s in stop_steps:
        if s and step <= s:
            w = min(w, s - step + 1)
    return max(w, 1)


class Trainer:
    """End-to-end trainer for one scene.

    ``train_ds``/``val_ds``/``quick_val_ds`` are BlenderDataset-like objects
    (need ``all_rays_*``, ``image_rays``, ``n_images``, ``H/W``).
    """

    def __init__(
        self,
        rc: RenderConfig,
        tc: TrainConfig,
        train_ds,
        val_ds=None,
        quick_val_ds=None,
        save_dir: str = "outputs/checkpoints",
        mesh=None,
        verbose: bool = True,
        tensorboard_dir: Optional[str] = None,
        render_poses=None,
        test_ds=None,
    ):
        self.rc = rc
        self.tc = tc
        self.train_ds = train_ds
        self.val_ds = val_ds
        # `or` would treat a provided-but-empty split (len 0, falsy) as
        # absent and silently substitute FULL-res validation every
        # quick-val interval; only an omitted argument falls back.
        self.quick_val_ds = quick_val_ds if quick_val_ds is not None else val_ds
        self.save_dir = save_dir
        self.mesh = mesh
        self.verbose = verbose
        # In-training render events (the oracle's i_video / i_testset,
        # example/run_nerf.py:845-872): a trajectory of c2w poses for the
        # spiral video, and a held-out dataset for the test-set sweeps.
        self.render_poses = render_poses
        self.test_ds = test_ds
        os.makedirs(save_dir, exist_ok=True)

        # Optional TensorBoard scalars (the TF oracle logs loss/psnr/images
        # via tf.summary, example/run_nerf.py:874-922; torch's writer is the
        # dependency-free equivalent here). Best-effort.
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception as e:
                print(f"(tensorboard disabled: {e})")

        # A mesh with a >1 "model" axis selects the tensor-parallel step
        # (parallel/tensor_parallel.py): params + Adam moments sharded
        # column/row on that axis, batch still sharded on "data".
        self._tp = (
            mesh is not None
            and "model" in mesh.axis_names
            and mesh.shape["model"] > 1
        )
        self._state_sharding = None
        self.state = create_train_state(rc, tc)
        if self._tp:
            if rc.use_occupancy:
                raise ValueError(
                    "tensor parallelism + occupancy sampling is not wired; "
                    "drop --use_occupancy or --tensor_parallel"
                )
            if rc.use_pallas:
                # The fused Mosaic kernel has no GSPMD partitioner: with
                # model-axis-sharded weights it would fail to compile (or
                # silently all-gather them per step). TP is the XLA path.
                rc = self.rc = dataclasses.replace(rc, use_pallas=False)
                print("(tensor parallelism: pallas kernel disabled — "
                      "sharded weights take the XLA path)")
            from nerfmlp_tpu.parallel.tensor_parallel import (
                make_tp_train_step,
                tp_state_sharding,
            )

            self._state_sharding = tp_state_sharding(self.state, mesh)
            self.state = jax.device_put(self.state, self._state_sharding)
            self.step_fn, _ = make_tp_train_step(
                rc, tc, mesh, state_sharding=self._state_sharding
            )
        elif mesh is not None:
            from nerfmlp_tpu.parallel.mesh import replicated_sharding

            self._state_sharding = replicated_sharding(mesh)
            self.state = jax.device_put(self.state, self._state_sharding)
            self.step_fn = make_train_step(rc, tc, mesh=mesh)
        else:
            self.step_fn = make_train_step(rc, tc, mesh=mesh)
        self.loader = RayBatchLoader.from_dataset(
            train_ds, tc.batch_size, seed=tc.seed, image_mode=tc.no_batching
        )
        # Device-resident ray pool (tc.device_pool): the train step reads
        # its batch from a per-epoch on-device shuffle — zero host->device
        # bytes per step. The host loader still covers the precrop phase
        # (central-crop sampling is per-image on host) and the fallbacks
        # below.
        self.pool = None
        self.pool_step_fn = None
        if tc.device_pool:
            if self._tp:
                print("(device_pool ignored under tensor parallelism)")
            elif tc.no_batching:
                print("(device_pool ignored: --no_batching samples "
                      "per-image on host)")
            elif len(self.loader) < tc.batch_size:
                print("(device_pool ignored: ray pool smaller than one "
                      "batch — host with-replacement sampling)")
            else:
                from nerfmlp_tpu.data.device_pool import DeviceRayPool
                from nerfmlp_tpu.parallel.train_step import make_pool_step

                self.pool = DeviceRayPool(
                    self.loader.pool, tc.batch_size, seed=tc.seed,
                    mesh=mesh,
                )
                self.pool_step_fn = make_pool_step(
                    rc, tc, self.pool.steps_per_epoch, mesh=mesh
                )
        # K-step scan dispatch (tc.steps_per_dispatch > 1): one compiled
        # lax.scan program per window. Not wired for tensor parallelism
        # (its step carries its own sharding contract; per-step dispatch
        # cost is negligible next to TP's cross-chip matmuls anyway).
        # With an active device pool the scan indexes its K batches from
        # the resident stack (make_pool_scan) — zero bytes AND K x fewer
        # RPCs per window; measured +7% on the turbo recipe where the
        # per-dispatch host floor binds (docs/RESULTS.md r4).
        self.scan_fn = None
        self.pool_scan = None
        if tc.steps_per_dispatch > 1:
            if self._tp:
                print("(steps_per_dispatch ignored under tensor parallelism)")
            elif self.pool is not None:
                from nerfmlp_tpu.parallel.train_step import make_pool_scan

                self.pool_scan = make_pool_scan(
                    rc, tc, self.pool.steps_per_epoch, mesh=mesh
                )
            else:
                from nerfmlp_tpu.parallel.train_step import make_train_scan

                self.scan_fn = make_train_scan(rc, tc, mesh=mesh)

        # Occupancy-grid sampling state (ops/occupancy.py).
        self.occ_grid = None
        self._occ_update = None
        if rc.use_occupancy:
            if rc.aabb is None:
                raise ValueError("use_occupancy requires RenderConfig.aabb")
            from nerfmlp_tpu.ops.occupancy import create_grid, update_grid

            self.occ_grid = create_grid(rc.occ_grid_size)
            self._occ_update = jax.jit(
                lambda grid, params, rng, decay: update_grid(
                    grid, params, rc, rng, decay=decay
                )
            )
        self._batch_sharding = None
        if mesh is not None:
            from nerfmlp_tpu.parallel.mesh import batch_sharding

            self._batch_sharding = batch_sharding(mesh)
        # Validation / i_img / i_video / i_testset renders shard each
        # frame's pixel grid over a pure data-parallel mesh (under TP the
        # local renderer already handles the sharded params correctly).
        from nerfmlp_tpu.parallel.render_parallel import data_parallel_mesh

        self.render_mesh = data_parallel_mesh(mesh)

        # Metric histories (reference schema, train.py:457-467).
        self.history: Dict = {
            "step": 0,
            "train_losses": [],
            "train_psnrs": [],
            "quick_val_losses": [],
            "quick_val_psnrs": [],
            "quick_val_ssims": [],
            "full_val_losses": [],
            "full_val_psnrs": [],
            "full_val_ssims": [],
            "val_steps": [],
            "full_val_steps": [],
            "iteration_times": [],
            # Ring-buffer bookkeeping: iteration_times is capped (memory +
            # JSON-rewrite cost grow per step otherwise); dropped samples
            # stay accounted for here so totals remain exact.
            "iteration_times_dropped": 0,
            "iteration_times_dropped_sum": 0.0,
            "testset_psnrs": [],
            "testset_steps": [],
            "best_val_psnr": 0.0,
        }

    # iteration_times cap: once the list exceeds this, the oldest half is
    # folded into the dropped counters. 20k floats ≈ 160 KB in memory and
    # ~400 KB of JSON — bounded regardless of run length (a 200k-step run
    # would otherwise re-serialize ~4 MB every quick-val).
    _ITER_TIMES_CAP = 20_000

    # ------------------------------------------------------------------ #

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg, flush=True)

    def _lr_at(self, step: int) -> float:
        return float(
            self.tc.lr * self.tc.lr_decay_rate ** (step / self.tc.lr_decay_steps)
        )

    def _render_view_maps(self, dataset, idx: int, maps=("rgb_map",)):
        """Deterministic render of one held-out view + its GT — the ONE
        place the eval-render config/tile/viewdirs plumbing lives (shared
        by validation, i_img dumps, and TB image logging; the copies this
        replaces had already drifted on tile=). Returns ({map: HW...}, gt)."""
        from nerfmlp_tpu.ops.render import render_image_maps

        # render_image_maps forces perturb=False/raw_noise_std=0 itself
        # (ops/render.py) — no per-caller replace needed.
        cfg = self.rc
        o, d, gt = dataset.image_rays(idx)
        vd = image_viewdirs(dataset, idx)
        if self.render_mesh is not None:
            from nerfmlp_tpu.parallel.render_parallel import (
                render_image_sharded,
            )

            n_dev = self.render_mesh.shape["data"]
            out = render_image_sharded(
                self.state.params, o, d, dataset.H, dataset.W, cfg,
                self.render_mesh, tile=max(256, -(-self.tc.chunk // n_dev)),
                occ_grid=self.occ_grid, viewdirs=vd, maps=tuple(maps),
            )
        else:
            out = render_image_maps(
                self.state.params, jnp.asarray(o), jnp.asarray(d),
                dataset.H, dataset.W, cfg, tile=self.tc.chunk,
                occ_grid=self.occ_grid, viewdirs=vd, maps=tuple(maps),
            )
        return {k: np.asarray(v) for k, v in out.items()}, gt

    def _tb_extra_maps(self) -> tuple:
        """The oracle's coarse-pass TB extras (run_nerf.py:905-921): only
        meaningful when a fine pass exists (occupancy mode replaces the
        coarse pass with the grid and renders no coarse maps)."""
        if (
            self._tb is not None
            and self.rc.N_importance > 0
            and not self.rc.use_occupancy
        ):
            return ("rgb_map_coarse", "disp_map_coarse", "z_std")
        return ()

    def _render_view(self, dataset, idx: int):
        # Same canonical maps tuple as _validate: every Trainer render
        # shares ONE compiled tile program per config (a second tuple
        # would jit a second whole-image program, ~40s on the chip).
        out, gt = self._render_view_maps(
            dataset, idx, ("rgb_map",) + self._tb_extra_maps()
        )
        return out["rgb_map"], gt

    def _validate(self, dataset, n_images: Optional[int] = None):
        """Render whole held-out images; average PSNR/SSIM/MSE over them.
        Returns None when there is nothing to validate (empty split or
        subset 0) — NaN means would poison best-checkpoint selection."""
        n = dataset.n_images if n_images is None else min(n_images, dataset.n_images)
        if n <= 0:
            self._last_val_render = None  # never re-log a stale TB image
            self._last_val_maps = None
            return None
        # ONE maps tuple for EVERY view: the tile renderer compiles per
        # (cfg, maps) pair, so rendering view 0 with TB extras and the
        # rest with rgb-only would pay a second whole-image jit compile
        # (~40s on the chip, 5-10x worse under host load) — the extras
        # are assembled from values render_rays computes anyway.
        maps = ("rgb_map",) + self._tb_extra_maps()
        mses, psnrs, ssims = [], [], []
        for i in range(n):
            out, gt = self._render_view_maps(dataset, i, maps)
            img = out["rgb_map"]
            if i == 0:
                # View 0 also feeds _tb_histograms_and_image: cache the
                # full map set — no second render there either.
                self._last_val_render = (dataset, img, gt)
                self._last_val_maps = out
            mses.append(float(np.mean((img - gt) ** 2)))
            psnrs.append(psnr_images(img, gt))
            ssims.append(ssim(img, gt))
        return {
            "loss": float(np.mean(mses)),
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.nanmean(ssims)),
        }

    def _save_val_image(self, step: int) -> None:
        """Dump one held-out render for visual monitoring (the oracle's
        i_img holdout dumps, example/run_nerf.py:874-922). Best-effort."""
        if self.val_ds is None:
            return
        try:
            from nerfmlp_tpu.utils.image import save_png

            img, _ = self._render_view(self.val_ds, 0)
            save_png(os.path.join(self.save_dir, f"val_{step:06d}.png"), img)
        except Exception as e:
            self._log(f"(val image dump skipped: {e})")

    def _hwf(self, ds):
        return ds.H, ds.W, ds.focal

    def _video_event(self, step: int) -> None:
        """Render the spiral/orbit trajectory to rgb + disp videos — the
        oracle's i_video event (example/run_nerf.py:845-863). Best-effort:
        a failed encode must not kill a long training run."""
        try:
            from nerfmlp_tpu.render_path import render_path, save_path_videos

            rgbs, disps, _ = render_path(
                self.state.params, self.render_poses,
                self._hwf(self.train_ds), self.rc,
                render_factor=self.tc.render_factor,
                occ_grid=self.occ_grid, verbose=False, tile=self.tc.chunk,
                mesh=self.render_mesh,
            )
            expname = os.path.basename(os.path.normpath(self.save_dir))
            base = os.path.join(self.save_dir, f"{expname}_spiral_{step:06d}")
            rgb_path, disp_path = save_path_videos(base, rgbs, disps)
            self._log(f"🎬 i_video @ {step:,}: {rgb_path}, {disp_path}")
            if self.rc.use_viewdirs:
                # View-dependence visualization: fixed camera, viewdirs
                # following the trajectory (the oracle's c2w_staticcam
                # rgb_still video, run_nerf.py:858-863).
                from nerfmlp_tpu.utils.image import to8b, write_video

                stills, _, _ = render_path(
                    self.state.params, self.render_poses,
                    self._hwf(self.train_ds), self.rc,
                    render_factor=self.tc.render_factor,
                    occ_grid=self.occ_grid, verbose=False,
                    tile=self.tc.chunk, mesh=self.render_mesh,
                    static_cam_pose=np.asarray(self.render_poses)[0],
                )
                still_path = write_video(base + "_rgb_still", to8b(stills))
                self._log(f"🎬 i_video @ {step:,}: {still_path} (static cam)")
        except Exception as e:
            self._log(f"(i_video event failed: {e})")

    def _testset_event(self, step: int) -> None:
        """Render every held-out test pose with per-frame PSNR — the
        oracle's i_testset event (example/run_nerf.py:865-872); frames go
        to testset_{step:06d}/ like the oracle's testsavedir."""
        try:
            from nerfmlp_tpu.render_path import render_path

            out_dir = os.path.join(self.save_dir, f"testset_{step:06d}")
            # render_path skips PSNR under render_factor (shapes mismatch,
            # oracle behavior) — instead pre-divide hwf and stride-sample
            # the GT to the preview resolution so per-frame PSNR is always
            # logged, even for fast mid-training sweeps.
            H, W, focal = self._hwf(self.test_ds)
            gt = self.test_ds.images
            rf = int(self.tc.render_factor or 0)
            if rf > 1:
                H, W, focal = H // rf, W // rf, focal / rf
                gt = gt[:, : H * rf : rf, : W * rf : rf]
            _, _, psnrs = render_path(
                self.state.params, self.test_ds.poses,
                (H, W, focal), self.rc,
                gt_images=gt, tile=self.tc.chunk,
                occ_grid=self.occ_grid, save_dir=out_dir, verbose=False,
                mesh=self.render_mesh,
            )
            if psnrs:
                mean_p = float(np.mean(psnrs))
                self.history["testset_psnrs"].append(mean_p)
                self.history["testset_steps"].append(step)
                if self._tb is not None:
                    self._tb.add_scalar("test/psnr", mean_p, step)
                self._log(
                    f"🧪 i_testset @ {step:,}: {len(psnrs)} views -> {out_dir} "
                    f"| mean PSNR {mean_p:.2f} "
                    f"(min {min(psnrs):.2f} / max {max(psnrs):.2f})"
                )
            else:
                self._log(f"🧪 i_testset @ {step:,}: frames -> {out_dir}")
        except Exception as e:
            self._log(f"(i_testset event failed: {e})")

    def _mesh_event(self, step: int) -> None:
        """Dump a density-isosurface .ply snapshot of the current weights
        (ops/mesh.py) — a geometry timelapse alongside the oracle's image
        events. Framework superset: the reference has no geometry export.
        Best-effort like the other events."""
        try:
            if self.rc.aabb is None:
                if not getattr(self, "_mesh_warned", False):
                    self._mesh_warned = True
                    self._log("(i_mesh skipped: needs --aabb scene bounds)")
                return
            from nerfmlp_tpu.ops.mesh import extract_mesh, save_ply

            mesh = extract_mesh(
                self.state.params, self.rc,
                resolution=self.tc.mesh_resolution,
                threshold=self.tc.mesh_threshold,
                mesh=self.render_mesh,
            )
            expname = os.path.basename(os.path.normpath(self.save_dir))
            path = os.path.join(
                self.save_dir, f"{expname}_mesh_{step:06d}.ply"
            )
            save_ply(path, mesh["verts"], mesh["faces"],
                     colors=mesh.get("colors"), normals=mesh["normals"])
            self._log(
                f"🔺 i_mesh @ {step:,}: {len(mesh['verts'])} verts / "
                f"{len(mesh['faces'])} faces (iso "
                f"{self.tc.mesh_threshold:g}, sigma_max "
                f"{mesh['sigma_max']:.3g}) -> {path}"
            )
        except Exception as e:
            self._log(f"(i_mesh event failed: {e})")

    def quick_validate(self) -> Dict[str, float]:
        return self._validate(self.quick_val_ds, self.tc.quick_val_subset)

    def full_validate(self) -> Dict[str, float]:
        return self._validate(self.val_ds)

    # ------------------------------------------------------------------ #

    def resume(self, path: str) -> bool:
        """Restore state + metric histories from a metrics_latest.ckpt
        (the history lives in a JSON sidecar, same basename + .history.json;
        reference semantics: missing file -> warn + start fresh,
        train.py:292-361)."""
        if not os.path.exists(path):
            self._log(f"⚠️  resume checkpoint not found: {path} — starting fresh")
            return False
        host_state = jax.device_get(self.state)
        try:
            tree, params_only = ckpt.load_state_or_params(path, host_state)
        except (ckpt.CheckpointCorruptError, OSError) as e:
            # A corrupt/truncated checkpoint must not brick training
            # forever (writes are atomic now, but files from older runs or
            # partial copies exist in the wild). Warn and start fresh —
            # the reference warns + starts fresh on missing files too
            # (train.py:292-361). Structure/shape mismatches (wrong
            # --netdepth/--netwidth/--separate_fine against an existing
            # run) propagate instead: silently starting fresh would
            # overwrite the prior run's checkpoints.
            self._log(f"⚠️  resume failed to decode {path} ({e}) — "
                      f"starting fresh")
            return False
        if params_only:
            # Auto-discovery can land on a params-only model_{step}.ckpt
            # (e.g. metrics_latest.ckpt was corrupted/removed). Restore the
            # weights, take the step from the filename, keep a fresh
            # optimizer — the oracle's .npy reload does exactly this
            # (weights only, step from the filename, run_nerf.py:439-456).
            step = ckpt.step_from_filename(path)
            if step == 0 and os.path.basename(path) != "model_0.ckpt":
                # model_final/model_best/foreign names carry no step: the
                # LR schedule restarts at the INITIAL (hottest) rate and
                # the run renumbers from 0 — usually NOT what a user
                # resuming a converged model wants. Be loud about it.
                self._log(
                    f"⚠️  cannot infer the training step from "
                    f"'{os.path.basename(path)}' — resuming at step 0 with "
                    f"the initial learning rate. To preserve the schedule, "
                    f"resume a model_{{step}}.ckpt or a full "
                    f"metrics_latest.ckpt state instead."
                )
            # The fresh optimizer's exponential-decay schedule is driven by
            # ScaleByScheduleState.count, NOT state.step — fast-forward it
            # or a late-step params-only resume trains at the INITIAL LR
            # (~5x too hot at 190k/250k) while the log prints the decayed
            # one. Adam's own count stays 0: zeroed moments need fresh
            # bias correction. (The oracle restores global_step for its
            # decay, run_nerf.py:439-456 + :705-709.)
            is_sched = lambda s: type(s).__name__ == "ScaleByScheduleState"
            opt_state = jax.tree.map(
                lambda s: (
                    s._replace(count=jnp.asarray(step, jnp.int32))
                    if is_sched(s) else s
                ),
                host_state.opt_state,
                is_leaf=is_sched,
            )
            restored = host_state.replace(
                params=tree, step=jnp.asarray(step, jnp.int32),
                opt_state=opt_state,
            )
            self._log(
                f"⚠️  {path} holds params only — optimizer moments reset, "
                f"LR schedule fast-forwarded to step {step:,}"
            )
        else:
            restored = tree
        if self._state_sharding is not None:
            # Re-apply the layout __init__ used (replicated, or the TP
            # column/row shardings) — a plain put commits to one device,
            # breaking donation (and multi-host).
            self.state = jax.device_put(restored, self._state_sharding)
        else:
            self.state = jax.device_put(restored)
        hist_path = path.rsplit(".", 1)[0] + ".history.json"
        if os.path.exists(hist_path):
            self.history.update(ckpt.load_metrics_json(hist_path))
        else:
            self._log(f"⚠️  no history sidecar at {hist_path} — metric "
                      f"histories start empty (step comes from the state)")
        # The restored TrainState's step is authoritative; the sidecar may
        # be missing or stale — never silently restart at 0.
        self.history["step"] = max(
            int(self.history.get("step", 0)), int(self.state.step)
        )
        if self.occ_grid is not None:
            # Rebuild the density grid from the restored model (derived
            # state; cheaper to refresh than checkpoint). decay=0 makes one
            # call sufficient — an EMA refresh of the fresh grid would not.
            self.occ_grid = self._occ_update(
                self.occ_grid, self.state.params, jax.random.PRNGKey(17), 0.0
            )
        self._log(
            f"🔄 resumed from {path} at step {int(self.history['step']):,} "
            f"(best quick-val PSNR {self.history['best_val_psnr']:.2f})"
        )
        return True

    def _save_resumable(self, name: str = "metrics_latest.ckpt") -> None:
        path = os.path.join(self.save_dir, name)
        ckpt.save_checkpoint(path, jax.device_get(self.state))
        ckpt.save_metrics_json(path.rsplit(".", 1)[0] + ".history.json", self.history)

    # ------------------------------------------------------------------ #

    def train(self, iters: Optional[int] = None) -> Dict:
        tc, rc = self.tc, self.rc
        iters = tc.iters if iters is None else iters
        start_step = int(self.history["step"])
        start_time = time.time()

        # Device-side running sums: accumulated lazily every step (no host
        # sync), read back only at validation boundaries.
        run_loss = jnp.zeros(())
        run_psnr = jnp.zeros(())
        run_count = 0
        pending = None  # (device_metrics, step) for async readback
        trace_active = False  # an open jax.profiler trace (closed post-loop)

        self._log(
            f"Training: {len(self.train_ds):,} rays | batch {tc.batch_size} | "
            f"{iters:,} iters | near/far {rc.near:.2f}/{rc.far:.2f} | "
            f"samples {rc.N_samples}+{rc.N_importance} | "
            f"pallas={rc.use_pallas} dtype={rc.compute_dtype}"
        )

        if tc.precrop_iters > 0 and start_step < tc.precrop_iters:
            self.loader.set_precrop(tc.precrop_frac)
            self._log(
                f"🎯 precrop: central {tc.precrop_frac:.0%} crop for the "
                f"first {tc.precrop_iters:,} iters"
            )

        # Double-buffered input: the next host batch (a stacked (w, B, F)
        # window in scan mode) is device_put while the current step runs
        # (data/pipeline.py::prefetch_to_device).
        from nerfmlp_tpu.data.pipeline import prefetch_to_device

        # K-step scan dispatch: windows end exactly at every step where the
        # blocks below need host work, so event cadence is unchanged.
        scan_mode = self.scan_fn is not None and not tc.profile_dir
        pool_scan_mode = self.pool_scan is not None and not tc.profile_dir
        if (self.scan_fn or self.pool_scan) is not None and tc.profile_dir:
            self._log("(steps_per_dispatch disabled while profiling: the "
                      "trace wants per-step dispatch boundaries)")
        if scan_mode or pool_scan_mode:
            intervals = [tc.log_interval, tc.ckpt_interval,
                         tc.i_video, tc.i_testset, tc.i_img]
            if self.quick_val_ds is not None:
                intervals.append(tc.quick_val_interval)
            if self.val_ds is not None:
                intervals.append(tc.full_val_interval)
            if self.occ_grid is not None:
                intervals.append(rc.occ_update_every)

        def _window(s: int) -> int:
            if not (scan_mode or pool_scan_mode):
                return 1
            return dispatch_window(
                s, iters, tc.steps_per_dispatch, intervals,
                stop_steps=(tc.precrop_iters,),
            )

        def _stream():
            # The generator owns the precrop transition: batches are
            # prefetched AHEAD of execution, so flipping precrop from the
            # training loop would leave stale pre-generated batches in
            # flight (the old code rebuilt the stream and dropped them,
            # which made the sampled-ray sequence depend on prefetch depth
            # and dispatch granularity). Flipping exactly before the batch
            # for step precrop_iters+1 is deterministic for any buffering;
            # scan windows end at precrop_iters (stop_steps) so the flip
            # always lands on a window start.
            def host_batches():
                s = start_step + 1
                flip_at = tc.precrop_iters + 1 if tc.precrop_iters > 0 else None
                while True:
                    if flip_at is not None and s >= flip_at:
                        self.loader.set_precrop(1.0)
                        flip_at = None
                    if scan_mode:
                        w = _window(s)
                        yield np.stack(
                            [self.loader.next_batch() for _ in range(w)]
                        )
                        s += w
                    else:
                        yield self.loader.next_batch()
                        s += 1

            sharding = self._batch_sharding
            if scan_mode and self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # (w, B, F): the ray axis (dim 1) shards over the mesh.
                sharding = NamedSharding(self.mesh, P(None, "data"))
            return prefetch_to_device(host_batches(), sharding=sharding)

        # With an active device pool the host stream is only needed for
        # the precrop phase (per-image central-crop sampling stays on
        # host); past it — or when resuming past it — every batch is a
        # device-side dynamic_index and no host batches are generated.
        if self.pool is not None and not (
            tc.precrop_iters > 0 and start_step < tc.precrop_iters
        ):
            stream = None
            self._log("📍 device ray pool: "
                      f"{len(self.pool):,} rays resident on device, "
                      f"{self.pool.steps_per_epoch:,} steps/epoch, "
                      "zero host->device bytes per step")
        else:
            stream = _stream()

        t_prev = time.time()
        step = start_step
        while step < iters:
            s = step + 1  # first step this dispatch executes
            if tc.precrop_iters > 0 and s == tc.precrop_iters + 1:
                self._log(f"🎯 precrop off at iter {s:,}")
            if tc.profile_dir:
                # Best-effort: remote-device plugins may not support traces.
                # Trigger on steps RELATIVE to this call (a resumed run at
                # start_step >= 10 would otherwise silently never profile);
                # an open trace is closed after the loop if the run is
                # shorter than the trace window.
                try:
                    if s - start_step == 10:
                        jax.profiler.start_trace(tc.profile_dir)
                        trace_active = True
                    elif s - start_step == 30 and trace_active:
                        jax.profiler.stop_trace()
                        trace_active = False
                        self._log(
                            f"🧪 profiler trace (steps 10-30) -> {tc.profile_dir}"
                        )
                except Exception as e:
                    self._log(f"(profiler unavailable: {e})")
                    # Stop further in-loop attempts, but do NOT clear
                    # trace_active on a stop_trace failure: the post-loop
                    # close must retry or the trace keeps recording for
                    # the rest of the run.
                    tc = dataclasses.replace(tc, profile_dir="")
            pool_active = self.pool is not None and s > tc.precrop_iters
            batch = None if pool_active else next(stream)
            occ_args = ()
            if self.occ_grid is not None:
                if (s - 1) % self.rc.occ_update_every == 0:
                    # decay=1.0 during warmup: cells only accumulate, so
                    # the whole box stays sampled until the model has had
                    # a chance to place density (occ_warmup_steps doc in
                    # config.py for what this does and does NOT fix).
                    self.occ_grid = self._occ_update(
                        self.occ_grid, self.state.params,
                        jax.random.fold_in(jax.random.PRNGKey(17), s),
                        1.0 if s <= self.rc.occ_warmup_steps else 0.95,
                    )
                occ_args = (self.occ_grid,)
            if pool_active:
                stack = self.pool.ensure_epoch(self.pool.epoch_of(s - 1))
                if pool_scan_mode:
                    # Pooled K-step scan: window additionally capped at
                    # the epoch boundary (the stack reshuffles there; a
                    # window reads ONE stack).
                    spe = self.pool.steps_per_epoch
                    w = min(_window(s), spe - ((s - 1) % spe))
                    self.state, mstack = self.pool_scan(w)(
                        self.state, stack, *occ_args
                    )
                    metrics = jax.tree_util.tree_map(lambda a: a[-1], mstack)
                    run_loss = run_loss + jnp.sum(mstack["loss"])
                    run_psnr = run_psnr + jnp.sum(mstack["psnr"])
                else:
                    w = 1
                    self.state, metrics = self.pool_step_fn(
                        self.state, stack, *occ_args
                    )
                    run_loss = run_loss + metrics["loss"]
                    run_psnr = run_psnr + metrics["psnr"]
            elif scan_mode:
                w = int(batch.shape[0])
                self.state, mstack = self.scan_fn(self.state, batch, *occ_args)
                # Last step's metrics for logging; exact per-step sums for
                # the running averages (device-side, no host sync).
                metrics = jax.tree_util.tree_map(lambda a: a[-1], mstack)
                run_loss = run_loss + jnp.sum(mstack["loss"])
                run_psnr = run_psnr + jnp.sum(mstack["psnr"])
            else:
                w = 1
                self.state, metrics = self.step_fn(self.state, batch, *occ_args)
                run_loss = run_loss + metrics["loss"]
                run_psnr = run_psnr + metrics["psnr"]
            step = s + w - 1
            pending = (metrics, step)
            # Update before the validation/event blocks below so any JSON
            # snapshot they write records THIS step, not step-1.
            self.history["step"] = step
            run_count += w

            now = time.time()
            it = self.history["iteration_times"]
            it.extend([(now - t_prev) / w] * w)
            t_prev = now
            if len(it) > self._ITER_TIMES_CAP:
                drop = len(it) // 2
                self.history["iteration_times_dropped"] += drop
                self.history["iteration_times_dropped_sum"] += float(
                    np.sum(it[:drop])
                )
                del it[:drop]

            if tc.log_interval and step % tc.log_interval == 0:
                m = jax.device_get(pending[0])
                med_t = float(np.median(self.history["iteration_times"][-200:]))
                if self._tb is not None:
                    self._tb.add_scalar("train/loss", float(m["loss"]), step)
                    self._tb.add_scalar("train/psnr", float(m["psnr"]), step)
                    self._tb.add_scalar("train/grad_norm", float(m["grad_norm"]), step)
                    self._tb.add_scalar("train/lr", self._lr_at(step), step)
                self._log(
                    f"{datetime.now().strftime('%Y-%m-%d %H:%M:%S')} | "
                    f"Iter {step:,} | Loss: {float(m['loss']):.6f} | "
                    f"PSNR: {float(m['psnr']):.2f} | LR: {self._lr_at(step):.2e} | "
                    f"Grad: {float(m['grad_norm']):.4f} | "
                    f"Mem: {get_memory_usage_gb():.1f}GB | "
                    f"Time: {med_t * 1e3:.1f}ms (median)"
                )

            if (
                tc.quick_val_interval
                and step % tc.quick_val_interval == 0
                and self.quick_val_ds is not None
            ):  # interval 0 = never, like full_val_interval (r5)
                self._quick_val_block(
                    step, iters, start_time,
                    float(run_loss), float(run_psnr), run_count,
                )
                run_loss = jnp.zeros(())
                run_psnr = jnp.zeros(())
                run_count = 0
                t_prev = time.time()  # don't count validation in iter times

            if (
                tc.full_val_interval
                and step % tc.full_val_interval == 0
                and self.val_ds is not None
                and step < iters
            ):
                fv = self.full_validate()
                # Guarded block, NOT `continue`: an empty val split (fv is
                # None) must never skip the checkpoint/render events below
                # for a coinciding step (with the defaults full_val_interval
                # == ckpt_interval multiples coincide constantly).
                if fv is not None:
                    self.history["full_val_losses"].append(fv["loss"])
                    self.history["full_val_psnrs"].append(fv["psnr"])
                    self.history["full_val_ssims"].append(fv["ssim"])
                    self.history["full_val_steps"].append(step)
                    self._log(
                        f"📋 FULL VAL @ {step:,}: loss {fv['loss']:.6f} | "
                        f"PSNR {fv['psnr']:.2f} | SSIM {fv['ssim']:.4f}"
                    )
                    self._save_val_image(step)
                t_prev = time.time()

            if tc.ckpt_interval and step % tc.ckpt_interval == 0:
                ckpt.save_checkpoint(
                    os.path.join(self.save_dir, f"model_{step}.ckpt"),
                    self.state.params,
                )

            # In-training render events (run_nerf.py:845-872). Skipped on
            # the final step: the oracle's `and i > 0` guard plus the fact
            # that end-of-run artifacts come from the final checkpoint.
            if (
                tc.i_video
                and step % tc.i_video == 0
                and step < iters
                and self.render_poses is not None
            ):
                self._video_event(step)
                t_prev = time.time()
            if (
                tc.i_testset
                and step % tc.i_testset == 0
                and step < iters
                and self.test_ds is not None
            ):
                self._testset_event(step)
                t_prev = time.time()
            if tc.i_mesh and step % tc.i_mesh == 0 and step < iters:
                self._mesh_event(step)
                t_prev = time.time()
            # Holdout render dump (oracle --i_img, run_nerf.py:879-922).
            if tc.i_img and step % tc.i_img == 0 and step < iters:
                self._save_val_image(step)
                t_prev = time.time()

        if trace_active:
            # Run ended inside the trace window — close it so the profile
            # is written instead of left open/corrupt.
            try:
                jax.profiler.stop_trace()
                # self.tc keeps the original path (the loop-local tc is
                # blanked after an in-loop stop failure).
                self._log(
                    f"🧪 profiler trace -> {self.tc.profile_dir}"
                )
            except Exception as e:
                self._log(f"(profiler stop failed: {e})")

        # Final saves + full validation (train.py:563-585).
        ckpt.save_checkpoint(
            os.path.join(self.save_dir, "model_final.ckpt"), self.state.params
        )
        if tc.i_img and iters > start_step:
            # Final-model holdout frame: the in-loop i_img dumps stop one
            # interval early (step < iters guard), but the time-lapse the
            # frames feed (scripts/make_timelapse.py; reference
            # VIDEOS.md:24-31) must END on the converged model.
            self._save_val_image(iters)
        final = {}
        if self.val_ds is not None:
            final = self.full_validate() or {}
            self._log(
                f"🏁 FINAL full validation: loss {final.get('loss', float('nan')):.6f} | "
                f"PSNR {final.get('psnr', float('nan')):.2f} | "
                f"SSIM {final.get('ssim', float('nan')):.4f}"
            )
            # Post-full-val companion checkpoint (reference train.py:576-585
            # saves model+optimizer+final metrics as model_full_val_final.pth):
            # the full TrainState, with the final-val numbers in the history
            # sidecar it shares the basename with.
            path = os.path.join(self.save_dir, "model_full_val_final.ckpt")
            ckpt.save_checkpoint(path, jax.device_get(self.state))
            ckpt.save_metrics_json(
                path.rsplit(".", 1)[0] + ".history.json",
                dict(
                    self.history,
                    full_val_loss=final.get("loss"),
                    full_val_psnr=final.get("psnr"),
                    full_val_ssim=final.get("ssim"),
                ),
            )
        self._save_resumable()
        comprehensive = dict(
            self.history, final_val=final, config=self._config_dict(),
            # Reference train.py:721 records wall-clock for the whole run.
            total_training_time=time.time() - start_time,
        )
        ckpt.save_metrics_json(
            os.path.join(self.save_dir, "comprehensive_metrics.json"), comprehensive
        )
        if self._tb is not None:
            # The installed EventFileWriter has no atexit hook and its
            # writer thread is a daemon (flush_secs=120): without an
            # explicit flush, short runs lose most of their TB events.
            self._tb.flush()
        return comprehensive

    def _quick_val_block(self, step, iters, start_time, run_loss, run_psnr, run_count):
        h = self.history
        avg_loss = run_loss / max(run_count, 1)
        avg_psnr = run_psnr / max(run_count, 1)
        h["train_losses"].append(avg_loss)
        h["train_psnrs"].append(avg_psnr)

        qm = self.quick_validate()
        if qm is None:
            self._log(f"Iter {step:,} | quick val skipped (no val images)")
            self._save_resumable()
            return
        h["quick_val_losses"].append(qm["loss"])
        h["quick_val_psnrs"].append(qm["psnr"])
        h["quick_val_ssims"].append(qm["ssim"])
        h["val_steps"].append(step)
        if self._tb is not None:
            self._tb.add_scalar("val/loss", qm["loss"], step)
            self._tb.add_scalar("val/psnr", qm["psnr"], step)
            self._tb.add_scalar("val/ssim", qm["ssim"], step)
            self._tb_histograms_and_image(step)

        conv = ""
        if len(h["quick_val_losses"]) > 5:
            prev_l = h["quick_val_losses"][-6]
            prev_p = h["quick_val_psnrs"][-6]
            impr = 100 * (prev_l - qm["loss"]) / (abs(prev_l) + 1e-8)
            conv = f" | ΔLoss(5): {impr:+.2f}% | ΔPSNR(5): {qm['psnr'] - prev_p:+.2f}dB"
        self._log(
            f"{datetime.now().strftime('%Y-%m-%d %H:%M:%S')} | Iter {step:,} | "
            f"Avg Train Loss: {avg_loss:.6f} | Avg Train PSNR: {avg_psnr:.2f} | "
            f"Quick Val Loss: {qm['loss']:.6f} | Quick Val PSNR: {qm['psnr']:.2f} | "
            f"Quick Val SSIM: {qm['ssim']:.4f}{conv}"
        )
        etc = calculate_etc(step, iters, start_time, h["iteration_times"])
        if etc:
            self._log(
                f"📊 Progress: {etc['progress_percent']:.1f}% | "
                f"ETA: {format_time_duration(etc['remaining_time'])} "
                f"({etc['completion_time'].strftime('%Y-%m-%d %H:%M:%S')}) | "
                f"Avg: {etc['median_iter_time'] * 1e3:.1f}ms/iter (median)"
                + (" ⚠️ ETA may be unstable" if etc["eta_unstable"] else "")
            )

        if qm["psnr"] > h["best_val_psnr"]:
            h["best_val_psnr"] = qm["psnr"]
            ckpt.save_checkpoint(
                os.path.join(self.save_dir, "model_best.ckpt"), self.state.params
            )
            self._log(
                f"🏆 Best model saved at iter {step:,} "
                f"with quick val PSNR {qm['psnr']:.2f}"
            )

        self._save_resumable()
        snapshot = dict(self.history, config=self._config_dict())
        ckpt.save_metrics_json(
            os.path.join(self.save_dir, "metrics_latest.json"), snapshot
        )
        # Layered per-step snapshot (reference train.py:480-495 writes
        # model_{step}_latest.pth + metrics_{step}_latest.json alongside
        # the rolling latest files, so corruption of one never loses the
        # run; README.md:118 documents resuming from a specific recent
        # step). Pruned to the most recent few to bound disk growth — the
        # divergence from the reference's keep-everything is deliberate
        # (a 200k run would write 200 weight copies).
        ckpt.save_metrics_json(
            os.path.join(self.save_dir, f"metrics_{step}_latest.json"), snapshot
        )
        ckpt.save_checkpoint(
            os.path.join(self.save_dir, f"model_{step}_latest.ckpt"),
            self.state.params,
        )
        self._prune_step_snapshots(keep=5)
        self._log("-" * 80)

    def _prune_step_snapshots(self, keep: int) -> None:
        """Keep only the newest ``keep`` per-step snapshot files
        (metrics_{step}_latest.json AND model_{step}_latest.ckpt)."""
        import re

        for pattern in (
            r"metrics_(\d+)_latest\.json", r"model_(\d+)_latest\.ckpt"
        ):
            snaps = []
            for name in os.listdir(self.save_dir):
                m = re.fullmatch(pattern, name)
                if m:
                    snaps.append((int(m.group(1)), name))
            for _, name in sorted(snaps)[:-keep]:
                try:
                    os.remove(os.path.join(self.save_dir, name))
                except OSError:
                    pass

    def _tb_histograms_and_image(self, step: int) -> None:
        """Param histograms + one holdout render to TensorBoard (the
        oracle's i_img logging, example/run_nerf.py:879-922)."""
        try:
            import jax.tree_util as jtu

            for path, leaf in jtu.tree_flatten_with_path(self.state.params)[0]:
                name = "/".join(
                    getattr(k, "key", getattr(k, "idx", "?")).__str__()
                    for k in path
                )
                self._tb.add_histogram(f"params/{name}", np.asarray(leaf), step)
            if self.quick_val_ds is not None:
                ds = self.quick_val_ds
                cached = getattr(self, "_last_val_render", None)
                maps = None
                if cached is not None and cached[0] is ds:
                    # The quick-val that triggered this logging just
                    # rendered view 0 of the same dataset — reuse it
                    # instead of paying a second full render.
                    _, img, gt = cached
                    maps = getattr(self, "_last_val_maps", None)
                else:
                    extra = self._tb_extra_maps()
                    maps, gt = self._render_view_maps(
                        ds, 0, ("rgb_map",) + extra
                    )
                    img = maps["rgb_map"]
                self._tb.add_image(
                    "val/render", np.clip(img, 0, 1), step, dataformats="HWC"
                )
                self._tb.add_image("val/gt", gt, step, dataformats="HWC")
                if maps and "rgb_map_coarse" in maps:
                    # The oracle's coarse-pass extras (run_nerf.py:905-921):
                    # rgb0/disp0 holdout images + the fine-sample z_std
                    # histogram (sampling-concentration diagnostic).
                    self._tb.add_image(
                        "val/rgb0", np.clip(maps["rgb_map_coarse"], 0, 1),
                        step, dataformats="HWC",
                    )
                    disp0 = maps["disp_map_coarse"]
                    disp0 = disp0 / max(float(np.max(disp0)), 1e-8)
                    self._tb.add_image(
                        "val/disp0", disp0[..., None], step, dataformats="HWC"
                    )
                    self._tb.add_histogram("val/z_std", maps["z_std"], step)
        except Exception as e:
            self._log(f"(tensorboard histogram/image logging failed: {e})")

    def _config_dict(self) -> Dict:
        # The flat keys mirror the reference's config block
        # (train.py:723-732) so its consumers (e.g. the status tool's
        # config display) find their fields; the nested dataclass dumps
        # carry the full framework config.
        q = self.quick_val_ds
        v = self.val_ds
        return {
            "quick_val_res": (
                [int(q.W), int(q.H)]
                if q is not None and hasattr(q, "W") else None
            ),
            "full_val_res": (
                [int(v.W), int(v.H)]
                if v is not None and hasattr(v, "W") else None
            ),
            "quick_val_subset": self.tc.quick_val_subset,
            "quick_val_interval": self.tc.quick_val_interval,
            "full_val_interval": self.tc.full_val_interval,
            "batch_size": self.tc.batch_size,
            "learning_rate": self.tc.lr,
            "total_iterations": self.tc.iters,
            "render": dataclasses.asdict(self.rc),
            "train": dataclasses.asdict(self.tc),
        }
