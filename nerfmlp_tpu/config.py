"""Config dataclasses shared across the framework.

The reference scatters configuration over constructor kwargs
(nerfmlp/model.py:29, nerfmlp/renderer.py:6-9) and per-script argparse
(scripts/train.py:180-192). Here every knob lives in frozen (hashable)
dataclasses so they can be closed over by ``jax.jit`` without retrace
surprises; CLI layers construct them from reference-compatible flags.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the NeRF MLP (reference: nerfmlp/model.py:28-55).

    Defaults reproduce the reference: depth 8, width 256, skip-concat of the
    encoded input into layer index 5, view-dependent head with a 256-wide
    bottleneck and a single 128-wide hidden view layer.
    """

    depth: int = 8
    width: int = 256
    input_ch: int = 63          # 3 * (1 + 2 * pos_enc_L) with L=10
    input_ch_views: int = 27    # 3 * (1 + 2 * dir_enc_L) with L=4
    skips: Tuple[int, ...] = (5,)
    use_viewdirs: bool = True
    output_ch: int = 4          # only used when use_viewdirs=False
    bottleneck_ch: int = 256
    view_width: int = 128       # W // 2 in the reference

    @property
    def num_tf_arrays(self) -> int:
        """Length of the official .npy weight list this model maps to."""
        return 2 * self.depth + (8 if self.use_viewdirs else 2)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Volume-rendering configuration (reference: nerfmlp/renderer.py:6-9).

    ``perturb``/``raw_noise_std`` are train-time stochasticity; inference
    paths use ``dataclasses.replace(cfg, perturb=False, raw_noise_std=0.0)``
    (reference: scripts/render_example.py:227-236).
    """

    pos_enc_L: int = 10
    dir_enc_L: int = 4
    # Network architecture (oracle --netdepth/--netwidth and the *_fine
    # variants, example/run_nerf.py:467-474). 0 for the fine dims means
    # "same as coarse" (the oracle's defaults are equal). The fused Pallas
    # kernel covers the canonical 8x256 shape; other shapes take XLA.
    depth: int = 8
    width: int = 256
    depth_fine: int = 0
    width_fine: int = 0
    N_samples: int = 64
    N_importance: int = 128
    near: float = 2.0
    far: float = 6.0
    white_bkgd: bool = True
    perturb: bool = True
    raw_noise_std: float = 0.0
    coord_scale: float = 1.0
    lindisp: bool = False        # inverse-depth sampling (example/run_nerf.py:186-188)
    ndc: bool = False            # NDC ray reparameterization for LLFF scenes
    use_viewdirs: bool = True
    separate_fine: bool = False  # reference shares one net for coarse+fine
                                 # (renderer.py:76,103); official NeRF uses a
                                 # separate fine net (example/run_nerf.py:397-403)
    use_pallas: bool = False     # fused Pallas TPU kernel for the MLP hot path
    compute_dtype: str = "float32"  # "bfloat16" for MXU-friendly training
    fp32_precision: str = "highest"  # fp32 matmul strategy on TPU:
                                 # "highest" = 6-pass bf16 (golden parity),
                                 # "high" = 3-pass bf16x3 (~2x faster,
                                 # fp32-grade to ~1e-6 relative). Ignored in
                                 # bfloat16 mode.
    remat: bool = False          # jax.checkpoint the MLP query (XLA path):
                                 # trades recompute FLOPs for activation HBM,
                                 # enabling much larger ray batches
    aabb: Optional[Tuple[float, float, float, float, float, float]] = None
                                 # (xmin,ymin,zmin,xmax,ymax,zmax): tighten
                                 # per-ray near/far to the scene box (an
                                 # improvement over the reference's single
                                 # global [near, far])
    # Occupancy-grid sampling (ops/occupancy.py): replaces the coarse MLP
    # pass with a cached density-grid lookup. Requires ``aabb``.
    use_occupancy: bool = False
    occ_dense_samples: int = 128  # grid-scored depths per ray (no MLP)
    occ_grid_size: int = 64       # G^3 density grid resolution
    occ_update_every: int = 64    # training steps between grid refreshes
    # (r4: 16 -> 64 measured quality-neutral at both dtypes/densities —
    # the EMA'd grid changes far slower than the weights — and saves the
    # amortized 262k-point refresh: +5-6% train throughput, docs/RESULTS.md)
    occ_threshold: float = 1e-2   # density -> occupied cutoff
    occ_one_shot: bool = False    # r4 behavior: draw ALL N_samples +
    # N_importance depths from the grid prior in one pass. The r5 default
    # is HIERARCHICAL occupancy: N_samples grid-guided probes -> composite
    # -> importance-resample N_importance from the probes' actual
    # compositing weights -> merge (same total MLP evals — the merge
    # queries only the new depths). Content-dependent, measured at 20k
    # steps (docs/RESULTS.md hard-scene certification): hierarchical
    # +1.97 dB on the smooth scene (41.09 vs 39.12; golden 41.34),
    # one-shot +1.44 on the thin-rod hard scene (37.04 — above golden's
    # 36.89 — vs 35.60; a tight grid is itself the best prior there).
    # Each stays within ~1.4 dB of golden on its favorable content at
    # 3-5x the speed. Pass --occ_one_shot for the r4 protocol.
    occ_warmup_steps: int = 1024  # refreshes before this step use decay=1.0
    # (no pruning): the grid's init density otherwise decays below
    # threshold in ~14 refreshes (~900 steps at every=64) — before the
    # model has placed density anywhere — so slow-to-emerge content risks
    # being pruned and then never sampled (the NerfAcc-style guard).
    # Measured neutral on every r5 A/B (the apparent hard-scene collapse
    # it was built against turned out to be a scene bug — RESULTS.md
    # "diagnostic arc"); kept as cheap insurance for late-emerging
    # content.

    @property
    def input_ch(self) -> int:
        return 3 * (1 + 2 * self.pos_enc_L)

    @property
    def input_ch_views(self) -> int:
        return 3 * (1 + 2 * self.dir_enc_L)

    def model_config(self, fine: bool = False) -> ModelConfig:
        """Architecture of the coarse net, or (``fine=True``) the fine net.

        Bottleneck/view widths derive from the trunk width like the
        reference (view layer = W // 2, nerfmlp/model.py:47-53). The skip
        index is FIXED at after-layer-4 for every --netdepth, exactly like
        the oracle (skips=[4] hardcoded regardless of depth,
        run_nerf.py:389; after-layer-4 == our before-layer-5 convention,
        example/run_nerf_helpers.py:92-104), so custom-depth checkpoints
        compute the same function in both frameworks. Depths <= 5 get no
        skip: the TF loop never reaches i=4 for D<5, and D=5's trailing
        concat (after the LAST layer, widening the head inputs) is a TF
        artifact our before-layer convention cannot express.
        """
        depth = (self.depth_fine or self.depth) if fine else self.depth
        width = (self.width_fine or self.width) if fine else self.width
        if depth == 5:
            # Loud, not just documented: --netdepth 5 is the one depth
            # whose function diverges from the TF oracle (its skips=[4]
            # concat lands AFTER the last trunk layer, widening the head
            # inputs — inexpressible in the before-layer convention).
            import warnings

            warnings.warn(
                "netdepth=5 drops the oracle's trailing skip concat: this "
                "model computes a (slightly) different function than the "
                "TF reference at depth 5; checkpoints do not interchange"
            )
        return ModelConfig(
            depth=depth,
            width=width,
            skips=(5,) if depth > 5 else (),
            input_ch=self.input_ch,
            input_ch_views=self.input_ch_views,
            use_viewdirs=self.use_viewdirs,
            bottleneck_ch=width,
            view_width=max(1, width // 2),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization & loop configuration (reference: scripts/train.py:180-192).

    LR schedule follows the official exponential decay (0.1 every 250k
    steps, example/run_nerf.py:705-709) rather than the reference's StepLR
    which never fires within a default run (train.py:185,260 — noted flaw).
    """

    batch_size: int = 1024
    iters: int = 200_000
    lr: float = 5e-4
    lr_decay_rate: float = 0.1
    lr_decay_steps: int = 250_000
    coarse_loss: bool = False    # official adds img_loss0 (run_nerf.py:820-824);
                                 # reference trains on the fine map only
                                 # (train.py:374-376). Default = reference.
    seed: int = 0
    quick_val_interval: int = 1000
    full_val_interval: int = 50_000
    quick_val_subset: int = 10   # quick-val resolution is a property of the
                                 # quick_val dataset the CLI constructs
                                 # (--quick_val_res), not of this config
    log_interval: int = 100
    ckpt_interval: int = 10_000
    grad_clip: float = 0.0       # 0 = off
    # Oracle-superset training options (example/run_nerf.py):
    precrop_iters: int = 0       # central-crop sampling for the first N iters
    precrop_frac: float = 0.5    # crop fraction (run_nerf.py:776-792)
    no_batching: bool = False    # sample each batch from ONE random image
    profile_dir: str = ""        # jax.profiler trace of steps 10-30
    # In-training render events (run_nerf.py:845-872); 0 = off.
    i_video: int = 0             # spiral-path rgb+disp video every N steps
    i_testset: int = 0           # test-pose sweep w/ per-frame PSNR every N
    i_img: int = 0               # holdout render PNG every N steps (oracle
                                 # --i_img TB image logging, run_nerf.py:879)
    render_factor: int = 0       # downscale for the render events
                                 # (oracle --render_factor, run_nerf.py:529-531)
    i_mesh: int = 0              # density-isosurface .ply snapshot every N
                                 # steps (framework superset event; needs
                                 # RenderConfig.aabb for the grid bounds)
    mesh_resolution: int = 128   # grid nodes/axis for --i_mesh snapshots
    mesh_threshold: float = 25.0  # sigma iso level for --i_mesh snapshots
    chunk: int = 4096            # ray tile for validation/eval renders
                                 # (oracle --chunk, run_nerf.py:488-489)
    steps_per_dispatch: int = 1  # batch K train steps into ONE jitted
                                 # lax.scan dispatch. Per-step math, RNG
                                 # folding, and event cadence are identical
                                 # (dispatch windows end exactly at every
                                 # step needing host work); what changes is
                                 # host<->device round-trips: K x fewer.
                                 # Steady-state throughput is unchanged
                                 # (dispatch is already async-hidden), so
                                 # this only helps hosts where a FIXED
                                 # per-dispatch cost dominates the device
                                 # step time. Measured on the axon tunnel
                                 # (5k-step flagship A/B): K=10 neutral,
                                 # K=100 WORSE (+34% wall, +49% host-RAM
                                 # leak — the (K, B, F) window upload
                                 # serializes and bigger buffers leak
                                 # more); the tunnel's drift/leak are
                                 # byte-proportional, so batching cannot
                                 # mitigate them. Keep small K dividing
                                 # the event intervals (10 fits the
                                 # defaults) or windows shrink at
                                 # boundaries and each distinct size
                                 # costs one compile.
                                 # (r4) With device_pool (default) the
                                 # scan indexes the RESIDENT stack
                                 # (make_pool_scan): zero upload, and the
                                 # K=100 hazard above does not apply.
                                 # Measured +7% at K=16 on the turbo
                                 # recipe (the ~2 ms per-dispatch host
                                 # floor binds once the device step ducks
                                 # under ~4 ms); neutral on the 64+128
                                 # flagship (device-bound).
    device_pool: bool = True     # keep the ray pool resident in device
                                 # memory and let the train step
                                 # dynamic_index its batch from a per-epoch
                                 # on-device shuffle: ZERO host->device
                                 # bytes per step (data/device_pool.py).
                                 # Same global-batching semantics as the
                                 # host loader; host streaming still
                                 # covers the precrop phase, --no_batching,
                                 # and pools smaller than one batch.
                                 # DEFAULT ON (r4): measured A/B cut the
                                 # tunnel's byte-proportional host leak
                                 # 85% (43.4 -> 6.5 KB/step) at neutral
                                 # wall-clock (docs/RESULTS.md); the
                                 # loop falls back to host streaming
                                 # automatically when ineligible (TP,
                                 # --no_batching, tiny pools).
