#!/usr/bin/env python
"""Full training CLI — flag-compatible with the reference scripts/train.py
(:180-192), plus TPU-native extensions (mesh data-parallelism, bf16
compute, the fused Pallas kernel, separate fine net, coarse loss).

Example:
  python scripts/train.py --datadir /data/lego --img_wh 400 400 \\
      --batch_size 1024 --iters 200000 --save_dir outputs/lego
"""

import argparse
import os
import sys

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _expand_config_files(argv, bool_flags=frozenset(), negations=None):
    """``--config FILE`` support (the oracle uses configargparse,
    example/run_nerf.py:461-465): FILE holds ``key = value`` lines that are
    expanded into flags, with explicit CLI flags taking precedence.

    ``bool_flags``: names of store_true/store_false flags — for those,
    numeric "1"/"0" mean present/absent (configargparse convention); for
    value flags "1"/"0" stay values (``testskip = 1``).

    ``negations``: dest -> opt-out flag (e.g. ``use_pallas: --no_pallas``)
    so a falsy value for a default-True flag emits the opt-out instead of
    being silently dropped (``use_pallas = False`` must disable pallas)."""
    negations = negations or {}
    argv = list(sys.argv[1:] if argv is None else argv)
    out = []
    i = 0
    while i < len(argv):
        if argv[i] == "--config":
            if i + 1 >= len(argv):
                raise SystemExit("--config requires a file path argument")
            path = argv[i + 1]
            i += 2
            with open(path) as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if not line:
                        continue
                    key, _, val = line.partition("=")
                    key, val = key.strip(), val.strip()
                    flag = [f"--{key}"]
                    # True/False literals are only a presence/absence
                    # encoding for BOOLEAN flags; for value-typed flags
                    # the text passes through verbatim (previously
                    # `somefloat = false` was silently DROPPED and
                    # `someflag = yes` emitted a bare value-less flag).
                    is_bool = key in bool_flags or key in negations
                    if is_bool and val.lower() in ("true", "yes", "1"):
                        pass  # store_true flag
                    elif is_bool and val.lower() in ("false", "no", "0"):
                        if key in negations:
                            flag = [negations[key]]
                            out = flag + out
                        continue
                    else:
                        flag += val.split()
                    out = flag + out  # prepend: CLI flags override
        else:
            out.append(argv[i])
            i += 1
    return out


def _bool_flag_names(parser):
    """Names of store_true/store_false options (no-argument actions)."""
    return frozenset(
        opt.lstrip("-")
        for a in parser._actions
        if a.nargs == 0
        for opt in a.option_strings
    )


def _negation_flags(parser):
    """dest -> opt-out option for store_false actions (``use_pallas`` ->
    ``--no_pallas``), so config files can turn default-True flags off."""
    return {
        a.dest: a.option_strings[0]
        for a in parser._actions
        if a.nargs == 0 and a.const is False and a.option_strings
    }


def parse_args(argv=None):
    p = build_parser()
    return p.parse_args(
        _expand_config_files(argv, _bool_flag_names(p), _negation_flags(p))
    )


_DEFAULT_SAVE_DIR = "outputs/checkpoints"


def build_parser():
    p = argparse.ArgumentParser(description="Train NeRF (TPU-native)")
    # Reference flags (train.py:180-192).
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--img_wh", type=int, nargs=2, default=None,
                   help="training resolution (default: 1024x1024 blender "
                        "/ 512x512 deepvoxels like the references; for "
                        "llff, images_{factor}/'s native size when "
                        "--factor is set, else 504x378)")
    p.add_argument("--half_res", action="store_true",
                   help="train at half the images' native resolution "
                        "(oracle --half_res; overrides --img_wh)")
    p.add_argument("--batch_size", "--N_rand", type=int, default=1024,
                   help="rays per step (oracle --N_rand)")
    p.add_argument("--iters", type=int, default=200000)
    p.add_argument("--lr", "--lrate", type=float, default=5e-4)
    p.add_argument("--lrate_decay", type=int, default=250,
                   help="exponential lr decay horizon in 1000s of steps "
                        "(oracle --lrate_decay; decays x0.1 per horizon)")
    p.add_argument("--save_dir", type=str, default=_DEFAULT_SAVE_DIR)
    p.add_argument("--basedir", type=str, default="./logs",
                   help="experiment root (oracle --basedir; used with --expname)")
    p.add_argument("--expname", type=str, default=None,
                   help="experiment name; sets save_dir=<basedir>/<expname> "
                        "(oracle --expname)")
    p.add_argument("--quick_val_interval", type=int, default=1000)
    p.add_argument("--full_val_interval", type=int, default=10000)
    p.add_argument("--quick_val_res", type=int, nargs=2, default=[256, 256])
    p.add_argument("--quick_val_subset", type=int, default=10)
    p.add_argument("--resume", "--ft_path", type=str, default=None,
                   help="checkpoint to resume from (oracle --ft_path); by "
                        "default the newest checkpoint in --save_dir is "
                        "auto-discovered (oracle behavior, run_nerf.py:439-456)")
    p.add_argument("--no_resume", "--no_reload", action="store_true",
                   help="start fresh even if --save_dir has checkpoints "
                        "(oracle --no_reload)")
    # Network architecture (oracle --netdepth/--netwidth + _fine variants,
    # run_nerf.py:467-474). Non-default trunk shapes take the XLA path
    # (the fused Pallas kernel covers the canonical 8x256).
    p.add_argument("--netdepth", type=int, default=8)
    p.add_argument("--netwidth", type=int, default=256)
    p.add_argument("--netdepth_fine", type=int, default=0,
                   help="fine net trunk depth (0 = same as --netdepth)")
    p.add_argument("--netwidth_fine", type=int, default=0,
                   help="fine net trunk width (0 = same as --netwidth)")
    # Sampling / renderer (reference ctor kwargs + example/ superset flags).
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--near", type=float, default=None, help="override dynamic near")
    p.add_argument("--far", type=float, default=None, help="override dynamic far")
    p.add_argument("--lindisp", action="store_true")
    p.add_argument("--perturb", type=float, default=1.0,
                   help="0 = deterministic (mid-bin) depth sampling "
                        "(oracle --perturb, run_nerf.py:190-199)")
    p.add_argument("--no_white_bkgd", action="store_true")
    p.add_argument("--white_bkgd", action="store_true",
                   help="accepted for oracle config compatibility "
                        "(white background is already the blender default)")
    p.add_argument("--raw_noise_std", type=float, default=0.0)
    p.add_argument("--separate_fine", action="store_true",
                   help="official two-net scheme instead of the shared net")
    p.add_argument("--coarse_loss", action="store_true",
                   help="add the coarse rgb loss term (official behavior)")
    p.add_argument("--i_embed", type=int, default=0,
                   help="oracle embedding selector (run_nerf.py:516-517): "
                        "0 = positional encoding, -1 = identity (maps to "
                        "pos_enc_L/dir_enc_L = 0)")
    p.add_argument("--pos_enc_L", "--multires", type=int, default=10,
                   help="positional-encoding frequencies (oracle --multires); "
                        "0 = identity embedding (oracle --i_embed -1)")
    p.add_argument("--dir_enc_L", "--multires_views", type=int, default=4,
                   help="view-direction frequencies (oracle --multires_views)")
    p.add_argument("--no_viewdirs", dest="use_viewdirs", action="store_false",
                   default=True)
    p.add_argument("--use_viewdirs", dest="use_viewdirs", action="store_true",
                   default=argparse.SUPPRESS,
                   help="accepted for oracle config compatibility (default on)")
    p.add_argument("--testskip", type=int, default=1,
                   help="load every Nth val/test frame (oracle --testskip)")
    p.add_argument("--chunk", type=int, default=4096,
                   help="ray tile for validation/eval renders (oracle --chunk)")
    p.add_argument("--netchunk", type=int, default=0,
                   help="accepted for oracle config compatibility; network "
                        "queries are tiled inside the fused kernel/XLA")
    # TPU-native knobs.
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="batch K train steps into one jitted lax.scan "
                        "dispatch (identical math/cadence; K x fewer "
                        "host<->device RPCs). With the device pool (the "
                        "default) the window indexes the resident stack — "
                        "zero upload, measured +7%% on the occupancy turbo "
                        "recipe at K=16 where the per-dispatch host floor "
                        "binds; keep K dividing the logging/val intervals. "
                        "With --no_device_pool large K serializes the "
                        "stacked-window upload and COSTS wall-clock "
                        "(measured; docs/RESULTS.md)")
    p.add_argument("--device_pool", action="store_true", default=True,
                   help="keep the ray pool resident in device memory; the "
                        "train step reads its batch from a per-epoch "
                        "on-device shuffle — zero host->device bytes per "
                        "step (same global-batching semantics; precrop/"
                        "--no_batching phases still stream from host). "
                        "DEFAULT ON: measured 85%% cut of the tunnel's "
                        "per-step host-RAM leak at neutral wall-clock")
    p.add_argument("--no_device_pool", dest="device_pool",
                   action="store_false",
                   help="stream every batch from host instead (the "
                        "reference's per-step copy semantics, "
                        "scripts/train.py:369-371)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fp32_precision", type=str, default="highest",
                   choices=["highest", "high"],
                   help="fp32 matmul passes: highest=6 (golden parity), "
                        "high=3 (~2x faster, fp32-grade)")
    p.add_argument("--use_pallas", action="store_true", default=True)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="model-axis size of a (data, model) mesh: shards "
                        "the MLP's 256-wide layers Megatron column/row "
                        "via GSPMD (parallel/tensor_parallel.py)")
    p.add_argument("--seed", "--random_seed", type=int, default=0)
    p.add_argument("--dataset_type", type=str, default="blender",
                   choices=["blender", "llff", "deepvoxels"])
    p.add_argument("--shape", type=str, default="greek",
                   help="deepvoxels scene: armchair / cube / greek / vase "
                        "(oracle --shape, run_nerf.py:539-540)")
    # Oracle-superset options (example/run_nerf.py).
    p.add_argument("--precrop_iters", type=int, default=0,
                   help="central-crop ray sampling for the first N iters")
    p.add_argument("--precrop_frac", type=float, default=0.5)
    p.add_argument("--no_batching", action="store_true",
                   help="sample each batch from one random image")
    p.add_argument("--check_numerics", action="store_true",
                   help="jax_debug_nans (TF oracle: check_numerics)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of steps 10-30 here")
    from nerfmlp_tpu.utils.cache import add_compilation_cache_flag

    add_compilation_cache_flag(p)
    p.add_argument("--tensorboard", action="store_true",
                   help="log scalars/histograms/images to <save_dir>/tb")
    p.add_argument("--i_print", type=int, default=100,
                   help="console log interval (oracle --i_print)")
    p.add_argument("--i_weights", type=int, default=10000,
                   help="periodic model_{step}.ckpt interval (oracle --i_weights)")
    p.add_argument("--i_img", type=int, default=0,
                   help="holdout render PNG every N steps (oracle --i_img; "
                        "0 = only at full-val boundaries)")
    p.add_argument("--i_video", type=int, default=0,
                   help="render a spiral rgb+disp video every N steps "
                        "(oracle --i_video, run_nerf.py:845-863; 0 = off)")
    p.add_argument("--i_testset", type=int, default=0,
                   help="render the test set w/ per-frame PSNR every N steps "
                        "(oracle --i_testset, run_nerf.py:865-872; 0 = off)")
    p.add_argument("--i_mesh", type=int, default=0,
                   help="dump a density-isosurface .ply snapshot every N "
                        "steps (geometry timelapse; needs --aabb; 0 = off)")
    p.add_argument("--mesh_resolution", type=int, default=128,
                   help="grid nodes per axis for --i_mesh snapshots")
    p.add_argument("--mesh_threshold", type=float, default=25.0,
                   help="sigma iso level for --i_mesh snapshots")
    p.add_argument("--render_only", action="store_true",
                   help="skip training: load the checkpoint and render the "
                        "trajectory (or, with --render_test, the test set) "
                        "to save_dir/renderonly_* (oracle run_nerf.py:682-702)")
    p.add_argument("--render_test", action="store_true",
                   help="with --render_only: render the test split's poses "
                        "with per-frame PSNR instead of the spiral path")
    p.add_argument("--render_factor", type=int, default=0,
                   help="downscale factor for the in-training render events")
    p.add_argument("--video_frames", type=int, default=0,
                   help="frame count for --i_video trajectories "
                        "(0 = dataset default: 40 blender / 120 llff)")
    p.add_argument("--spherify", action="store_true",
                   help="LLFF 360-capture path (oracle --spherify)")
    p.add_argument("--factor", type=int, default=0,
                   help="LLFF: use the images_{factor}/ downsample dir "
                        "explicitly (oracle --factor; 0 = auto-pick)")
    p.add_argument("--llffhold", type=int, default=8,
                   help="LLFF: hold out every Nth image for val/test "
                        "(oracle --llffhold, run_nerf.py:600)")
    p.add_argument("--no_ndc", action="store_true",
                   help="LLFF: metric-space rays instead of NDC "
                        "(oracle --no_ndc; required for --spherify captures)")
    p.add_argument("--no_aspect_snap", action="store_true",
                   help="LLFF: honor a non-native-aspect --img_wh exactly "
                        "instead of snapping height to the capture's aspect "
                        "(vertical FOV then mismatches the resized GT)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize MLP activations (XLA path): bigger batches")
    p.add_argument("--aabb", type=float, nargs=6, default=None,
                   metavar=("XMIN", "YMIN", "ZMIN", "XMAX", "YMAX", "ZMAX"),
                   help="scene box: tighten per-ray near/far (sample efficiency)")
    p.add_argument("--use_occupancy", action="store_true",
                   help="occupancy-grid sampling: replaces the coarse MLP "
                        "pass with a cached density grid (requires --aabb)")
    p.add_argument("--occ_grid_size", type=int, default=64)
    p.add_argument("--occ_one_shot", action="store_true",
                   help="r4 occupancy protocol: every depth from the grid "
                        "prior in one pass (default r5: hierarchical — "
                        "grid probes + importance resampling, same MLP "
                        "cost; RenderConfig.occ_one_shot)")
    p.add_argument("--occ_update_every", type=int, default=64)
    p.add_argument("--occ_warmup_steps", type=int, default=1024,
                   help="grid refreshes before this step never prune "
                        "(decay=1.0): guards content the model has not "
                        "placed density on yet from being pruned and then "
                        "never sampled (NerfAcc-style). Insurance, not a "
                        "substitute for samples — thin content needs the "
                        "probe budget (see docs/RESULTS.md hard-scene "
                        "certification)")
    p.add_argument("--occ_dense_samples", type=int, default=128,
                   help="grid-scored depths per ray before the inverse-CDF "
                        "draw (no MLP cost; 64 is the bf16 'turbo' recipe — "
                        "quality-neutral in bf16, costs ~0.4 dB at "
                        "fp32-high, docs/RESULTS.md r4 tuning table)")
    return p


def main(argv=None):
    args = parse_args(argv)

    from nerfmlp_tpu.utils.cache import maybe_enable_from_args

    maybe_enable_from_args(args)
    if args.expname and args.save_dir == _DEFAULT_SAVE_DIR:
        # Oracle experiment layout: <basedir>/<expname> (run_nerf.py:659) —
        # but an EXPLICIT --save_dir wins over a config file's expname
        # (shipped configs set expname; "--config configs/lego.txt
        # --save_dir /tmp/out" must write to /tmp/out).
        args.save_dir = os.path.join(args.basedir, args.expname)
    if args.i_embed == -1:
        # Identity embedding for both the point and direction branches
        # (get_embedder returns tf.identity for i == -1,
        # run_nerf_helpers.py:59-62, applied to both embedders at
        # run_nerf.py:381-387).
        args.pos_enc_L = 0
        args.dir_enc_L = 0
    if args.img_wh is None:
        # Per-dataset-type resolution defaults. For llff with --factor the
        # ORACLE derives the training resolution from the factor (load_llff
        # returns the minified images at native size, run_nerf.py:548-551)
        # — probe images_{factor}/ instead of imposing a fixed size.
        if args.dataset_type == "llff" and args.factor:
            from PIL import Image

            from nerfmlp_tpu.data.llff import LLFFDataset

            img_dir = LLFFDataset._ensure_factor_dir(args.datadir, args.factor)
            first = sorted(
                f for f in os.listdir(img_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )[0]
            with Image.open(os.path.join(img_dir, first)) as im:
                args.img_wh = [im.width, im.height]
            print(f"--factor {args.factor}: native resolution "
                  f"{args.img_wh[0]}x{args.img_wh[1]}")
        elif args.dataset_type == "llff":
            args.img_wh = [504, 378]
        elif args.dataset_type == "deepvoxels":
            args.img_wh = [512, 512]
        else:
            args.img_wh = [1024, 1024]
    if args.half_res and args.dataset_type == "blender":
        # Train at half the native image resolution (the oracle's
        # load_blender half_res path); probe the first frame for its size.
        import json

        from PIL import Image

        with open(os.path.join(args.datadir, "transforms_train.json")) as f:
            frame0 = json.load(f)["frames"][0]
        name = frame0["file_path"].split("/")[-1]
        with Image.open(os.path.join(args.datadir, "train", name + ".png")) as im:
            args.img_wh = [max(1, im.width // 2), max(1, im.height // 2)]
        print(f"--half_res: training at {args.img_wh[0]}x{args.img_wh[1]}")
    elif args.half_res:
        # half_res is a blender-only oracle flag (run_nerf.py:546-547, used
        # only in the load_blender branch); llff downsampling is --factor.
        print("⚠️  --half_res is blender-only; use --factor for llff — ignored")

    if args.img_wh[0] >= 1024 or args.img_wh[1] >= 1024:
        print("⚠️  High resolution training: consider batch_size>=512, lr<=2e-4")

    import jax

    if args.check_numerics:
        jax.config.update("jax_debug_nans", True)

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.train.loop import Trainer

    from nerfmlp_tpu.utils.cli import dataset_class, dataset_kwargs

    DS = dataset_class(args.dataset_type)
    ds_kw = dataset_kwargs(args)
    if args.dataset_type == "llff":
        # Real forward-facing photos have no alpha: white-background
        # compositing is a blender-synthetic behavior (the oracle enables
        # white_bkgd only for blender data, run_nerf.py:623-628).
        args.no_white_bkgd = True
    dataset = DS(args.datadir, split=args.split, img_wh=tuple(args.img_wh),
                 white_bkgd=not args.no_white_bkgd, **ds_kw)
    val_ds = DS(args.datadir, split="val", img_wh=tuple(args.img_wh),
                white_bkgd=not args.no_white_bkgd, testskip=args.testskip,
                **ds_kw)
    quick_val_ds = DS(args.datadir, split="val", img_wh=tuple(args.quick_val_res),
                      white_bkgd=not args.no_white_bkgd, testskip=args.testskip,
                      **ds_kw)

    # In-training render events (oracle run_nerf.py:845-872): the spiral
    # trajectory for i_video, the held-out test split for i_testset.
    render_poses = None
    if args.i_video or (args.render_only and not args.render_test):
        rp_kw = {"n_frames": args.video_frames} if args.video_frames else {}
        render_poses = dataset.render_poses(**rp_kw)
    test_ds = None
    if args.i_testset or (args.render_only and args.render_test):
        try:
            test_ds = DS(args.datadir, split="test", img_wh=tuple(args.img_wh),
                         white_bkgd=not args.no_white_bkgd,
                         testskip=args.testskip, **ds_kw)
        except (FileNotFoundError, OSError) as e:
            print(f"⚠️  --i_testset: no test split ({e}); falling back to val")
            test_ds = val_ds

    # Snapshot the invocation for reproducibility (oracle writes args.txt,
    # example/run_nerf.py:659-668).
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "args.txt"), "w") as f:
        for k, v in sorted(vars(args).items()):
            f.write(f"{k} = {v}\n")

    near, far = dataset.dynamic_near_far()
    if args.near is not None:
        near = args.near
    if args.far is not None:
        far = args.far
    print(f"Dynamic near: {near}, far: {far}")

    if args.separate_fine and not args.coarse_loss:
        # With two nets the coarse one ONLY learns through its own loss
        # term (importance depths are stop-gradiented); without it the
        # coarse net stays at random init and sample placement collapses.
        # The official NeRF always adds img_loss0 (run_nerf.py:822-824).
        print("⚠️  --separate_fine requires the coarse loss term; enabling "
              "--coarse_loss")
        args.coarse_loss = True

    ndc = args.dataset_type == "llff" and getattr(dataset, "use_ndc", False)
    rc = RenderConfig(
        pos_enc_L=args.pos_enc_L, dir_enc_L=args.dir_enc_L,
        use_viewdirs=args.use_viewdirs,
        depth=args.netdepth, width=args.netwidth,
        depth_fine=args.netdepth_fine, width_fine=args.netwidth_fine,
        N_samples=args.N_samples, N_importance=args.N_importance,
        near=near, far=far, white_bkgd=not args.no_white_bkgd,
        perturb=args.perturb > 0, raw_noise_std=args.raw_noise_std,
        lindisp=args.lindisp, ndc=ndc, separate_fine=args.separate_fine,
        compute_dtype=args.compute_dtype, use_pallas=args.use_pallas,
        fp32_precision=args.fp32_precision, remat=args.remat,
        aabb=tuple(args.aabb) if args.aabb else None,
        use_occupancy=args.use_occupancy,
        occ_grid_size=args.occ_grid_size,
        occ_one_shot=args.occ_one_shot,
        occ_update_every=args.occ_update_every,
        occ_warmup_steps=args.occ_warmup_steps,
        occ_dense_samples=args.occ_dense_samples,
    )
    tc = TrainConfig(
        batch_size=args.batch_size, iters=args.iters, lr=args.lr,
        lr_decay_steps=args.lrate_decay * 1000,
        coarse_loss=args.coarse_loss, seed=args.seed,
        quick_val_interval=args.quick_val_interval,
        full_val_interval=args.full_val_interval,
        quick_val_subset=args.quick_val_subset,
        log_interval=args.i_print, ckpt_interval=args.i_weights,
        precrop_iters=args.precrop_iters, precrop_frac=args.precrop_frac,
        no_batching=args.no_batching, profile_dir=args.profile_dir,
        i_video=args.i_video, i_testset=args.i_testset, i_img=args.i_img,
        i_mesh=args.i_mesh, mesh_resolution=args.mesh_resolution,
        mesh_threshold=args.mesh_threshold,
        render_factor=args.render_factor, chunk=args.chunk,
        steps_per_dispatch=args.steps_per_dispatch,
        device_pool=args.device_pool,
    )

    mesh = None
    n_dev = args.n_devices or len(jax.devices())
    if args.tensor_parallel > 1:
        from nerfmlp_tpu.parallel.tensor_parallel import make_tp_mesh

        mesh = make_tp_mesh(n_devices=n_dev, model_parallel=args.tensor_parallel)
        print(f"Mesh: dp={n_dev // args.tensor_parallel} x "
              f"tp={args.tensor_parallel} over {n_dev} devices")
    elif n_dev > 1:
        from nerfmlp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=n_dev)
        print(f"Data-parallel mesh over {n_dev} devices")

    trainer = Trainer(
        rc, tc, dataset, val_ds, quick_val_ds,
        save_dir=args.save_dir, mesh=mesh,
        tensorboard_dir=os.path.join(args.save_dir, "tb") if args.tensorboard else None,
        render_poses=render_poses, test_ds=test_ds,
    )
    # Auto-resume: discover the newest checkpoint in save_dir unless the
    # user opted out or named one explicitly (oracle auto-reloads sorted
    # model_*.npy from its logdir, run_nerf.py:439-456) — a crashed run
    # restarted with the same command continues where it left off.
    resume_path = args.resume
    if resume_path is None and not args.no_resume:
        from nerfmlp_tpu.train.checkpoint import latest_checkpoint

        resume_path = latest_checkpoint(args.save_dir)
        if resume_path:
            print(f"Auto-discovered checkpoint: {resume_path} "
                  f"(use --no_resume to start fresh)")
    if resume_path:
        trainer.resume(resume_path)

    if args.render_only:
        # Skip training: render the trajectory (or test set) from the
        # loaded checkpoint and exit (oracle run_nerf.py:682-702, which
        # writes into <save_dir>/renderonly_{path|test}_{start:06d}).
        from nerfmlp_tpu.render_path import render_path, save_path_videos

        if resume_path is None:
            print("⚠️  --render_only with no checkpoint found in "
                  f"{args.save_dir}: rendering from the random init")
        start = int(trainer.history["step"])
        suffix = "test" if args.render_test else "path"
        out_dir = os.path.join(args.save_dir, f"renderonly_{suffix}_{start:06d}")
        if args.render_test:
            rgbs, disps, psnrs = render_path(
                trainer.state.params, test_ds.poses,
                (test_ds.H, test_ds.W, test_ds.focal), rc,
                gt_images=test_ds.images, render_factor=args.render_factor,
                occ_grid=trainer.occ_grid, save_dir=out_dir, tile=args.chunk,
                mesh=trainer.render_mesh,
            )
        else:
            rgbs, disps, _ = render_path(
                trainer.state.params, render_poses,
                (dataset.H, dataset.W, dataset.focal), rc,
                render_factor=args.render_factor,
                occ_grid=trainer.occ_grid, save_dir=out_dir, tile=args.chunk,
                mesh=trainer.render_mesh,
            )
            save_path_videos(os.path.join(out_dir, "video"), rgbs, disps)
        print(f"✅ render_only done: {len(rgbs)} frames -> {out_dir}")
        return {"render_only": out_dir}

    metrics = trainer.train()

    # End-of-run report figures (reference: train.py:587-707 produces a
    # 3x3 comprehensive grid + a focused 2-panel convergence figure; the
    # 6-panel progress report is this framework's own addition).
    try:
        try:
            from scripts.plot_training_progress import (
                create_comprehensive_report,
                create_convergence_plot,
                create_progress_plot,
            )
        except ModuleNotFoundError:
            # Installed console entry point (nerfmlp-train): the wheel
            # ships the CLI layer as nerfmlp_tpu.scripts only — no
            # top-level `scripts` exists in site-packages.
            from nerfmlp_tpu.scripts.plot_training_progress import (
                create_comprehensive_report,
                create_convergence_plot,
                create_progress_plot,
            )

        metrics_json = os.path.join(args.save_dir, "metrics_latest.json")
        create_progress_plot(
            metrics_json,
            out_path=os.path.join(args.save_dir, "training_report.png"),
        )
        create_convergence_plot(
            metrics_json,
            # The reference's artifact name (train.py:706, README.md:320).
            out_path=os.path.join(args.save_dir, "convergence_plot.png"),
        )
        # The comprehensive report reads the END-OF-RUN snapshot (it has
        # the full-val series + the recorded config for the lr panel).
        comp_json = os.path.join(args.save_dir, "comprehensive_metrics.json")
        create_comprehensive_report(
            comp_json if os.path.exists(comp_json) else metrics_json,
            out_path=os.path.join(args.save_dir, "comprehensive_metrics.png"),
        )
    except Exception as e:  # plotting is best-effort
        print(f"(plotting skipped: {e})")
    print(f"✅ done — final PSNR {metrics.get('final_val', {}).get('psnr')}")
    return metrics


if __name__ == "__main__":
    main()
