#!/usr/bin/env python
"""Render views from a checkpoint — reference scripts/render_example.py.

Loads both framework ``.ckpt`` checkpoints and official TF ``.npy`` weight
lists (auto-detected by extension, reference :166-207). Default bounds are
the training-consistent near=2.0 far=6.0 (reference :120-124) unless
``--dynamic_bounds`` or explicit ``--near/--far`` is given.
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


def main(argv=None):
    p = argparse.ArgumentParser(description="Render NeRF views (TPU-native)")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default="blender",
                   choices=["blender", "llff", "deepvoxels"])
    p.add_argument("--shape", type=str, default="greek",
                   help="deepvoxels scene name (oracle --shape)")
    from nerfmlp_tpu.utils.cli import (
        add_arch_flags, add_llff_flags, add_occupancy_flags, add_shard_flag,
        add_tile_flag, arch_fields, build_occ_grid, dataset_class,
        dataset_kwargs, occupancy_fields, params_template, render_frame,
    )
    add_llff_flags(p)
    add_shard_flag(p)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--img_wh", type=int, nargs=2, default=[800, 800])
    p.add_argument("--ckpt", "--model_path", type=str, required=True,
                   help=".ckpt/.pth/.npy checkpoint (reference flag name: "
                        "--model_path)")
    p.add_argument("--out_dir", type=str, default="outputs/renders")
    p.add_argument("--out_prefix", type=str, default=None,
                   help="reference-style output naming: writes "
                        "{out_prefix}_{idx}.png instead of "
                        "render_{split}_{i}.png (reference :272)")
    p.add_argument("--no_white_bkgd", action="store_true",
                   help="composite onto black even for blender scenes "
                        "(reference --no_white_bkgd)")
    p.add_argument("--use_fine_weights", action="store_true",
                   help="accepted for reference-command compatibility: "
                        "official fine .npy weights are detected by the "
                        ".npy extension here (reference :134-137)")
    p.add_argument("--num_views", type=int, default=1)
    p.add_argument("--view_idx", type=int, default=None)
    p.add_argument("--near", type=float, default=None,
                   help="explicit near bound (default: 2.0 for blender — "
                        "reference :120-124 — else the dataset's)")
    p.add_argument("--far", type=float, default=None,
                   help="explicit far bound (default: 6.0 for blender, "
                        "else the dataset's)")
    p.add_argument("--dynamic_bounds", action="store_true",
                   help="derive near/far from camera poses instead of 2/6")
    p.add_argument("--coord_scale", type=float, default=1.0)
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=None,
                   help="default: 64 for .npy official weights, 128 otherwise")
    p.add_argument("--apply_gamma", "--gamma_correction", action="store_true",
                   help="linear->sRGB transfer on output (reference :12-26; "
                        "reference flag name: --gamma_correction)")
    p.add_argument("--brightness_boost", type=float, default=1.0)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   help="float32 (parity) or bfloat16 (speed)")
    p.add_argument("--fp32_precision", type=str, default="highest",
                   choices=["highest", "high"],
                   help="fp32 matmul passes: highest=6 (golden parity), "
                        "high=3 (~2x faster, fp32-grade)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    p.add_argument("--separate_fine", action="store_true",
                   help="checkpoint holds separate coarse/fine nets")
    add_occupancy_flags(p)
    add_tile_flag(p)
    add_arch_flags(p)
    from nerfmlp_tpu.utils.cache import (
        add_compilation_cache_flag, maybe_enable_from_args,
    )

    add_compilation_cache_flag(p)
    args = p.parse_args(argv)
    maybe_enable_from_args(args)

    import numpy as np
    from PIL import Image

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.data.blender import linear_to_srgb
    from nerfmlp_tpu.train.checkpoint import load_params_any

    os.makedirs(args.out_dir, exist_ok=True)
    from nerfmlp_tpu.data import image_viewdirs

    DS = dataset_class(args.dataset_type)
    ds = DS(args.datadir, args.split, img_wh=tuple(args.img_wh),
            **dataset_kwargs(args))

    is_npy = args.ckpt.endswith(".npy")
    n_importance = args.N_importance
    if n_importance is None:
        # Official fine weights were trained at 64 importance samples;
        # custom checkpoints default to 128 (reference :212-223).
        n_importance = 64 if is_npy else 128

    near, far = 2.0, 6.0  # the reference's training-consistent blender default
    if args.dynamic_bounds or args.dataset_type in ("llff", "deepvoxels"):
        # LLFF rays are in NDC (depth in [0, 1]) and deepvoxels uses
        # hemisphere bounds R-/+1 (run_nerf.py:640-642) — never the
        # blender 2/6 defaults; take the dataset's bounds there.
        near, far = ds.dynamic_near_far()
    # Explicit flags win over BOTH defaults (the docstring's contract —
    # they were previously ignored for llff/deepvoxels).
    if args.near is not None:
        near = args.near
    if args.far is not None:
        far = args.far
    print(f"bounds: near={near:.3f} far={far:.3f} | "
          f"samples {args.N_samples}+{n_importance}")

    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=n_importance,
        near=near, far=far, perturb=False, raw_noise_std=0.0,
        coord_scale=args.coord_scale, compute_dtype=args.compute_dtype, fp32_precision=args.fp32_precision,
        use_pallas=args.use_pallas, separate_fine=args.separate_fine,
        # Match training's compositing: white bkgd is blender-only
        # (reference --no_white_bkgd overrides).
        white_bkgd=args.dataset_type != "llff" and not args.no_white_bkgd,
        **occupancy_fields(args),
        **arch_fields(args),
    )
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())
    occ_grid = build_occ_grid(args, rc, params, p)

    idxs = [args.view_idx] if args.view_idx is not None else list(range(args.num_views))
    for i in idxs:
        # Cycle past the split size like the reference (pose_idx =
        # view_idx % len(poses), reference :241,:278) instead of raising.
        k = i % ds.n_images
        o, d, _ = ds.image_rays(k)
        vd = image_viewdirs(ds, k)
        img = render_frame(args, params, o, d, ds.H, ds.W, rc,
                           occ_grid=occ_grid, viewdirs=vd)
        img = np.clip(img * args.brightness_boost, 0.0, 1.0)
        if args.apply_gamma:
            img = linear_to_srgb(img)
        if args.out_prefix:
            # Reference semantics: --out_prefix is a PATH prefix, NOT a
            # name under --out_dir (reference :272,:309 and every
            # README command, e.g. `--out_prefix outputs/my_test`);
            # --view_idx renders are named *_view{idx}.png (:272).
            tag = f"view{i}" if args.view_idx is not None else str(i)
            out = f"{args.out_prefix}_{tag}.png"
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        else:
            out = os.path.join(args.out_dir, f"render_{args.split}_{i}.png")
        Image.fromarray((img * 255).round().astype(np.uint8)).save(out)
        print(f"wrote {out}")
    return args.out_dir


if __name__ == "__main__":
    main()
