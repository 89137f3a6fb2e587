#!/usr/bin/env python
"""Standalone test-set evaluation: render every view of a split and report
per-view + mean PSNR/SSIM (the benchmark protocol behind BASELINE config 3;
the reference only evaluates inside training, scripts/train.py:563-585).
"""

import argparse
import json
import os
import sys

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a checkpoint on a split")
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
    add_occupancy_flags(p)
    add_shard_flag(p)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--img_wh", type=int, nargs=2, default=[800, 800])
    p.add_argument("--ckpt", type=str, required=True, help=".ckpt or .npy")
    p.add_argument("--out", type=str, default=None,
                   help="write a JSON report here (default: <ckpt>.eval.json)")
    p.add_argument("--save_renders", type=str, default=None,
                   help="optional dir for the rendered PNGs")
    p.add_argument("--lpips", action="store_true",
                   help="also report LPIPS (needs the optional `lpips` "
                        "package + pretrained weights; reported as null "
                        "when unavailable)")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--near", type=float, default=None)
    p.add_argument("--far", type=float, default=None)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--fp32_precision", type=str, default="highest",
                   choices=["highest", "high"],
                   help="fp32 matmul passes: highest=6 (golden parity), "
                        "high=3 (~2x faster, fp32-grade)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false",
                   default=True)
    p.add_argument("--separate_fine", action="store_true",
                   help="checkpoint holds separate coarse/fine nets")
    add_tile_flag(p)
    add_arch_flags(p)
    from nerfmlp_tpu.utils.cache import (
        add_compilation_cache_flag, maybe_enable_from_args,
    )

    add_compilation_cache_flag(p)
    args = p.parse_args(argv)
    maybe_enable_from_args(args)

    import time

    import numpy as np

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.train.checkpoint import load_params_any
    from nerfmlp_tpu.train.metrics import psnr_images, ssim
    from nerfmlp_tpu.utils.image import save_png

    from nerfmlp_tpu.data import image_viewdirs

    DS = dataset_class(args.dataset_type)
    ds = DS(args.datadir, args.split, img_wh=tuple(args.img_wh),
            **dataset_kwargs(args))
    near, far = ds.dynamic_near_far()
    if args.near is not None:
        near = args.near
    if args.far is not None:
        far = args.far

    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        near=near, far=far, perturb=False, raw_noise_std=0.0,
        compute_dtype=args.compute_dtype, fp32_precision=args.fp32_precision, use_pallas=args.use_pallas, separate_fine=args.separate_fine,
        white_bkgd=args.dataset_type != "llff",
        **occupancy_fields(args),
        **arch_fields(args),
    )
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())
    occ_grid = build_occ_grid(args, rc, params, p)

    if args.save_renders:
        os.makedirs(args.save_renders, exist_ok=True)

    # LPIPS (reference benchmarking plan names PSNR/SSIM/LPIPS,
    # GLSL_BENCHMARKING_PLAN.md:114-134, never executed there). Needs the
    # `lpips` package + its pretrained AlexNet weights — skip gracefully
    # when absent (this image has no lpips/torchvision and no egress).
    lpips_fn = None
    if args.lpips:
        try:
            import lpips as _lpips
            import torch as _torch

            _net = _lpips.LPIPS(net="alex")

            def lpips_fn(a, b):
                ta = _torch.from_numpy(
                    (a.transpose(2, 0, 1)[None] * 2.0 - 1.0).astype(np.float32)
                )
                tb = _torch.from_numpy(
                    (b.transpose(2, 0, 1)[None] * 2.0 - 1.0).astype(np.float32)
                )
                with _torch.no_grad():
                    return float(_net(ta, tb))
        except Exception as e:  # noqa: BLE001 — any import/weights failure
            print(f"(LPIPS unavailable: {e} — reporting null)")

    per_view = []
    t0 = time.time()
    for i in range(ds.n_images):
        o, d, gt = ds.image_rays(i)
        vd = image_viewdirs(ds, i)
        img = render_frame(args, params, o, d, ds.H, ds.W, rc,
                           occ_grid=occ_grid, viewdirs=vd)
        view = {"view": i, "psnr": psnr_images(img, gt), "ssim": ssim(img, gt)}
        if lpips_fn is not None:
            view["lpips"] = lpips_fn(np.asarray(img), np.asarray(gt))
        per_view.append(view)
        print(f"view {i:3d}: PSNR {view['psnr']:6.2f} dB | SSIM {view['ssim']:.4f}"
              + (f" | LPIPS {view['lpips']:.4f}" if "lpips" in view else ""))
        if args.save_renders:
            save_png(os.path.join(args.save_renders, f"eval_{args.split}_{i}.png"), img)
    dt = time.time() - t0

    report = {
        "split": args.split,
        "n_views": ds.n_images,
        "resolution": list(args.img_wh),
        "mean_psnr": float(np.mean([v["psnr"] for v in per_view])),
        "mean_ssim": float(np.nanmean([v["ssim"] for v in per_view])),
        "mean_lpips": (
            float(np.mean([v["lpips"] for v in per_view]))
            if per_view and "lpips" in per_view[0] else None
        ),
        "sec_per_frame": dt / max(ds.n_images, 1),
        "per_view": per_view,
        "config": {"N_samples": args.N_samples, "N_importance": args.N_importance,
                   "near": near, "far": far, "ckpt": args.ckpt},
    }
    out = args.out or (args.ckpt + ".eval.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nmean PSNR {report['mean_psnr']:.2f} dB | "
          f"mean SSIM {report['mean_ssim']:.4f} | "
          f"{report['sec_per_frame']:.2f} s/frame -> {out}")
    return report


if __name__ == "__main__":
    main()
