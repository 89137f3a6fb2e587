#!/usr/bin/env python
"""Render one training view and concatenate it with ground truth
side-by-side (reference scripts/compare_single_view.py). Also prints the
per-view PSNR — the number the visual diff is standing in for.
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
    p = argparse.ArgumentParser(description="Render-vs-GT side-by-side")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default="blender",
                   choices=["blender", "llff"])
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--img_wh", type=int, nargs=2, default=[400, 400])
    p.add_argument("--ckpt", "--model_path", type=str, required=True,
                   help="checkpoint (reference flag name: --model_path)")
    p.add_argument("--view_idx", type=int, default=0)
    p.add_argument("--out", "--output", type=str, default="outputs/compare.png",
                   help="output image (reference flag name: --output)")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="render numerics (default: bfloat16 with the "
                        "kernel, float32 under --no_pallas — the "
                        "long-standing pairing, render_video.py); "
                        "float32 + --fp32_precision high keeps kernel "
                        "speed at fp32-grade fidelity (docs/RESULTS.md)")
    p.add_argument("--fp32_precision", type=str, default="highest",
                   choices=["highest", "high"])
    p.add_argument("--separate_fine", action="store_true",
                   help="checkpoint holds separate coarse/fine nets")
    from nerfmlp_tpu.utils.cli import (
        add_arch_flags,
        add_occupancy_flags,
        arch_fields,
        build_occ_grid,
        occupancy_fields,
        params_template,
    )
    add_arch_flags(p)
    # Occupancy-trained checkpoints must be RENDERED with their grid
    # (docs/RESULTS.md protocol caveat) — the GT comparator has to speak
    # the same protocol or turbo/certified-recipe models can't be diffed.
    add_occupancy_flags(p)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.data.llff import LLFFDataset
    from nerfmlp_tpu.ops.render import render_image
    from nerfmlp_tpu.train.checkpoint import load_params_any
    from nerfmlp_tpu.train.metrics import psnr_images, ssim

    DS = LLFFDataset if args.dataset_type == "llff" else BlenderDataset
    ds = DS(args.datadir, args.split, img_wh=tuple(args.img_wh))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(N_samples=args.N_samples, N_importance=args.N_importance,
                      near=near, far=far, perturb=False,
                      use_pallas=args.use_pallas, separate_fine=args.separate_fine,
                      # bf16 pairs with the kernel (fp32/highest would
                      # silently route to XLA and make --no_pallas a
                      # no-op); --no_pallas keeps its historical
                      # fp32/highest comparison numerics.
                      compute_dtype=args.compute_dtype or (
                          "bfloat16" if args.use_pallas else "float32"),
                      fp32_precision=args.fp32_precision,
                      white_bkgd=args.dataset_type != "llff",
                      **occupancy_fields(args),
                      **arch_fields(args))
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())
    occ_grid = build_occ_grid(args, rc, params, p)

    o, d, gt = ds.image_rays(args.view_idx)
    from nerfmlp_tpu.data import image_viewdirs

    vd = image_viewdirs(ds, args.view_idx)
    img = np.asarray(render_image(params, jnp.asarray(o), jnp.asarray(d),
                                  ds.H, ds.W, rc, viewdirs=vd,
                                  occ_grid=occ_grid))
    print(f"view {args.view_idx}: PSNR {psnr_images(img, gt):.2f} dB | "
          f"SSIM {ssim(img, gt):.4f}")

    # Reference panel convention: [ground truth | render] (reference :93).
    side = np.concatenate([np.clip(gt, 0, 1), np.clip(img, 0, 1)], axis=1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray((side * 255).round().astype(np.uint8)).save(args.out)
    print(f"wrote {args.out} (left: ground truth, right: render)")


if __name__ == "__main__":
    main()
