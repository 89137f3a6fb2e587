#!/usr/bin/env python
"""Generate a procedural Blender-format test scene (no downloads needed)."""

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
    p = argparse.ArgumentParser(description="Make a synthetic NeRF scene")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--img_wh", type=int, nargs=2, default=[128, 128])
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_val", type=int, default=4)
    p.add_argument("--n_test", type=int, default=4)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--field", type=str, default="default",
                   choices=["default", "hard"],
                   help="analytic radiance field: the smooth default scene"
                        " or the hard high-frequency benchmark field"
                        " (thin rods, checker/noise textures, hard edges)")
    p.add_argument("--aa", type=int, default=1,
                   help="supersample the GT aa x aa per pixel (use 2 with"
                        " --field hard: anti-aliased ground truth)")
    p.add_argument("--gt_samples", type=int, default=192,
                   help="GT ray-march samples (512 recommended for the"
                        " hard field's thin geometry)")
    p.add_argument("--use_jax", action="store_true",
                   help="jitted GT renderer (same equations, ~100x faster"
                        " at high res; runs on jax's default backend)")
    p.add_argument("--format", type=str, default="blender",
                   choices=["blender", "llff"],
                   help="blender: transforms_*.json; llff: poses_bounds.npy"
                        " + images/")
    p.add_argument("--llff_style", type=str, default="360",
                   choices=["360", "forward"],
                   help="llff camera rig: 360 ring (--spherify workload) or"
                        " forward-facing cluster (NDC workload)")
    args = p.parse_args(argv)

    if args.format == "llff":
        from nerfmlp_tpu.data.synthetic import make_synthetic_llff_scene

        make_synthetic_llff_scene(
            args.outdir, n_images=args.n_train, img_wh=tuple(args.img_wh),
            style=args.llff_style, radius=args.radius, seed=args.seed,
        )
        print(f"wrote LLFF ({args.llff_style}) scene to {args.outdir} "
              f"({args.n_train} images @ {args.img_wh[0]}x{args.img_wh[1]})")
        return

    from nerfmlp_tpu.data.synthetic import make_synthetic_scene

    make_synthetic_scene(
        args.outdir, n_train=args.n_train, n_val=args.n_val,
        n_test=args.n_test, img_wh=tuple(args.img_wh),
        radius=args.radius, seed=args.seed,
        field=args.field, aa=args.aa, n_samples=args.gt_samples,
        use_jax=args.use_jax,
    )
    print(f"wrote scene to {args.outdir} "
          f"({args.n_train} train / {args.n_val} val / {args.n_test} test "
          f"@ {args.img_wh[0]}x{args.img_wh[1]})")


if __name__ == "__main__":
    main()
