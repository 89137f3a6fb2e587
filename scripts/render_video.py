#!/usr/bin/env python
"""Render a camera trajectory (or the test set) to PNG frames + rgb/disp
videos — the TPU-side equivalent of the official render_path driver
(example/run_nerf.py:339-375 and the --render_only/--render_test paths,
:682-702):

  * dataset render poses by default (Blender: the 40-pose orbit; LLFF:
    spiral for forward-facing, circular for --spherify),
  * ``--render_test``: render the held-out test split's own poses and log
    per-frame PSNR against ground truth (run_nerf.py:369-372, 687-691),
  * rgb AND max-normalized disparity videos (run_nerf.py:853-856),
  * ``--render_factor`` downscale for fast previews (run_nerf.py:344-349).
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
    p = argparse.ArgumentParser(description="Render an orbit/spiral/test-set video")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default="blender",
                   choices=["blender", "llff", "deepvoxels"])
    p.add_argument("--shape", type=str, default="greek",
                   help="deepvoxels scene name (oracle --shape)")
    p.add_argument("--out_dir", type=str, default="outputs/video")
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--render_factor", type=int, default=0,
                   help="downscale factor for fast previews")
    p.add_argument("--render_test", action="store_true",
                   help="render the test split's poses with per-frame PSNR "
                        "against ground truth instead of a trajectory")
    p.add_argument("--flythrough", action="store_true",
                   help="seamlessly-looping orbit with altitude+distance "
                        "variation (the reference's planned fly-through "
                        "demo, VIDEOS.md:47-86) instead of the flat orbit")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=64)
    p.add_argument("--near", type=float, default=None)
    p.add_argument("--far", type=float, default=None)
    p.add_argument("--separate_fine", action="store_true")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    from nerfmlp_tpu.utils.cli import (
        add_arch_flags, add_llff_flags, add_occupancy_flags, add_shard_flag,
        arch_fields, build_occ_grid, occupancy_fields, params_template,
    )
    add_arch_flags(p)
    add_occupancy_flags(p)
    add_shard_flag(p)
    # Full LLFF surface (--no_ndc/--spherify/--factor/--llffhold/
    # --no_aspect_snap): the render dataset must be built the way the
    # checkpoint was trained — a metric-ray checkpoint rendered through
    # NDC geometry produces wrong frames with no error.
    add_llff_flags(p)
    from nerfmlp_tpu.utils.cache import (
        add_compilation_cache_flag, maybe_enable_from_args,
    )

    add_compilation_cache_flag(p)
    args = p.parse_args(argv)
    maybe_enable_from_args(args)


    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.render_path import render_path, save_path_videos
    from nerfmlp_tpu.train.checkpoint import load_params_any

    os.makedirs(args.out_dir, exist_ok=True)
    if args.dataset_type == "llff":
        from nerfmlp_tpu.data.llff import LLFFDataset

        ds = LLFFDataset(
            args.datadir, "test" if args.render_test else "train",
            img_wh=(args.size, args.size),
            use_ndc=not args.no_ndc, spherify=args.spherify,
            factor=args.factor, llffhold=args.llffhold,
            keep_aspect=not args.no_aspect_snap,
        )
        ndc = ds.use_ndc
    elif args.dataset_type == "deepvoxels":
        from nerfmlp_tpu.data.deepvoxels import DeepVoxelsDataset

        ds = DeepVoxelsDataset(
            args.datadir, "test" if args.render_test else "train",
            img_wh=(args.size, args.size), shape=args.shape,
        )
        ndc = False
    else:
        from nerfmlp_tpu.data.blender import BlenderDataset

        split = "test" if args.render_test else "train"
        try:
            ds = BlenderDataset(args.datadir, split, img_wh=(args.size, args.size))
        except FileNotFoundError:
            if not args.render_test:
                raise
            print("(no test split; using val)")
            ds = BlenderDataset(args.datadir, "val", img_wh=(args.size, args.size))
        ndc = False

    near, far = ds.dynamic_near_far()
    if args.near is not None:
        near = args.near
    if args.far is not None:
        far = args.far

    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        near=near, far=far, perturb=False, ndc=ndc,
        # White composite for blender AND deepvoxels (the oracle's --white_bkgd
        # help: "always use for dvoxels", run_nerf.py:543-545); LLFF is real
        # photos with no background to composite.
        white_bkgd=args.dataset_type != "llff",
        separate_fine=args.separate_fine,
        use_pallas=args.use_pallas,
        compute_dtype="bfloat16" if args.use_pallas else "float32",
        **occupancy_fields(args),
        **arch_fields(args),
    )
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())
    occ_grid = build_occ_grid(args, rc, params, p)

    if args.render_test:
        poses, gts, tag = ds.poses, ds.images, "test"
    elif args.flythrough:
        from nerfmlp_tpu.ops.rays import flythrough_poses, mean_camera_radius

        if ndc:
            # A world-space orbit fed through the forward-facing NDC
            # projection produces out-of-range origins (garbage frames):
            # NDC assumes cameras looking down -z near the capture rig.
            p.error("--flythrough needs metric rays: forward-facing NDC "
                    "LLFF captures can't be orbited (use the default "
                    "spiral path, or --spherify for 360 captures)")
        poses = flythrough_poses(
            n_frames=args.n_frames, radius=mean_camera_radius(ds.poses)
        )
        gts, tag = None, "flythrough"
    else:
        poses, gts, tag = ds.render_poses(n_frames=args.n_frames), None, "path"

    mesh = None
    if args.shard_render:
        import jax

        if jax.device_count() > 1:
            from nerfmlp_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        else:
            print("--shard_render: one visible device; "
                  "using the local renderer")
    rgbs, disps, psnrs = render_path(
        params, poses, (ds.H, ds.W, ds.focal), rc,
        gt_images=gts, render_factor=args.render_factor,
        occ_grid=occ_grid, mesh=mesh,
        save_dir=os.path.join(args.out_dir, "frames"),
    )
    rgb_path, disp_path = save_path_videos(
        os.path.join(args.out_dir, tag), rgbs, disps, fps=args.fps
    )
    print(f"wrote {rgb_path} and {disp_path}")
    if psnrs:
        import numpy as np

        import json

        report = {
            "per_frame_psnr": [round(float(x), 3) for x in psnrs],
            "mean_psnr": round(float(np.mean(psnrs)), 3),
        }
        with open(os.path.join(args.out_dir, "psnr.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(f"mean test PSNR {report['mean_psnr']:.2f} "
              f"({len(psnrs)} frames; psnr.json written)")


if __name__ == "__main__":
    main()
