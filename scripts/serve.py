#!/usr/bin/env python
"""Serve renders from a resident checkpoint over HTTP.

The reference's inference entry points are one-shot CLIs
(``/root/reference/scripts/render_example.py``, ``zoom_example.py``) that
pay checkpoint load — and on a compiled backend, XLA compilation — per
invocation. This server loads once, compiles each render shape once, and
serves every subsequent frame at steady-state device speed (the
production-serving counterpart of those CLIs; see
``nerfmlp_tpu/serve.py`` for the API).

Camera defaults (H/W/focal, near/far) come either from a dataset dir
(``--datadir``, exactly like the render CLI) or from explicit ``--focal``
— serving does not require the training data on disk.

Example:
    python scripts/serve.py --ckpt outputs/exp/model_final.ckpt \
        --focal 555.5 --img_wh 400 400 --port 8008
    curl -s localhost:8008/render -d '{"theta": 30, "phi": -30, "radius": 4}' \
        -o view.png
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


def build_service(args, parser):
    """CLI args -> a ready (unwarmed) RenderService. Split out for tests."""
    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.serve import RenderService
    from nerfmlp_tpu.train.checkpoint import load_params_any
    from nerfmlp_tpu.utils.cli import (
        arch_fields, build_occ_grid, dataset_class, dataset_kwargs,
        occupancy_fields, params_template, resolve_tile,
    )

    W, H = args.img_wh
    focal = args.focal
    near, far = args.near, args.far
    # LLFF is never white-composited, with or without a datadir (real
    # photos have real backgrounds — same rule as render_example.py:129).
    white_bkgd = args.dataset_type != "llff" and not args.no_white_bkgd
    # NDC ray reparameterization must match training (rays_for_pose
    # branches on cfg.ndc): with a datadir the LLFF loader decides
    # (spherify forces metric rays); without one, the oracle default —
    # NDC for forward-facing LLFF unless --no_ndc/--spherify.
    ndc = (args.dataset_type == "llff"
           and not args.no_ndc and not args.spherify)
    if focal is None or near is None or far is None:
        if args.datadir is None:
            parser.error("--focal/--near/--far must all be given when no "
                         "--datadir supplies camera defaults")
        DS = dataset_class(args.dataset_type)
        ds = DS(args.datadir, args.split, img_wh=tuple(args.img_wh),
                **dataset_kwargs(args))
        if args.dataset_type == "llff":
            ndc = ds.use_ndc
        if focal is None:
            focal = float(ds.focal)
        if near is None or far is None:
            # Blender keeps the training-consistent 2/6 defaults; LLFF
            # (NDC) and deepvoxels take the dataset's bounds, matching
            # scripts/render_example.py.
            d_near, d_far = ((2.0, 6.0) if args.dataset_type == "blender"
                             else ds.dynamic_near_far())
            near = d_near if near is None else near
            far = d_far if far is None else far

    n_importance = args.N_importance
    if n_importance is None:
        n_importance = 64 if args.ckpt.endswith(".npy") else 128

    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=n_importance,
        near=float(near), far=float(far), perturb=False, raw_noise_std=0.0,
        ndc=ndc, coord_scale=args.coord_scale,
        compute_dtype=args.compute_dtype,
        fp32_precision=args.fp32_precision, use_pallas=args.use_pallas,
        separate_fine=args.separate_fine, white_bkgd=white_bkgd,
        **occupancy_fields(args),
        **arch_fields(args),
    )
    template = params_template(rc)
    model_cfg = rc.model_config()
    # (params, step) in one decode — RenderService would otherwise
    # re-parse the same (multi-MB for full-TrainState files) checkpoint
    # a second time at startup just to report the step in /health.
    params, ckpt_step = load_params_any(
        args.ckpt, template, model_cfg, with_step=True)
    occ_grid = build_occ_grid(args, rc, params, parser)
    print(f"loaded {args.ckpt} | {W}x{H} focal={focal:.2f} "
          f"near={rc.near:.3f} far={rc.far:.3f} "
          f"samples {rc.N_samples}+{rc.N_importance}"
          + (" | NDC rays" if ndc else ""))

    def reload_fn(path):
        # (params, step) in one decode: RenderService.reload would
        # otherwise msgpack-parse the same multi-MB file a second time
        # just to report the step in /health.
        return load_params_any(path, template, model_cfg, with_step=True)

    occ_rebuild_fn = None
    if occ_grid is not None:
        import jax

        from nerfmlp_tpu.ops.occupancy import build_grid

        def occ_rebuild_fn(new_params):
            return build_grid(new_params, rc, jax.random.PRNGKey(0),
                              resolution=args.occ_grid_size)

    watch_dir = args.watch_dir
    if watch_dir is None and (args.watch > 0 or not args.ckpt.endswith(
            (".npy", ".pth", ".pt"))):
        # Default to the checkpoint's own directory — the Trainer's
        # --save_dir layout — so --watch/POST /reload work out of the box.
        watch_dir = os.path.dirname(os.path.abspath(args.ckpt))

    # Multi-chip serving (default): on a >1-device host, shard each
    # frame's pixel grid over a data-parallel mesh — the same sharded
    # renderer the trainer and batch CLIs use — so a v5e-8 server drives
    # every chip. RenderService falls back to one device otherwise.
    mesh = None
    if args.shard_render:
        import jax

        n_dev = args.n_devices or len(jax.devices())
        if n_dev > 1:
            from nerfmlp_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_devices=n_dev)
            print(f"sharded frame rendering over {n_dev} devices")
    return RenderService(
        params, rc, H, W, focal,
        tile=resolve_tile(args), occ_grid=occ_grid,
        max_pixels=args.max_pixels, max_queue=args.max_queue,
        max_mesh_resolution=args.max_mesh_resolution,
        reload_fn=reload_fn, occ_rebuild_fn=occ_rebuild_fn,
        watch_dir=watch_dir, ckpt_path=os.path.abspath(args.ckpt),
        ckpt_step=ckpt_step, mesh=mesh,
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Persistent NeRF render server (TPU-native)")
    from nerfmlp_tpu.utils.cli import (
        add_arch_flags, add_llff_flags, add_occupancy_flags,
        add_tile_flag,
    )
    p.add_argument("--ckpt", "--model_path", type=str, required=True,
                   help=".ckpt/.pth/.npy checkpoint to serve")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--img_wh", type=int, nargs=2, default=[400, 400],
                   help="default render W H (per-request overridable)")
    p.add_argument("--focal", type=float, default=None,
                   help="default focal length in pixels; omit to read it "
                        "from --datadir")
    p.add_argument("--near", type=float, default=None)
    p.add_argument("--far", type=float, default=None)
    p.add_argument("--datadir", type=str, default=None,
                   help="optional dataset dir supplying focal/bounds "
                        "defaults (like the render CLI)")
    p.add_argument("--dataset_type", type=str, default="blender",
                   choices=["blender", "llff", "deepvoxels"])
    p.add_argument("--shape", type=str, default="greek",
                   help="deepvoxels scene name (oracle --shape)")
    p.add_argument("--split", type=str, default="test")
    add_llff_flags(p)
    p.add_argument("--no_white_bkgd", action="store_true")
    p.add_argument("--coord_scale", type=float, default=1.0)
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=None,
                   help="default: 64 for .npy official weights, 128 otherwise")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   help="serving defaults to bfloat16 (speed); float32 for "
                        "parity-grade output")
    p.add_argument("--fp32_precision", type=str, default="high",
                   choices=["highest", "high"])
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false",
                   default=True)
    p.add_argument("--separate_fine", action="store_true")
    add_occupancy_flags(p)
    p.add_argument("--no_shard_render", dest="shard_render",
                   action="store_false", default=True,
                   help="serve frames on one device even when several "
                        "are visible (default: shard each frame's pixel "
                        "grid over all devices)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="devices for sharded serving (default: all)")
    add_tile_flag(p)
    p.add_argument("--max_pixels", type=int, default=4096 * 4096,
                   help="reject render requests above this pixel count")
    p.add_argument("--max_queue", type=int, default=8,
                   help="max renders rendering-or-waiting at once; excess "
                        "requests get 503 + Retry-After (0 = unbounded)")
    p.add_argument("--max_mesh_resolution", type=int, default=256,
                   help="POST /mesh grid-resolution cap (0 disables the "
                        "mesh route)")
    p.add_argument("--no_warmup", dest="warmup", action="store_false",
                   default=True,
                   help="skip the startup compile render (first request "
                        "pays it instead)")
    p.add_argument("--watch", type=float, default=0.0, metavar="SECONDS",
                   help="poll for newer checkpoints and hot-swap them "
                        "(serve a model while it trains); 0 disables")
    p.add_argument("--watch_dir", type=str, default=None,
                   help="directory to watch (default: the --ckpt's dir)")
    from nerfmlp_tpu.utils.cache import add_compilation_cache_flag

    add_compilation_cache_flag(p)
    add_arch_flags(p)
    return p


def main(argv=None):
    p = build_parser()
    args = p.parse_args(argv)

    from nerfmlp_tpu.serve import serve
    from nerfmlp_tpu.utils.cache import maybe_enable_from_args

    maybe_enable_from_args(args)

    service = build_service(args, p)
    serve(service, host=args.host, port=args.port, warmup=args.warmup,
          watch_interval=args.watch)


if __name__ == "__main__":
    main()
