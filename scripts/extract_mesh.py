#!/usr/bin/env python
"""Extract a triangle mesh from a trained checkpoint's density field.

A framework superset tool (the reference's inference surface is image
CLIs only, /root/reference/scripts/render_example.py): query sigma on a
grid over the scene AABB, surface the `sigma > threshold` level set by
marching tetrahedra (ops/mesh.py — static shapes, one-hot contractions),
and write .ply (binary/ascii, vertex colors + normals) or .obj.

    python scripts/extract_mesh.py --ckpt outputs/run1/model_best.ckpt \
        --aabb -1.5 -1.5 -1.2 1.5 1.5 1.5 --resolution 256 \
        --threshold 25 --out lego.ply

Density/color semantics match the renderer exactly (relu sigma /
sigmoid rgb, /root/reference/nerfmlp/renderer.py:114-163), so the mesh
is the level set of the field the image pipeline integrates.
"""

import argparse
import os
import sys
import time

if __package__ in (None, ""):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Extract a density-isosurface mesh from a checkpoint"
    )
    p.add_argument("--ckpt", type=str, required=True,
                   help=".ckpt/.npy/.pth checkpoint (any supported format)")
    p.add_argument("--out", type=str, default="mesh.ply",
                   help="output path; extension picks the format (.ply/.obj)")
    p.add_argument("--aabb", type=float, nargs=6, metavar="F",
                   default=[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
                   help="scene bounds xmin ymin zmin xmax ymax zmax (same "
                        "convention as the occupancy --aabb)")
    p.add_argument("--resolution", type=int, default=256,
                   help="density grid nodes per axis (cells = R-1)")
    p.add_argument("--threshold", type=float, default=25.0,
                   help="sigma iso level; surfaces density > threshold")
    p.add_argument("--no_color", dest="color", action="store_false",
                   default=True,
                   help="skip per-vertex RGB (one extra MLP pass over "
                        "surface vertices)")
    p.add_argument("--gamma", action="store_true",
                   help="encode baked colors to sRGB (the model outputs "
                        "linear radiance; same knob as the render CLIs' "
                        "--apply_gamma)")
    p.add_argument("--ascii", dest="binary", action="store_false",
                   default=True, help="ascii .ply instead of binary")
    p.add_argument("--density_chunk", type=int, default=65536,
                   help="grid points per compiled density-eval batch")
    p.add_argument("--cell_chunk", type=int, default=16384,
                   help="surface cells per compiled tet batch")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="MLP eval dtype (bf16 is plenty for geometry)")
    p.add_argument("--fp32_precision", type=str, default="high",
                   choices=["high", "highest"])
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false",
                   default=True)
    p.add_argument("--separate_fine", action="store_true",
                   help="checkpoint trained with a separate fine net")
    p.add_argument("--no_viewdirs", dest="use_viewdirs",
                   action="store_false", default=True)
    from nerfmlp_tpu.utils.cli import add_arch_flags, arch_fields, \
        params_template
    add_arch_flags(p)
    from nerfmlp_tpu.utils.cache import (
        add_compilation_cache_flag, maybe_enable_from_args,
    )
    add_compilation_cache_flag(p)
    args = p.parse_args(argv)
    maybe_enable_from_args(args)

    # Fail on bad geometry inputs BEFORE the (possibly minutes-long)
    # density evaluation — the same validators the serve route uses.
    import math

    from nerfmlp_tpu.ops.mesh import _check_aabb

    if not 2 <= args.resolution <= 1289:
        p.error("--resolution must be in [2, 1289]")
    try:
        _check_aabb(args.aabb)
    except (TypeError, ValueError) as e:
        p.error(str(e))
    if not math.isfinite(args.threshold):
        p.error("--threshold must be finite")

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.ops.mesh import extract_mesh, save_mesh
    from nerfmlp_tpu.train.checkpoint import load_params_any

    # Near/far/sample counts are integration parameters — irrelevant to a
    # pure field query — but RenderConfig carries the architecture, the
    # encodings, and the compute dtype the checkpoint expects.
    rc = RenderConfig(
        N_samples=64, N_importance=0, near=2.0, far=6.0, perturb=False,
        use_viewdirs=args.use_viewdirs,
        separate_fine=args.separate_fine,
        use_pallas=args.use_pallas,
        compute_dtype=args.compute_dtype,
        fp32_precision=args.fp32_precision,
        aabb=tuple(args.aabb),
        **arch_fields(args),
    )
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())

    t0 = time.time()
    mesh = extract_mesh(
        params, rc,
        resolution=args.resolution, threshold=args.threshold,
        color=args.color, gamma=args.gamma,
        density_chunk=args.density_chunk, cell_chunk=args.cell_chunk,
    )
    dt = time.time() - t0
    n_v, n_f = mesh["verts"].shape[0], mesh["faces"].shape[0]
    print(f"sigma in [{mesh['sigma_min']:.3g}, {mesh['sigma_max']:.3g}] "
          f"at {args.resolution}^3; iso {args.threshold} -> "
          f"{n_v} verts, {n_f} faces in {dt:.1f}s")
    if n_f == 0:
        print("WARNING: empty mesh — try a threshold inside the sigma "
              "range above, or check --aabb covers the object")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_mesh(args.out, mesh, binary=args.binary)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
