"""Shared CLI plumbing for the render-side scripts.

The training CLI exposes the oracle's network-architecture flags
(--netdepth/--netwidth and the _fine variants, example/run_nerf.py:467-474);
these helpers give every checkpoint-loading script the same flags so a
custom-architecture checkpoint can be rendered/evaluated/compared without
editing code.
"""

from __future__ import annotations

from typing import Dict


def add_arch_flags(p) -> None:
    """--netdepth/--netwidth/--netdepth_fine/--netwidth_fine (oracle
    run_nerf.py:467-474). Defaults = the reference 8x256 architecture."""
    p.add_argument("--netdepth", type=int, default=8,
                   help="MLP trunk depth (oracle --netdepth)")
    p.add_argument("--netwidth", type=int, default=256,
                   help="MLP trunk width (oracle --netwidth)")
    p.add_argument("--netdepth_fine", type=int, default=0,
                   help="fine net trunk depth (0 = same as --netdepth)")
    p.add_argument("--netwidth_fine", type=int, default=0,
                   help="fine net trunk width (0 = same as --netwidth)")


def arch_fields(args) -> Dict[str, int]:
    """RenderConfig kwargs for the parsed architecture flags."""
    return {
        "depth": args.netdepth,
        "width": args.netwidth,
        "depth_fine": args.netdepth_fine,
        "width_fine": args.netwidth_fine,
    }


def add_llff_flags(p) -> None:
    """--no_ndc/--spherify/--factor/--llffhold for checkpoint-consuming
    scripts: the eval/render dataset must be built the way the checkpoint
    was trained (NDC vs metric rays, spherified poses, image dir, holdout
    split) or the geometry silently mismatches."""
    p.add_argument("--no_ndc", action="store_true",
                   help="metric rays instead of NDC (match training)")
    p.add_argument("--spherify", action="store_true",
                   help="LLFF 360 capture (match training)")
    p.add_argument("--factor", type=int, default=0,
                   help="LLFF images_{factor}/ directory (match training)")
    p.add_argument("--llffhold", type=int, default=8,
                   help="every Nth image is val/test (match training)")
    p.add_argument("--no_aspect_snap", action="store_true",
                   help="honor a non-native-aspect --img_wh exactly instead "
                        "of snapping height to the capture's aspect (the "
                        "vertical FOV will then mismatch the resized GT — "
                        "only for reproducing metrics computed that way)")


def add_occupancy_flags(p) -> None:
    """--use_occupancy/--aabb/--occ_grid_size/--occ_dense_samples for
    checkpoint-consuming scripts — the inference-side counterpart of the
    trainer's occupancy flags (scripts/train.py): the coarse MLP pass is
    replaced by a density grid rebuilt from the checkpoint."""
    p.add_argument("--use_occupancy", action="store_true",
                   help="occupancy-grid sampling (requires --aabb): rebuild "
                        "a density grid from the checkpoint, place all "
                        "samples in occupied space, skip the coarse MLP "
                        "pass (same trade as the trainer's --use_occupancy)")
    p.add_argument("--aabb", type=float, nargs=6, default=None,
                   metavar=("XMIN", "YMIN", "ZMIN", "XMAX", "YMAX", "ZMAX"),
                   help="scene box for --use_occupancy")
    p.add_argument("--occ_grid_size", type=int, default=64)
    p.add_argument("--occ_dense_samples", type=int, default=128)
    p.add_argument("--occ_one_shot", action="store_true",
                   help="r4 occupancy protocol: draw every depth from the "
                        "grid prior in one pass (the r5 default is "
                        "hierarchical — grid-guided probes + importance "
                        "resampling at the same MLP cost; see "
                        "RenderConfig.occ_one_shot)")


def occupancy_fields(args) -> dict:
    """RenderConfig kwargs for the parsed occupancy flags."""
    return {
        "use_occupancy": args.use_occupancy,
        "aabb": tuple(args.aabb) if args.aabb else None,
        "occ_grid_size": args.occ_grid_size,
        "occ_dense_samples": args.occ_dense_samples,
        "occ_one_shot": args.occ_one_shot,
    }


def add_tile_flag(p) -> None:
    """--tile/--chunk with a sampling-mode-aware default.

    The oracle's ``--chunk`` (run_nerf.py:480, default 32768 rays) is a
    host-memory knob; here the tile is the compiled dispatch shape, and
    the throughput optimum depends on the sampling mode (measured on the
    chip, docs/RESULTS.md r4 tile A/B): dense coarse+fine peaks at 4096
    (2.18 s vs 2.27 s at 16384 for 800²) while occupancy peaks at 16384
    (1.45 s vs 1.60 s at 4096 — the shallower 16+48 pipeline needs the
    bigger tile to fill the MXU). Leave unset to get the measured
    optimum for the parsed mode; pass a value to pin it."""
    p.add_argument("--tile", "--chunk", type=int, default=None,
                   help="rays per compiled dispatch (default: 4096 dense, "
                        "16384 with --use_occupancy — measured optima)")


def resolve_tile(args) -> int:
    """The parsed --tile, or the measured per-mode optimum (see
    :func:`add_tile_flag`)."""
    if args.tile is not None:
        return args.tile
    return 16384 if getattr(args, "use_occupancy", False) else 4096


def build_occ_grid(args, rc, params, parser):
    """One-shot occupancy grid from a loaded checkpoint, or None.

    The trainer maintains its grid online (EMA refreshes during training);
    a render-only process rebuilds one from the trained weights
    (ops/occupancy.build_grid). parser.error when --aabb is missing."""
    if not args.use_occupancy:
        return None
    if rc.aabb is None:
        parser.error("--use_occupancy requires --aabb")
    import jax

    from nerfmlp_tpu.ops.occupancy import build_grid

    grid = build_grid(params, rc, jax.random.PRNGKey(0),
                      resolution=args.occ_grid_size)
    print(f"occupancy grid {args.occ_grid_size}^3 built from checkpoint")
    return grid


def add_shard_flag(p) -> None:
    """--shard_render for checkpoint-consuming scripts: render each frame
    through :func:`nerfmlp_tpu.parallel.render_image_sharded` (pixel grid
    sharded over ALL visible devices, params replicated) instead of the
    local tiled renderer. The multi-chip inference path; on one device it
    falls back to the local renderer with a note."""
    p.add_argument("--shard_render", action="store_true",
                   help="shard each frame's pixel grid over all visible "
                        "devices (multi-chip inference); params replicate, "
                        "tiles render concurrently on every chip")


def render_frame(args, params, o, d, H, W, rc, occ_grid=None,
                 viewdirs=None):
    """One (H, W, 3) frame via the local tiled renderer or — under
    --shard_render with >1 device — the mesh-sharded renderer.

    ``--tile`` keeps its meaning as rays per dispatch in both modes: the
    sharded path divides it across the mesh so each chip's tile (and the
    compiled program's per-device shapes) stays comparable.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    tile = resolve_tile(args)
    if getattr(args, "shard_render", False):
        if jax.device_count() > 1:
            from nerfmlp_tpu.parallel.mesh import make_mesh
            from nerfmlp_tpu.parallel.render_parallel import (
                render_image_sharded,
            )

            mesh = make_mesh()
            n_dev = mesh.shape["data"]
            per_dev = max(256, -(-tile // n_dev))
            return render_image_sharded(
                params, np.asarray(o), np.asarray(d), H, W, rc, mesh,
                tile=per_dev, occ_grid=occ_grid, viewdirs=viewdirs,
            )["rgb_map"]
        print("--shard_render: one visible device; using the local renderer")
    from nerfmlp_tpu.ops.render import render_image

    return np.asarray(render_image(
        params, jnp.asarray(o), jnp.asarray(d), H, W, rc,
        tile=tile, viewdirs=viewdirs, occ_grid=occ_grid,
    ))


def dataset_kwargs(args) -> dict:
    """Loader kwargs for the parsed --dataset_type + flags (pairs with
    :func:`dataset_class` / :func:`add_llff_flags`)."""
    if args.dataset_type == "llff":
        return {
            "use_ndc": not args.no_ndc,
            "spherify": args.spherify,
            "factor": args.factor,
            "llffhold": args.llffhold,
            "keep_aspect": not getattr(args, "no_aspect_snap", False),
        }
    if args.dataset_type == "deepvoxels":
        return {"shape": args.shape}
    return {}


def dataset_class(dataset_type: str):
    """Loader class for an oracle ``--dataset_type`` value
    (llff / blender / deepvoxels, example/run_nerf.py:533-534)."""
    if dataset_type == "llff":
        from nerfmlp_tpu.data.llff import LLFFDataset

        return LLFFDataset
    if dataset_type == "deepvoxels":
        from nerfmlp_tpu.data.deepvoxels import DeepVoxelsDataset

        return DeepVoxelsDataset
    from nerfmlp_tpu.data.blender import BlenderDataset

    return BlenderDataset


def params_template(rc) -> Dict:
    """``{"coarse": ..., ["fine": ...]}`` init pytree matching ``rc``'s
    architecture — the template :func:`load_params_any` needs to restore a
    .ckpt (the fine entry matters when the fine net's shape differs)."""
    import jax

    from nerfmlp_tpu.models.mlp import init_model

    key = jax.random.PRNGKey(0)
    template = {"coarse": init_model(key, rc.model_config())}
    if rc.separate_fine:
        template["fine"] = init_model(key, rc.model_config(fine=True))
    return template
