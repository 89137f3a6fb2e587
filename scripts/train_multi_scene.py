#!/usr/bin/env python
"""Multi-scene batched training: N scenes, one NeRF per scene, scenes
sharded one-per-device over the mesh (BASELINE config 5).

Example (8 scenes across a v5e-8 slice, or 8 fake CPU devices):
  python scripts/train_multi_scene.py --datadirs /data/lego /data/chair ... \\
      --img_wh 128 128 --iters 20000 --save_dir outputs/multi
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


def unique_scene_names(names):
    """Disambiguate duplicate scene basenames (e.g. /v1/lego and /v2/lego)
    so no per-scene checkpoint silently clobbers another's. Suffix
    candidates are checked against the ORIGINAL list and all assigned
    names — a rename must not collide with a literal pre-existing name
    either (dirs a_0, a, a once produced two "a_0" entries)."""
    orig = list(names)
    used = set()
    out = []
    for name in orig:
        cand = name
        if orig.count(name) > 1 or cand in used:
            k = 0
            cand = f"{name}_{k}"
            while cand in used or cand in orig:
                k += 1
                cand = f"{name}_{k}"
        used.add(cand)
        out.append(cand)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Train one NeRF per scene, sharded")
    p.add_argument("--datadirs", type=str, nargs="+", required=True)
    p.add_argument("--img_wh", type=int, nargs=2, default=[128, 128])
    p.add_argument("--batch_size", type=int, default=1024,
                   help="rays per scene per step")
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--save_dir", type=str, default="outputs/multi_scene")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    p.add_argument("--dataset_types", type=str, nargs="+", default=["blender"],
                   choices=["blender", "llff", "deepvoxels"],
                   help="one value for all scenes, or one per --datadir "
                        "(oracle --dataset_type, per scene)")
    p.add_argument("--spherify", action="store_true",
                   help="LLFF scenes: 360 capture (metric rays)")
    p.add_argument("--factor", type=int, default=0,
                   help="LLFF scenes: images_{factor}/ directory")
    p.add_argument("--shape", type=str, default="cube",
                   help="DeepVoxels scenes: object shape")
    from nerfmlp_tpu.utils.cli import add_occupancy_flags

    add_occupancy_flags(p)
    p.add_argument("--occ_update_every", type=int, default=64,
                   help="training steps between per-scene grid refreshes")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.pipeline import RayBatchLoader
    from nerfmlp_tpu.parallel.mesh import make_mesh
    from nerfmlp_tpu.parallel.multi_scene import (
        create_multi_scene_grids,
        create_multi_scene_state,
        make_multi_scene_dp_grid_update,
        make_multi_scene_dp_step,
        make_multi_scene_grid_update,
        make_multi_scene_step,
        make_scene_mesh,
        scene_sharding,
    )
    from nerfmlp_tpu.train.checkpoint import save_checkpoint
    from nerfmlp_tpu.utils.cli import dataset_class

    n_scenes = len(args.datadirs)
    n_dev = len(jax.devices())
    if n_scenes % n_dev != 0 and n_dev % n_scenes != 0:
        p.error(f"{n_scenes} scenes vs {n_dev} devices: need one to divide "
                f"the other")
    types = args.dataset_types
    if len(types) == 1:
        types = types * n_scenes
    if len(types) != n_scenes:
        p.error(f"--dataset_types: got {len(types)} values for "
                f"{n_scenes} scenes (pass 1 or {n_scenes})")

    def load_scene(datadir, dtype):
        kwargs = {}
        if dtype == "llff":
            kwargs = {"spherify": args.spherify, "factor": args.factor}
        elif dtype == "deepvoxels":
            kwargs = {"shape": args.shape}
        return dataset_class(dtype)(
            datadir, "train", img_wh=tuple(args.img_wh), **kwargs
        )

    datasets = [load_scene(d, t) for d, t in zip(args.datadirs, types)]
    loaders = [
        RayBatchLoader.from_dataset(ds, args.batch_size, seed=i)
        for i, ds in enumerate(datasets)
    ]
    # Per-scene [near, far]: each scene samples its own depth range (the
    # render path takes per-call bounds, ops/render.py:108-141 — a scene
    # with tight bounds must not waste samples on another's envelope, and
    # NDC LLFF scenes live in [0, 1] while blender scenes sit at 2-6).
    bounds = np.asarray(
        [ds.dynamic_near_far() for ds in datasets], np.float32
    )
    for d, t, (nr, fr) in zip(args.datadirs, types, bounds):
        print(f"  {t:10s} {d}: near/far {nr:.2f}/{fr:.2f}")
    print(f"{n_scenes} scenes on {n_dev} devices")

    # white_bkgd is structural (one shared RenderConfig): white composite
    # for blender/deepvoxels, off for LLFF real photos (the single-scene
    # CLI and oracle run_nerf.py:623-628 semantics). Mixed batches take
    # the LLFF setting — warn, since blender scenes then train without
    # their white background.
    white_bkgd = all(t != "llff" for t in types)
    if not white_bkgd and any(t != "llff" for t in types):
        print("⚠️  mixed llff + synthetic scenes share one white_bkgd "
              "setting: using white_bkgd=False (llff semantics) for ALL "
              "scenes — synthetic scenes will train without their white "
              "background composite")
    from nerfmlp_tpu.utils.cli import occupancy_fields

    if args.use_occupancy and args.aabb is None:
        p.error("--use_occupancy requires --aabb")
    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        near=float(bounds[:, 0].min()), far=float(bounds[:, 1].max()),
        perturb=True, white_bkgd=white_bkgd,
        compute_dtype=args.compute_dtype, use_pallas=args.use_pallas,
        occ_update_every=args.occ_update_every,
        **occupancy_fields(args),
    )
    tc = TrainConfig(batch_size=args.batch_size, iters=args.iters, lr=args.lr)

    if n_scenes % n_dev == 0:
        # >= 1 scene per device: shard_map, scenes pinned to chips.
        mesh = make_mesh()
        shard = batch_shard = scene_sharding(mesh)
        step = make_multi_scene_step(rc, tc, mesh, with_bounds=True)
        grid_update = (make_multi_scene_grid_update(rc, mesh)
                       if rc.use_occupancy else None)
        bounds_shard = shard
    else:
        # Fewer scenes than chips: ("scene", "data") mesh — each scene
        # group data-parallelizes its ray batch over n_dev/n_scenes chips.
        mesh = make_scene_mesh(n_scenes, n_dev)
        step, shard, batch_shard = make_multi_scene_dp_step(
            rc, tc, mesh, with_bounds=True
        )
        grid_update = (make_multi_scene_dp_grid_update(rc, mesh)
                       if rc.use_occupancy else None)
        bounds_shard = shard
        print(f"scene x data mesh: {n_scenes} x {n_dev // n_scenes}")
    state = jax.device_put(create_multi_scene_state(n_scenes, rc, tc), shard)
    bounds_dev = jax.device_put(jnp.asarray(bounds), bounds_shard)

    # Per-scene occupancy grids: stacked on the scene axis next to the
    # states, refreshed every --occ_update_every steps from each scene's
    # OWN current weights (the multi-scene analog of the trainer's EMA
    # refresh, train/loop.py).
    grids = None
    if rc.use_occupancy:
        grids = jax.device_put(create_multi_scene_grids(n_scenes, rc), shard)
        print(f"occupancy sampling on: {args.occ_grid_size}^3 grids "
              f"per scene, refresh every {rc.occ_update_every} steps")

    # Mixed loaders can emit (B, 9) [o|d|rgb] and (B, 12) [o|d|viewdir|rgb]
    # rows; widen 9-col scenes with viewdirs = normalize(d) (exactly what
    # the step computes for them anyway) so the stack is rectangular.
    widen = any(ld.pool.shape[-1] == 12 for ld in loaders)

    def scene_batch(ld):
        b = ld.next_batch()
        if widen and b.shape[-1] == 9:
            d = b[:, 3:6]
            vd = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            b = np.concatenate([b[:, :6], vd, b[:, 6:]], axis=-1)
        return b

    os.makedirs(args.save_dir, exist_ok=True)
    for it in range(1, args.iters + 1):
        batch = np.stack([scene_batch(ld) for ld in loaders], axis=0)
        extra = ()
        if grids is not None:
            if (it - 1) % rc.occ_update_every == 0:
                rngs = jax.device_put(
                    jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                        jax.random.PRNGKey(17 + it),
                        jnp.arange(n_scenes, dtype=jnp.uint32),
                    ),
                    shard,
                )
                grids = grid_update(
                    grids, state.params, rngs,
                    jnp.float32(1.0 if it <= rc.occ_warmup_steps else 0.95),
                )
            extra = (grids,)
        state, metrics = step(
            state, jax.device_put(jnp.asarray(batch), batch_shard),
            *extra, bounds_dev
        )
        if it % args.log_interval == 0:
            losses = np.asarray(metrics["loss"])
            psnrs = np.asarray(metrics["psnr"])
            per = " ".join(f"s{i}:{p:.1f}" for i, p in enumerate(psnrs))
            print(f"iter {it:6d} | mean loss {losses.mean():.6f} | PSNR {per}",
                  flush=True)

    # Per-scene final checkpoints (unstack the scene axis).
    host_state = jax.device_get(state)
    names = unique_scene_names([
        os.path.basename(os.path.normpath(d)) or f"scene_{i}"
        for i, d in enumerate(args.datadirs)
    ])
    for i, name in enumerate(names):
        scene_params = jax.tree.map(lambda x, i=i: x[i], host_state.params)
        save_checkpoint(
            os.path.join(args.save_dir, f"model_{name}_final.ckpt"), scene_params
        )
    print(f"saved {n_scenes} per-scene checkpoints to {args.save_dir}")


if __name__ == "__main__":
    main()
