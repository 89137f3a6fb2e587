#!/usr/bin/env python
"""Novel-view synthesis with custom look-at cameras and focal zoom —
reference zoom_example.py: 4 zoom scenarios varying camera distance and
focal multiplier, per-scenario near/far = distance -/+ 1.5.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


SCENARIOS = [
    # (name, eye, focal multiplier) — the reference's four scenarios
    # (zoom_example.py:75-100): camera position + telephoto factor.
    ("normal_distance", (2.0, 2.0, 2.0), 1.0),
    ("telephoto_zoom", (3.0, 3.0, 3.0), 2.5),
    ("extreme_closeup", (1.2, 1.2, 1.2), 1.5),
    ("detail_shot", (0.8, 1.5, 0.8), 3.0),
]


def main(argv=None):
    p = argparse.ArgumentParser(description="Zoom / custom-camera rendering")
    p.add_argument("--datadir", type=str, required=True,
                   help="dataset dir (for focal / camera_angle_x)")
    p.add_argument("--ckpt", type=str, required=True, help=".ckpt or .npy")
    p.add_argument("--out_dir", type=str, default="outputs/zoom_examples",
                   help="reference output dir (zoom_example.py:164)")
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=64)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
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
    # Occupancy-trained checkpoints render with their grid rebuilt from
    # the weights (docs/RESULTS.md protocol caveat) — same flags as the
    # other render CLIs.
    add_occupancy_flags(p)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.ops.rays import get_rays_np, look_at_matrix
    from nerfmlp_tpu.ops.render import render_image
    from nerfmlp_tpu.train.checkpoint import load_params_any

    os.makedirs(args.out_dir, exist_ok=True)
    # Only the focal is needed — read camera_angle_x directly instead of
    # decoding every training image + precomputing all rays.
    import json

    with open(os.path.join(args.datadir, "transforms_train.json")) as f:
        cam_angle_x = json.load(f)["camera_angle_x"]
    base_focal = 0.5 * args.size / np.tan(0.5 * cam_angle_x)

    # One frozen config -> ONE compiled tile program for all 4 scenarios
    # (render_image takes per-call near/far at runtime); pallas needs bf16
    # (render_video.py pairs them the same way — fp32+pallas is guarded
    # off by the renderer and would silently take the slow path).
    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        perturb=False, use_pallas=args.use_pallas,
        compute_dtype="bfloat16" if args.use_pallas else "float32",
        separate_fine=args.separate_fine, **occupancy_fields(args),
        **arch_fields(args),
    )
    params = load_params_any(args.ckpt, params_template(rc), rc.model_config())
    occ_grid = build_occ_grid(args, rc, params, p)

    for name, eye, fmul in SCENARIOS:
        eye = np.asarray(eye, dtype=np.float32)
        dist = float(np.linalg.norm(eye))
        near, far = max(0.1, dist - 1.5), dist + 1.5
        # up=(0,1,0): the reference's look_at convention
        # (zoom_example.py:21) — the repo default up is z-up, which would
        # roll the camera relative to the reference's PNGs.
        pose = look_at_matrix(eye, np.zeros(3), up=np.array([0.0, 1.0, 0.0]))
        o, d = get_rays_np(args.size, args.size, base_focal * fmul, pose)
        img = np.asarray(render_image(
            params,
            jnp.asarray(o.reshape(-1, 3).copy()),
            jnp.asarray(d.reshape(-1, 3)),
            args.size, args.size, rc, near=near, far=far,
            occ_grid=occ_grid,
        ))
        # Reference artifact names: {scenario}.png (reference :164).
        out = os.path.join(args.out_dir, f"{name}.png")
        Image.fromarray((np.clip(img, 0, 1) * 255).round().astype(np.uint8)).save(out)
        print(f"{name}: dist {dist:.2f}, focal x{fmul}, near/far "
              f"{near:.2f}/{far:.2f} -> {out}")


if __name__ == "__main__":
    main()
