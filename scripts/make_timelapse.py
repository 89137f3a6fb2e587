#!/usr/bin/env python
"""Training-evolution time-lapse: compile a run's periodic holdout renders
into one video — the reference's planned "Training Evolution Time-lapse"
(VIDEOS.md:9-44: fixed viewpoint, render every N iterations, PNG sequence
-> video), which that repo never implemented.

The frames come for free from training: ``--i_img N`` makes the Trainer
dump ``val_{step:06d}.png`` of the same held-out view every N steps
(train/loop.py); this script just orders and encodes them.

  python scripts/train.py ... --i_img 1000
  python scripts/make_timelapse.py --run_dir outputs/run1 --fps 10
"""

import argparse
import os
import re
import sys

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_frames(run_dir: str, pattern: str = r"val_(\d+)\.png"):
    """(step, path) pairs for every matching frame, ordered by step."""
    frames = []
    rx = re.compile(pattern)
    for name in os.listdir(run_dir):
        m = rx.fullmatch(name)
        if m:
            frames.append((int(m.group(1)), os.path.join(run_dir, name)))
    return sorted(frames)


def main(argv=None):
    p = argparse.ArgumentParser(description="Compile training time-lapse")
    p.add_argument("--run_dir", type=str, required=True,
                   help="training save_dir holding val_{step}.png dumps")
    p.add_argument("--out", type=str, default=None,
                   help="output base path (default <run_dir>/timelapse)")
    p.add_argument("--fps", type=int, default=10,
                   help="VIDEOS.md spec: 10 FPS, ~200 frames for 20 s")
    p.add_argument("--pattern", type=str, default=r"val_(\d+)\.png",
                   help="frame filename regex with a step capture group")
    args = p.parse_args(argv)

    from nerfmlp_tpu.utils.image import load_png, write_video

    if not os.path.isdir(args.run_dir):
        print(f"run_dir not found: {args.run_dir}")
        return None
    frames = collect_frames(args.run_dir, args.pattern)
    if not frames:
        print(f"no frames matching {args.pattern!r} in {args.run_dir} — "
              f"train with --i_img N to produce them")
        return None
    # write_video quantizes float frames itself (utils/image.py).
    imgs = [load_png(path) for _, path in frames]
    base = args.out or os.path.join(args.run_dir, "timelapse")
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    out = write_video(base, imgs, fps=args.fps)
    print(f"{len(imgs)} frames (steps {frames[0][0]:,} -> {frames[-1][0]:,}) "
          f"-> {out}")
    return out


if __name__ == "__main__":
    main()
