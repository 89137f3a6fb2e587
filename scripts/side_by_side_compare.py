#!/usr/bin/env python
"""Pure-PIL side-by-side concat of any rendered image vs its ground truth
(reference scripts/side_by_side_compare.py). Accepts either an index into
the dataset split (resolves ``r_{i}.png``) or explicit paths.
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


def get_gt_path(datadir: str, split: str, idx: int) -> str:
    return os.path.join(datadir, split, f"r_{idx}.png")


def main(argv=None):
    p = argparse.ArgumentParser(description="Concat two images side by side")
    # Reference positional interface (reference :28-32): rendered + output
    # as positionals; flags remain as the explicit alternative.
    p.add_argument("rendered_pos", nargs="?", default=None,
                   metavar="rendered.png")
    p.add_argument("out_pos", nargs="?", default=None, metavar="output.png")
    p.add_argument("--rendered", type=str, default=None)
    p.add_argument("--gt", "--gt_path", type=str, default=None,
                   help="explicit GT path")
    p.add_argument("--datadir", "--gt_dir", type=str, default=None,
                   help="dataset root (reference flag name: --gt_dir)")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--index", "--gt_idx", type=int, default=None,
                   help="GT by dataset index (r_{i}.png; reference flag "
                        "name: --gt_idx)")
    p.add_argument("--out", type=str, default="outputs/side_by_side.png")
    args = p.parse_args(argv)
    if args.rendered is not None and args.rendered_pos is not None \
            and args.out_pos is None:
        # `script out.png --rendered r.png`: the lone positional is the
        # OUTPUT (it must not be silently discarded).
        args.out_pos = args.rendered_pos
        args.rendered_pos = None
    if args.rendered is None:
        args.rendered = args.rendered_pos
    if args.rendered is None:
        p.error("provide the rendered image (positional or --rendered)")
    if args.out_pos is not None:
        args.out = args.out_pos

    import numpy as np
    from PIL import Image

    gt_path = args.gt
    if gt_path is None:
        if args.datadir is None or args.index is None:
            p.error("provide --gt or (--datadir and --index)")
        gt_path = get_gt_path(args.datadir, args.split, args.index)

    a = Image.open(args.rendered).convert("RGB")
    b = Image.open(gt_path).convert("RGB")
    if a.size != b.size:
        b = b.resize(a.size, Image.Resampling.LANCZOS)
    # Reference panel convention: [ground truth | rendered] (reference :50).
    side = np.concatenate([np.asarray(b), np.asarray(a)], axis=1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray(side).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
