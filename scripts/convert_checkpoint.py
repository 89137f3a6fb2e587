#!/usr/bin/env python
"""Convert checkpoints between every format the ecosystem speaks.

One command closes the interop loop across SURVEY §5.4's formats:

  * ``.ckpt``  — this framework's msgpack pytree (params-only files AND
    full training states like ``metrics_latest.ckpt``, whose params are
    extracted),
  * ``.npy``   — the official TF release's object-array weight list
    (example/run_nerf.py:835-839 ordering),
  * ``.pth``   — the torch reference's checkpoints: bare
    ``model.state_dict()`` files and composite training dicts
    (/root/reference/scripts/train.py:453,468-472,498,564), which its
    render CLI loads (/root/reference/scripts/render_example.py:166-207).

so a reference user can, e.g., take a trained ``model_best.pth``,
convert it to ``.ckpt``, and keep training here — or export a
``.ckpt`` trained on TPU back to ``.pth`` for the reference's tooling.

``.npy``/``.pth`` hold ONE network; ``--net fine`` selects the fine
net of a two-net ``.ckpt`` (default: coarse — the reference shares one
model for both passes, nerfmlp/renderer.py:76).
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

_FORMATS = (".ckpt", ".npy", ".pth", ".pt")


def _fmt(path: str) -> str:
    for ext in _FORMATS:
        if path.endswith(ext):
            return ".pth" if ext == ".pt" else ext
    raise SystemExit(
        f"unrecognized checkpoint extension on {path!r} "
        f"(expected one of {', '.join(_FORMATS)})"
    )


def _load_params(path: str, template, cfg):
    """Any format -> {"coarse": ..., ["fine": ...]} params pytree
    (load_params_any also extracts params from full TrainState files —
    optimizer moments have no analog in .npy/.pth)."""
    from nerfmlp_tpu.train.checkpoint import load_params_any

    return load_params_any(path, template, cfg)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert between .ckpt / .npy / .pth checkpoints"
    )
    p.add_argument("--in", dest="src", required=True,
                   help="source checkpoint (.ckpt, .npy, .pth/.pt)")
    p.add_argument("--out", dest="dst", required=True,
                   help="destination (format chosen by extension)")
    p.add_argument("--net", choices=["coarse", "fine"], default=None,
                   help="which network to export: for .npy/.pth (one-model "
                        "formats) the default is coarse; for a .ckpt "
                        "destination the default keeps EVERY net, while an "
                        "explicit --net writes just that one")
    p.add_argument("--separate_fine", action="store_true",
                   help="source .ckpt holds distinct coarse/fine nets")
    from nerfmlp_tpu.utils.cli import (
        add_arch_flags, arch_fields, params_template,
    )
    add_arch_flags(p)
    args = p.parse_args(argv)

    from nerfmlp_tpu.config import RenderConfig

    rc = RenderConfig(separate_fine=args.separate_fine, **arch_fields(args))
    cfg = rc.model_config()
    params = _load_params(args.src, params_template(rc), cfg)

    dst_fmt = _fmt(args.dst)
    os.makedirs(os.path.dirname(args.dst) or ".", exist_ok=True)
    if args.net == "fine" and "fine" not in params:
        raise SystemExit(
            f"--net fine: {args.src} holds no separate fine network "
            f"(nets: {list(params)})"
        )
    if dst_fmt == ".ckpt":
        from nerfmlp_tpu.train.checkpoint import save_checkpoint

        if args.net is not None:
            # Explicit selection must not be silently ignored: write a
            # one-net checkpoint holding just that network.
            params = {"coarse": params[args.net]}
        save_checkpoint(args.dst, params)
        nets = "+".join(params.keys()) + (
            f" (from {args.net})" if args.net else ""
        )
        print(f"wrote {args.dst} ({nets})")
        return args.dst

    net_name = args.net or "coarse"
    net = params[net_name]
    net_cfg = rc.model_config(fine=net_name == "fine")
    if dst_fmt == ".npy":
        from nerfmlp_tpu.train.checkpoint import save_params_npy

        save_params_npy(args.dst, net, net_cfg)
    else:  # .pth
        import torch

        from nerfmlp_tpu.models.import_torch import params_to_torch_state_dict

        torch.save(params_to_torch_state_dict(net, net_cfg), args.dst)
    print(f"wrote {args.dst} ({net_name} net)")
    return args.dst


if __name__ == "__main__":
    main()
