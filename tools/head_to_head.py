"""Head-to-head convergence A/B: the LIVE torch reference trainer vs ours.

VERDICT r4 item 3: every convergence number so far was our-framework-vs-
our-framework; this harness trains BOTH frameworks on the same scene and
split for the same number of steps and reports each one's held-out PSNR,
converting "matching-or-beating the reference's learning behavior" from
inference into measurement.

Reference semantics reproduced exactly (each side keeps its NATIVE init
and data shuffling — those are part of the trainer under test):
  * torch side: the hot loop of /root/reference/scripts/train.py:365-388
    (shuffled ray DataLoader, fine-only MSE on `_render_rays`, Adam
    lr 5e-4, StepLR(250000, 0.1) stepped per iteration) with the dynamic
    near/far of train.py:233-253; held-out views rendered with the
    reference's own chunked `renderer.render` (render_example.py:239-312).
  * our side: the shipped Trainer (nerfmlp_tpu/train/loop.py) at the
    same config, evaluated with our own inference renderer.

Usage:  python tools/head_to_head.py --datadir <blender scene> \
            --img_wh 64 64 --batch 128 --iters 2000 [--out report.json]

The defaults mirror the reference's documented smoke config ("Quick
Testing": 64x64, batch 128, lr 5e-4, README.md:226-240).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = "/root/reference"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def run_reference(
    datadir: str,
    img_wh=(64, 64),
    batch: int = 128,
    iters: int = 2000,
    lr: float = 5e-4,
    N_samples: int = 64,
    N_importance: int = 128,
    val_views: int = 2,
    threads: int = 0,
    seed: int = 0,
    log_every: int = 500,
) -> dict:
    """Train the live torch reference on CPU; return losses + val PSNR."""
    import torch
    from torch.utils.data import DataLoader

    if threads:
        torch.set_num_threads(threads)
    torch.manual_seed(seed)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import nerfmlp as ref

    ds = ref.NeRFDataset(datadir, "train", img_wh=tuple(img_wh))
    loader = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=0)
    device = torch.device("cpu")
    model = ref.NeRFMLP().to(device)

    # Dynamic near/far incl. spherical detection (train.py:233-253) — our
    # loader reproduces the same numbers (parity-tested); recompute here
    # with the reference's own math to stay self-contained.
    poses = ds.poses if hasattr(ds, "poses") else None
    positions = np.array([p[:3, 3] for p in poses])
    dists = np.linalg.norm(positions, axis=1)
    if dists.std() < 0.01:
        center = positions.mean(axis=0)
        radius = np.linalg.norm(positions - center, axis=1).max()
        near, far = max(0.1, radius * 0.5), radius * 2.0
    else:
        near, far = max(0.1, dists.min() - 0.5), dists.max() + 0.5

    renderer = ref.NeRFRenderer(
        model, device, near=near, far=far,
        N_samples=N_samples, N_importance=N_importance,
    )
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=250000, gamma=0.1)

    losses = []
    t0 = time.time()
    step = 0
    model.train()
    while step < iters:
        for b in loader:
            if step >= iters:
                break
            ray_o = b["ray_o"].to(device)
            ray_d = b["ray_d"].to(device)
            target = b["rgb"].to(device)
            rgb = renderer._render_rays(ray_o, ray_d)["rgb_map"]
            loss = torch.mean((rgb - target) ** 2)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
            losses.append(float(loss.detach()))
            step += 1
            if log_every and step % log_every == 0:
                print(f"[torch ref] step {step}/{iters} "
                      f"loss {losses[-1]:.5f} "
                      f"({(time.time() - t0) / step * 1000:.0f} ms/it)",
                      flush=True)
    train_s = time.time() - t0

    # Held-out eval with the reference's own chunked renderer.
    val = ref.NeRFDataset(datadir, "val", img_wh=tuple(img_wh))
    W, H = img_wh
    model.eval()
    renderer.perturb = 0.0  # inference semantics (render_example.py:227-236)
    psnrs = []
    with torch.no_grad():
        for v in range(min(val_views, len(val.poses))):
            import torch as _t

            sl = slice(v * H * W, (v + 1) * H * W)
            o = _t.from_numpy(val.all_rays_o[sl]).float().to(device)
            d = _t.from_numpy(val.all_rays_d[sl]).float().to(device)
            # render() returns the (H, W, 3) image directly (renderer.py:46)
            img = renderer.render(o, d, H, W, val.focal).cpu().numpy()
            gt = val.all_rgbs[sl].reshape(H, W, 3)
            psnrs.append(_psnr(img, gt))
    return {
        "framework": "torch-reference",
        "iters": iters,
        "final_loss": float(np.mean(losses[-50:])),
        "val_psnrs": psnrs,
        "val_psnr": float(np.mean(psnrs)),
        "train_seconds": train_s,
        "near": float(near), "far": float(far),
    }


def run_ours(
    datadir: str,
    img_wh=(64, 64),
    batch: int = 128,
    iters: int = 2000,
    lr: float = 5e-4,
    N_samples: int = 64,
    N_importance: int = 128,
    val_views: int = 2,
    seed: int = 0,
    save_dir: str | None = None,
) -> dict:
    """Train our shipped Trainer at the same config; our own eval path."""
    import tempfile

    import jax

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.ops.render import render_image
    from nerfmlp_tpu.train.loop import Trainer
    from nerfmlp_tpu.train.metrics import psnr_images

    ds = BlenderDataset(datadir, "train", img_wh=tuple(img_wh))
    val = BlenderDataset(datadir, "val", img_wh=tuple(img_wh))
    near, far = ds.dynamic_near_far()
    rc = RenderConfig(
        N_samples=N_samples, N_importance=N_importance,
        near=near, far=far, perturb=True,
    )
    tc = TrainConfig(batch_size=batch, iters=iters, lr=lr, seed=seed,
                     quick_val_interval=0, full_val_interval=0,
                     log_interval=500)
    save_dir = save_dir or tempfile.mkdtemp(prefix="h2h_ours_")
    t0 = time.time()
    trainer = Trainer(rc, tc, ds, val, None, save_dir=save_dir, verbose=False)
    metrics = trainer.train()
    train_s = time.time() - t0

    import dataclasses

    rc_eval = dataclasses.replace(rc, perturb=False, raw_noise_std=0.0)
    params = jax.device_get(trainer.state.params)
    psnrs = []
    for v in range(min(val_views, val.n_images)):
        o, d, gt = val.image_rays(v)
        img = np.asarray(render_image(params, o, d, val.H, val.W, rc_eval))
        psnrs.append(psnr_images(img, gt))
    return {
        "framework": "nerfmlp-tpu",
        "iters": iters,
        "final_loss": float(np.mean(metrics["train_losses"][-50:])),
        "val_psnrs": [float(p) for p in psnrs],
        "val_psnr": float(np.mean(psnrs)),
        "train_seconds": train_s,
        "near": float(near), "far": float(far),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="Reference-vs-ours convergence A/B")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--img_wh", type=int, nargs=2, default=[64, 64])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--val_views", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--threads", type=int, default=4,
                   help="torch CPU threads (bound it: a saturated host "
                        "slows concurrent TPU compiles 5-10x, CLAUDE.md)")
    p.add_argument("--skip", choices=["none", "ref", "ours"], default="none")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    kw = dict(datadir=args.datadir, img_wh=tuple(args.img_wh),
              batch=args.batch, iters=args.iters, lr=args.lr,
              N_samples=args.N_samples, N_importance=args.N_importance,
              val_views=args.val_views, seed=args.seed)
    report = {"config": {**kw, "img_wh": list(args.img_wh)}}
    if args.skip != "ours":
        report["ours"] = run_ours(**kw)
        print(f"[ours] val PSNR {report['ours']['val_psnr']:.2f} dB "
              f"in {report['ours']['train_seconds']:.0f}s", flush=True)
    if args.skip != "ref":
        report["reference"] = run_reference(**kw, threads=args.threads)
        print(f"[torch ref] val PSNR {report['reference']['val_psnr']:.2f} dB "
              f"in {report['reference']['train_seconds']:.0f}s", flush=True)
    if "ours" in report and "reference" in report:
        report["delta_db"] = round(
            report["ours"]["val_psnr"] - report["reference"]["val_psnr"], 3
        )
        print(f"DELTA (ours - reference): {report['delta_db']:+.2f} dB",
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
