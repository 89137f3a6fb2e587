#!/usr/bin/env python
"""Minimal validation-free trainer — "test if the model can learn properly"
(reference scripts/train_only.py:4). Short runs, tensor-math PSNR, periodic
checkpoints, final loss/PSNR plot.
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


def main(argv=None):
    p = argparse.ArgumentParser(description="Minimal NeRF training (learning smoke test)")
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--img_wh", type=int, nargs=2, default=[64, 64])
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--iters", type=int, default=10000)  # reference default
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--save_dir", type=str, default="outputs/train_only")
    p.add_argument("--N_samples", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=128)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false", default=True)
    args = p.parse_args(argv)

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.data.blender import BlenderDataset
    from nerfmlp_tpu.data.pipeline import RayBatchLoader
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step
    from nerfmlp_tpu.train.checkpoint import save_checkpoint, save_metrics_json

    os.makedirs(args.save_dir, exist_ok=True)
    ds = BlenderDataset(args.datadir, "train", img_wh=tuple(args.img_wh))
    near, far = ds.dynamic_near_far()
    print(f"near/far: {near:.3f}/{far:.3f} | rays: {len(ds):,}")

    rc = RenderConfig(
        N_samples=args.N_samples, N_importance=args.N_importance,
        near=near, far=far, perturb=True,
        compute_dtype=args.compute_dtype, use_pallas=args.use_pallas,
    )
    tc = TrainConfig(batch_size=args.batch_size, iters=args.iters, lr=args.lr)
    state = create_train_state(rc, tc)
    step_fn = make_train_step(rc, tc)
    loader = RayBatchLoader.from_dataset(ds, tc.batch_size)

    losses, psnrs, iter_times = [], [], []
    t0 = time.time()
    t_prev = t0
    for step in range(1, args.iters + 1):
        state, m = step_fn(state, jnp.asarray(loader.next_batch()))
        now = time.time()
        iter_times.append(now - t_prev)
        t_prev = now
        if step % 100 == 0:
            loss = float(m["loss"])
            # Tensor-math PSNR like the reference (train_only.py:23-29).
            psnr = float(20.0 * np.log10(1.0 / np.sqrt(max(loss, 1e-12))))
            losses.append(loss)
            psnrs.append(psnr)
            print(f"iter {step:6d} | loss {loss:.6f} | psnr {psnr:.2f} | "
                  f"{step / (time.time() - t0):,.0f} it/s")
        if step % 1000 == 0:
            save_checkpoint(os.path.join(args.save_dir, f"model_{step}.ckpt"),
                            state.params)
            save_metrics_json(
                os.path.join(args.save_dir, f"metrics_{step}.json"),
                {"step": step, "losses": losses, "psnrs": psnrs},
            )

    save_checkpoint(os.path.join(args.save_dir, "model_final.ckpt"), state.params)
    save_metrics_json(
        os.path.join(args.save_dir, "final_metrics.json"),
        {
            # Reference final_metrics keys (reference train_only.py:239-252)
            # alongside the compact per-100-step series.
            "train_losses": losses, "train_psnrs": psnrs,
            "final_loss": losses[-1] if losses else None,
            "final_psnr": psnrs[-1] if psnrs else None,
            "total_training_time": time.time() - t0,
            "iteration_times": iter_times,  # per-step (reference :242)
            "losses": losses, "psnrs": psnrs, "iters": args.iters,
            "config": {"batch_size": args.batch_size,
                       "learning_rate": args.lr,
                       "total_iterations": args.iters,
                       "img_wh": list(args.img_wh)},
        },
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
        xs = np.arange(1, len(losses) + 1) * 100
        a1.semilogy(xs, losses); a1.set_title("loss"); a1.set_xlabel("iter")
        a2.plot(xs, psnrs); a2.set_title("train PSNR (dB)"); a2.set_xlabel("iter")
        fig.tight_layout()
        # The reference's artifact name (reference train_only.py:235).
        fig.savefig(os.path.join(args.save_dir, "training_progress.png"), dpi=110)
        print(f"saved {args.save_dir}/training_progress.png")
    except Exception as e:
        print(f"(plot skipped: {e})")
    if losses:
        print(f"final loss {losses[-1]:.6f}, PSNR {psnrs[-1]:.2f}")
    else:  # runs shorter than one 100-step log interval
        print(f"done ({args.iters} iters; below the 100-step metric interval)")
    return losses, psnrs


if __name__ == "__main__":
    main()
