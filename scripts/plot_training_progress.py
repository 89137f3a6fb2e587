#!/usr/bin/env python
"""Training-progress plots from metrics_latest.json — reference
scripts/plot_training_progress.py: 6-panel static figure (loss log-scale,
PSNR, SSIM, overfitting gap, iter-time, text summary) and a ``--live``
mode that re-polls the JSON.
"""

import argparse
import json
import os
import sys
import time

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _xy(steps, ys):
    """Align x/y lengths: histories can outrun val_steps when quick-val
    was skipped (empty split) — a mismatched plot call raises ValueError
    and the best-effort caller swallows the whole figure."""
    n = min(len(steps), len(ys))
    return steps[:n], ys[:n]


def _create_plots_on_axes(axes, m):
    import numpy as np

    val_steps = m.get("val_steps", [])
    tl, tp = m.get("train_losses", []), m.get("train_psnrs", [])
    ql, qp, qs = (
        m.get("quick_val_losses", []),
        m.get("quick_val_psnrs", []),
        m.get("quick_val_ssims", []),
    )

    ax = axes[0]
    if tl:
        ax.semilogy(*_xy(val_steps, tl), label="train")
    if ql:
        ax.semilogy(*_xy(val_steps, ql), label="quick val")
    ax.set_title("Loss (log)"); ax.set_xlabel("iter"); ax.legend()

    ax = axes[1]
    if tp:
        ax.plot(*_xy(val_steps, tp), label="train")
    if qp:
        ax.plot(*_xy(val_steps, qp), label="quick val")
    fvp, fvs = m.get("full_val_psnrs", []), m.get("full_val_steps", [])
    if fvp:
        ax.plot(*_xy(fvs, fvp), "o-", label="full val")
    ax.set_title("PSNR (dB)"); ax.set_xlabel("iter"); ax.legend()

    ax = axes[2]
    if qs:
        ax.plot(*_xy(val_steps, qs))
    ax.set_title("SSIM (quick val)"); ax.set_xlabel("iter")

    ax = axes[3]
    if tl and ql:
        n = min(len(tl), len(ql))
        gap = [abs(a - b) for a, b in zip(tl[:n], ql[:n])]
        ax.semilogy(*_xy(val_steps, gap))
    ax.set_title("|train - val| loss gap (overfitting)"); ax.set_xlabel("iter")

    ax = axes[4]
    it = m.get("iteration_times", [])
    if it:
        it_ms = np.asarray(it[-20000:]) * 1e3
        ax.plot(np.arange(len(it_ms)), it_ms, lw=0.3)
        ax.set_ylim(0, np.percentile(it_ms, 99) * 1.5)
    ax.set_title("iter time (ms)"); ax.set_xlabel("recent iters")

    ax = axes[5]
    ax.axis("off")
    lines = [
        f"step: {m.get('step', 0):,}",
        f"best quick-val PSNR: {m.get('best_val_psnr', 0):.2f} dB",
    ]
    if qp:
        lines.append(f"latest quick-val PSNR: {qp[-1]:.2f} dB")
    if ql:
        lines.append(f"latest quick-val loss: {ql[-1]:.6f}")
    if it:
        lines.append(f"median iter time: {np.median(np.asarray(it)) * 1e3:.1f} ms")
    ax.text(0.02, 0.95, "\n".join(lines), va="top", family="monospace", fontsize=11)
    ax.set_title("summary")


def create_progress_plot(metrics_path, out_path=None, show=False):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(metrics_path) as f:
        m = json.load(f)
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    _create_plots_on_axes(axes.ravel(), m)
    fig.suptitle("NeRF training progress (nerfmlp_tpu)")
    fig.tight_layout()
    out_path = out_path or metrics_path.replace(".json", ".png")
    fig.savefig(out_path, dpi=110)
    if show:
        plt.show()
    plt.close(fig)
    print(f"wrote {out_path}")
    return out_path


def create_comprehensive_report(metrics_path, out_path=None):
    """The reference's end-of-run 3x3 comprehensive figure
    (scripts/train.py:587-695): loss + PSNR convergence up top, then
    overfitting gap, LR schedule, SSIM, iter times, and the full-val
    loss/PSNR series. (The reference plots a CONSTANT lr line and lets
    two top panels overlap — subplot(3,3,(1,2)) vs (1,3); here the grid
    is laid out cleanly and the lr curve is the real decay schedule from
    the run's recorded config.)"""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    with open(metrics_path) as f:
        m = json.load(f)
    steps = m.get("val_steps", [])
    tl, tp = m.get("train_losses", []), m.get("train_psnrs", [])
    ql, qp, qs = (
        m.get("quick_val_losses", []),
        m.get("quick_val_psnrs", []),
        m.get("quick_val_ssims", []),
    )
    fvl, fvp, fvs, fsteps = (
        m.get("full_val_losses", []),
        m.get("full_val_psnrs", []),
        m.get("full_val_ssims", []),
        m.get("full_val_steps", []),
    )

    fig = plt.figure(figsize=(20, 16))

    ax = plt.subplot(3, 3, (1, 2))
    if tl:
        ax.plot(*_xy(steps, tl), "o-", ms=4, color="tab:blue",
                alpha=0.8, label="Training Loss")
    if ql:
        ax.plot(*_xy(steps, ql), "s-", ms=4, color="tab:red",
                alpha=0.8, label="Validation Loss")
    ax.set_xlabel("Iteration"); ax.set_ylabel("Loss"); ax.set_yscale("log")
    ax.set_title("Training vs Validation Loss Convergence", fontweight="bold")
    ax.legend(); ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 3)
    if tp:
        ax.plot(*_xy(steps, tp), "o-", ms=4, color="tab:green",
                alpha=0.8, label="Training PSNR")
    if qp:
        ax.plot(*_xy(steps, qp), "s-", ms=4, color="tab:orange",
                alpha=0.8, label="Validation PSNR")
    ax.set_xlabel("Iteration"); ax.set_ylabel("PSNR (dB)")
    ax.set_title("Training vs Validation PSNR", fontweight="bold")
    ax.legend(); ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 4)
    if tl and ql:
        n = min(len(tl), len(ql))
        ax.plot(*_xy(steps, [abs(a - b) for a, b in zip(tl[:n], ql[:n])]),
                "o-", ms=3, color="tab:purple", alpha=0.8)
        ax.set_yscale("log")
    ax.set_xlabel("Iteration"); ax.set_ylabel("|Train - Val Loss|")
    ax.set_title("Overfitting Indicator", fontweight="bold")
    ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 5)
    cfg_train = m.get("config", {}).get("train", {})
    lr0 = cfg_train.get("lr", 5e-4)
    rate = cfg_train.get("lr_decay_rate", 0.1)
    dsteps = max(cfg_train.get("lr_decay_steps", 250_000), 1)
    if steps:
        ax.plot(steps, [lr0 * rate ** (s / dsteps) for s in steps],
                "o-", ms=3, color="tab:brown", alpha=0.8)
        ax.set_yscale("log")
    ax.set_xlabel("Iteration"); ax.set_ylabel("Learning Rate")
    ax.set_title("Learning Rate Schedule", fontweight="bold")
    ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 6)
    if qs:
        ax.plot(*_xy(steps, qs), "s-", ms=3, color="tab:green",
                alpha=0.8, label="Quick Val SSIM")
    if fvs:
        ax.plot(*_xy(fsteps, fvs), "^-", ms=4, color="tab:orange",
                alpha=0.8, label="Full Val SSIM")
    ax.set_xlabel("Iteration"); ax.set_ylabel("SSIM")
    ax.set_title("SSIM Progress", fontweight="bold")
    ax.legend(); ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 7)
    it = m.get("iteration_times", [])
    if it:
        ax.plot(np.asarray(it[-1000:]), alpha=0.6, color="tab:purple")
    ax.set_xlabel("Recent Iterations"); ax.set_ylabel("Time (seconds)")
    ax.set_title("Training Time per Iteration", fontweight="bold")
    ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 8)
    if fvl:
        ax.plot(*_xy(fsteps, fvl), "^-", ms=4, color="tab:red",
                alpha=0.8, label="Full Val Loss")
        ax.set_yscale("log")
        ax.legend()
    ax.set_xlabel("Iteration"); ax.set_ylabel("Loss")
    ax.set_title("Full Validation Loss", fontweight="bold")
    ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 9)
    if fvp:
        ax.plot(*_xy(fsteps, fvp), "^-", ms=4, color="tab:orange",
                alpha=0.8, label="Full Val PSNR")
        ax.legend()
    ax.set_xlabel("Iteration"); ax.set_ylabel("PSNR (dB)")
    ax.set_title("Full Validation PSNR", fontweight="bold")
    ax.grid(True, alpha=0.3)

    plt.tight_layout()
    out_path = out_path or os.path.join(
        os.path.dirname(metrics_path), "comprehensive_metrics.png"
    )
    plt.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close()
    print(f"wrote {out_path}")
    return out_path


def create_convergence_plot(metrics_path, out_path=None):
    """Focused 2-panel loss/PSNR convergence figure (the reference's
    end-of-training companion to the comprehensive report,
    scripts/train.py:697-707)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(metrics_path) as f:
        m = json.load(f)
    steps = m.get("val_steps", [])
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    if m.get("train_losses"):
        a1.semilogy(*_xy(steps, m["train_losses"]), label="train")
    if m.get("quick_val_losses"):
        a1.semilogy(*_xy(steps, m["quick_val_losses"]), label="val")
    a1.set_title("Convergence: loss"); a1.set_xlabel("iter"); a1.legend()
    if m.get("train_psnrs"):
        a2.plot(*_xy(steps, m["train_psnrs"]), label="train")
    if m.get("quick_val_psnrs"):
        a2.plot(*_xy(steps, m["quick_val_psnrs"]), label="val")
    a2.set_title("Convergence: PSNR (dB)"); a2.set_xlabel("iter"); a2.legend()
    fig.tight_layout()
    out_path = out_path or metrics_path.replace(".json", "_convergence.png")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    print(f"wrote {out_path}")
    return out_path


def animate_progress(metrics_path, interval_s=5.0, out_path=None):
    """Live mode: re-render the figure whenever the JSON changes
    (reference's FuncAnimation loop, :158-207; headless-safe here)."""
    last_mtime = 0.0
    while True:
        try:
            mtime = os.path.getmtime(metrics_path)
            if mtime > last_mtime:
                last_mtime = mtime
                create_progress_plot(metrics_path, out_path)
        except FileNotFoundError:
            print(f"waiting for {metrics_path} ...")
        except json.JSONDecodeError:
            pass  # caught mid-write; the next poll sees the complete file
        except KeyboardInterrupt:
            return
        try:
            # Nearly all wall-time is spent here — Ctrl-C must exit
            # cleanly from the sleep too, not only mid-plot.
            time.sleep(interval_s)
        except KeyboardInterrupt:
            return


def main(argv=None):
    p = argparse.ArgumentParser(description="Plot NeRF training progress")
    p.add_argument("--metrics", "--metrics-file", type=str,
                   default="outputs/checkpoints/metrics_latest.json",
                   help="metrics JSON (reference flag name: --metrics-file)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None,
                   help="write the figure as <save-dir>/training_progress.png "
                        "(the reference's output name, README_plotting.md:58)")
    p.add_argument("--live", action="store_true")
    p.add_argument("--interval", type=float, default=5000.0,
                   help="--live refresh interval in MILLISECONDS (the "
                        "reference's FuncAnimation unit, "
                        "README_plotting.md:40)")
    args = p.parse_args(argv)
    if args.save_dir is not None and args.out is None:
        args.out = os.path.join(args.save_dir, "training_progress.png")
        os.makedirs(args.save_dir, exist_ok=True)
    if args.live:
        # Live mode honors --save-dir/--out too: the reference writes
        # save_dir/training_progress.png on every refresh (:148-150).
        animate_progress(args.metrics, interval_s=args.interval / 1000.0,
                         out_path=args.out)
    else:
        create_progress_plot(args.metrics, args.out)


if __name__ == "__main__":
    main()
