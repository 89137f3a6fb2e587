#!/usr/bin/env python
"""Terminal training-status dashboard from metrics_latest.json — reference
scripts/view_progress.py: step, best PSNR, latest metrics, improvement,
overfitting warning, iters/hour, config.
"""

import argparse
import json
import os
import sys

if __package__ in (None, ""):
    # Run as a file from a checkout (python scripts/train.py): make
    # the repo root importable. As an installed module
    # (nerfmlp_tpu.scripts.*) the package is already on the path and
    # inserting site-packages/nerfmlp_tpu would shadow user modules.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_latest_metrics(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def display_progress(m):
    import numpy as np

    step = m.get("step", 0)
    print("=" * 64)
    print("NeRF TRAINING STATUS (nerfmlp_tpu)")
    print("=" * 64)
    print(f"step:                {step:,}")
    print(f"best quick-val PSNR: {m.get('best_val_psnr', 0.0):.2f} dB")

    ql = m.get("quick_val_losses", [])
    qp = m.get("quick_val_psnrs", [])
    qs = m.get("quick_val_ssims", [])
    tl = m.get("train_losses", [])
    if qp:
        # Each segment gated on ITS OWN list: legacy/hand-edited files can
        # have these histories at different lengths.
        parts = [f"loss {ql[-1]:.6f}"] if ql else []
        parts.append(f"PSNR {qp[-1]:.2f}")
        if qs:
            parts.append(f"SSIM {qs[-1]:.4f}")
        print("latest quick val:    " + " | ".join(parts))
    if len(qp) > 1:
        print(f"PSNR improvement:    {qp[-1] - qp[0]:+.2f} dB since first validation")

    # Overfitting heuristic (reference :73-77): gap > 0.5 * val loss.
    if tl and ql:
        gap = abs(tl[-1] - ql[-1])
        if gap > 0.5 * ql[-1]:
            print(f"⚠️  possible overfitting: |train-val| gap {gap:.6f} "
                  f"> 50% of val loss {ql[-1]:.6f}")

    it = m.get("iteration_times", [])
    if it:
        med = float(np.median(it[-1000:]))
        print(f"median iter time:    {med * 1e3:.1f} ms  "
              f"({3600.0 / med:,.0f} iters/hour)")

    cfg = m.get("config", {})
    if cfg:
        print("-" * 64)
        print("config:")
        for section, d in cfg.items():
            if isinstance(d, dict):
                kv = " ".join(f"{k}={v}" for k, v in list(d.items())[:8])
                print(f"  {section}: {kv}")
    print("=" * 64)


def main(argv=None):
    p = argparse.ArgumentParser(description="Show NeRF training status")
    p.add_argument("--metrics", type=str,
                   default="outputs/checkpoints/metrics_latest.json")
    p.add_argument("--metrics-dir", type=str, default=None,
                   help="run directory; resolves <dir>/metrics_latest.json "
                        "(the reference's flag, view_progress.py:102)")
    args = p.parse_args(argv)
    if args.metrics_dir is not None:
        args.metrics = os.path.join(args.metrics_dir, "metrics_latest.json")
    m = load_latest_metrics(args.metrics)
    if m is None:
        print(f"no metrics found at {args.metrics} — is training running?")
        return 1
    display_progress(m)
    return 0


if __name__ == "__main__":
    sys.exit(main())
