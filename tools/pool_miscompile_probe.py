"""Standalone repro of the TPU permutation+take gather miscompile (r5).

Run inside a TPU process (e.g. via tools/tpu_worker.py). Measured
2026-08-20 on the axon-tunneled v5e: jnp.take(flat, perm) inside jit
fabricates NaNs from clean inputs at (1.92M, 9) and (2.56M, 9) pools
while (0.48M, 9) and (7.68M, 9) are clean; jax.random.permutation's
output is a valid permutation at every size, and flat[perm] bracket
indexing is bit-exact against host truth at ALL sizes (the fix shipped
in data/device_pool.py). Kept for re-testing after backend updates."""
import numpy as np, jax, jax.numpy as jnp
from nerfmlp_tpu.data.device_pool import DeviceRayPool

for n in (480_000, 1_920_000, 2_560_000, 7_680_000):
    rng = np.random.default_rng(0)
    pool = rng.uniform(0.1, 1.0, size=(n, 9)).astype(np.float32)
    p = DeviceRayPool(pool, batch_size=1024, seed=0)
    stack = p.ensure_epoch(0)
    s = np.asarray(stack[:4])   # pull a few batches
    s_last = np.asarray(stack[-4:])
    nan_n = int(np.isnan(s).sum()) + int(np.isnan(s_last).sum())
    bad_range = bool((s < 0.1 - 1e-5).any() or (s > 1.0 + 1e-5).any())
    print("POOLPROBE n=%d spe=%d nans=%d out_of_range=%s min=%.4f max=%.4f"
          % (n, p.steps_per_epoch, nan_n, bad_range,
             float(min(s.min(), s_last.min())),
             float(max(s.max(), s_last.max()))), flush=True)
    del p, stack
print("POOLPROBE DONE", flush=True)
