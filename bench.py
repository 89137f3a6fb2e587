"""Headline benchmark: training throughput (rays/s) on one TPU chip.

Config mirrors the reference's flagship workload (scripts/train.py defaults):
batch 1024 rays/step, 64 coarse + 128 importance samples (256 MLP evals per
ray), coarse+fine hierarchical rendering, Adam. Baseline: the reference's
best published wall-time implies ~7.1k train rays/s on an M3 Pro
(BASELINE.md "derived throughput"; band 1.9k-7.1k).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

NOTE: timings force a device->host readback of the final loss because the
axon tunnel's block_until_ready does not actually block.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 7100.0  # BASELINE.md derived-throughput upper band


def main():
    import jax
    import jax.numpy as jnp

    from nerfmlp_tpu.config import RenderConfig, TrainConfig
    from nerfmlp_tpu.parallel.train_step import create_train_state, make_train_step

    batch = 1024
    rc = RenderConfig(
        N_samples=64,
        N_importance=128,
        near=2.0,
        far=6.0,
        perturb=True,
        compute_dtype="bfloat16",
        use_pallas=True,
    )
    tc = TrainConfig(batch_size=batch)

    state = create_train_state(rc, tc)
    step = make_train_step(rc, tc)

    rng = np.random.default_rng(0)
    b = rng.normal(size=(batch, 9)).astype(np.float32)
    b[:, 5] = -1.0
    b[:, 6:9] = np.abs(b[:, 6:9]) % 1.0
    b = jnp.asarray(b)

    # Warmup / compile.
    for _ in range(3):
        state, m = step(state, b)
    _ = float(m["loss"])

    n = 100
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, b)
    _ = float(m["loss"])  # forces completion
    dt = (time.time() - t0) / n

    rays_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s (batch 1024, 64+128 samples, bf16 compute)",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
