"""Device-resident ray pool: zero per-step host->device transfer.

The host loader (data/pipeline.py::RayBatchLoader) re-uploads a (B, F)
batch every train step — the reference's DataLoader does the host->device
copy per step too (scripts/train.py:369-371). On a remote/tunneled device
that per-step upload is the dominant HOST cost of a long run: this
environment's tunnel leaks host RAM and drifts step time proportionally
to the BYTES shipped (measured ~43.5 KB/step at batch 1024 — ~9 GB RSS
across a 200k-step run, docs/RESULTS.md), and no dispatch batching can
amortize a byte-proportional cost.

TPU-idiomatically the pool belongs in HBM: the flagship training pool
(24 views at 400x400 = 3.84M rays x 9 floats) is 138 MB — ~1% of a v5e's
HBM. ``DeviceRayPool`` uploads the flattened pool ONCE and reproduces
the host loader's global-batching semantics (the oracle's pre-shuffled
``rays_rgb`` walk, example/run_nerf.py:716-744) on device:

  * per epoch, ONE jitted shuffle gathers the pool into a
    (steps_per_epoch, B, F) stack (rays past the last full batch sit the
    epoch out, exactly like the host loader's reshuffle guard —
    data/pipeline.py::next_batch);
  * per step, the train step ``dynamic_index``es batch
    ``state.step % steps_per_epoch`` out of the resident stack
    (parallel/train_step.py::make_pool_step) — the dispatch carries no
    host input at all beyond the donated state;
  * under a mesh the stack is sharded (None, "data", None): every batch
    is pre-scattered over the data axis, so the per-epoch shuffle is the
    only cross-device traffic.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class DeviceRayPool:
    """The flattened (N, F) ray pool resident in device memory, re-shuffled
    into a (steps_per_epoch, batch, F) batch stack once per epoch.

    The shuffle key is ``fold_in(PRNGKey(seed), epoch)``, so a resumed run
    reconstructs the exact epoch stack it was interrupted in.
    """

    def __init__(
        self,
        pool: np.ndarray,
        batch_size: int,
        seed: int = 0,
        mesh=None,
        axis: str = "data",
    ):
        n, feat = pool.shape
        if n < batch_size:
            raise ValueError(
                f"ray pool ({n}) smaller than one batch ({batch_size}); "
                "use the host loader's with-replacement fallback"
            )
        self.batch_size = int(batch_size)
        self.steps_per_epoch = n // batch_size
        self.seed = int(seed)
        n_use = self.steps_per_epoch * batch_size

        stack_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._flat = jax.device_put(
                jnp.asarray(pool, jnp.float32), NamedSharding(mesh, P())
            )
            stack_sharding = NamedSharding(mesh, P(None, axis, None))
        else:
            self._flat = jax.device_put(jnp.asarray(pool, jnp.float32))

        spe = self.steps_per_epoch

        def shuffle(flat: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
            perm = jax.random.permutation(key, flat.shape[0])[:n_use]
            # flat[perm], NOT jnp.take: on the TPU backend the jitted
            # permutation+take MISCOMPILES at mid-size pools (r5,
            # 2026-08-20, measured: 1.92M and 2.56M rows x 9 feats
            # fabricate thousands of NaNs from clean inputs — every
            # training config at 200^2-pool sizes diverged at step 1 —
            # while 0.48M and 7.68M are clean; the permutation itself is
            # valid, and bracket indexing at the same shapes is bit-exact
            # against a host-computed pool[perm] at ALL sizes;
            # tools/pool_miscompile_probe.py reproduces it standalone).
            return flat[perm].reshape(spe, batch_size, feat)

        kwargs = {}
        if stack_sharding is not None:
            kwargs["out_shardings"] = stack_sharding
        self._shuffle = jax.jit(shuffle, **kwargs)

        self.epoch: int = -1
        self.stack: Optional[jnp.ndarray] = None

    def __len__(self) -> int:
        return self._flat.shape[0]

    def epoch_of(self, completed_steps: int) -> int:
        """Which epoch the step AFTER ``completed_steps`` samples from."""
        return completed_steps // self.steps_per_epoch

    def ensure_epoch(self, epoch: int) -> jnp.ndarray:
        """Return the batch stack for ``epoch``, reshuffling if needed."""
        if epoch != self.epoch:
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
            self.stack = self._shuffle(self._flat, key)
            self.epoch = epoch
        return self.stack
