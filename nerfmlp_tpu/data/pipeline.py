"""Host -> device ray-batch streaming.

The reference feeds training through a shuffled ``DataLoader`` over the
flattened ray pool (scripts/train.py:219-221, num_workers=0). The TPU
version keeps the precomputed host pool but:

  * samples batches with a reshuffled epoch permutation (numpy, zero-copy
    gathers),
  * stacks (rays_o, rays_d, rgb) into one contiguous (B, 9) array so each
    step ships ONE host->device transfer,
  * optionally double-buffers via ``jax.device_put`` with a sharding so the
    next batch is in flight while the current step runs (the analog of the
    reference's nothing — it re-pays a host sync per step, SURVEY §3.1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def auto_tune_batch_size(
    n_rays: int,
    max_mem_gb: float = 16.0,
    min_batch: int = 256,
    max_batch: int = 16384,
    total_samples: int = 256,
) -> int:
    """Pick a train batch size from a real activation-memory model.

    (The reference's version is a documented dummy, nerfmlp/data.py:106-109.)
    Peak activations per ray ~ total_samples * (enc 63 + trunk 8*256 +
    heads ~0.7k) floats for fwd+bwd; solve for the largest power-of-two
    batch under the budget.
    """
    floats_per_ray = total_samples * (63 + 8 * 256 + 700) * 3  # fwd+bwd+opt
    bytes_per_ray = floats_per_ray * 4
    budget = max_mem_gb * 1e9
    b = int(budget / max(bytes_per_ray, 1))
    b = 1 << max(b.bit_length() - 1, 0)  # round down to a power of two
    return int(np.clip(b, min_batch, max_batch))


class RayBatchLoader:
    """Infinite shuffled batches over a flattened ray pool.

    Yields numpy (batch, 9) arrays laid out [rays_o | rays_d | rgb]; the
    train step slices them back apart on device.

    Two sampling modes mirroring the oracle's ``--no_batching`` switch
    (example/run_nerf.py:716-744, 762-803):
      * global (default): pre-shuffled batches over ALL images' rays,
      * per-image (``image_mode=True``): each batch comes from one random
        image — required for precrop, which restricts early training to
        the central crop of that image (``--precrop_iters/frac``).
    """

    def __init__(
        self,
        rays_o: np.ndarray,
        rays_d: np.ndarray,
        rgbs: np.ndarray,
        batch_size: int,
        seed: int = 0,
        image_shape=None,           # (n_images, H, W) — needed for precrop/image mode
        image_mode: bool = False,
        viewdirs=None,              # world-space dirs (NDC datasets): (N, 3)
    ):
        assert rays_o.shape == rays_d.shape == rgbs.shape
        cols = [
            rays_o.astype(np.float32),
            rays_d.astype(np.float32),
        ]
        if viewdirs is not None:
            # NDC rays: rows become [o | d_ndc | viewdir_world | rgb] (B, 12);
            # the train step detects the width and slices accordingly.
            cols.append(viewdirs.astype(np.float32))
        cols.append(rgbs.astype(np.float32))
        if image_mode and image_shape is None:
            # Fail at construction like set_precrop does, not with a
            # TypeError deep inside next_batch.
            raise ValueError("image_mode requires image_shape (use from_dataset)")
        self.pool = np.concatenate(cols, axis=-1)  # (N, 9) or (N, 12)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._warned_small_pool = False
        self.image_shape = image_shape
        self.image_mode = image_mode
        self.precrop_frac: float = 1.0
        self._perm = None
        self._cursor = 0
        self.epoch = 0

    @classmethod
    def from_dataset(cls, dataset, batch_size: int, seed: int = 0,
                     image_mode: bool = False):
        shape = (dataset.n_images, dataset.H, dataset.W)
        return cls(
            dataset.all_rays_o, dataset.all_rays_d, dataset.all_rgbs,
            batch_size, seed=seed, image_shape=shape, image_mode=image_mode,
            viewdirs=getattr(dataset, "all_viewdirs", None),
        )

    def __len__(self) -> int:
        return self.pool.shape[0]

    def set_precrop(self, frac: float) -> None:
        """Restrict sampling to the central ``frac`` of each image (the
        oracle's --precrop_frac, run_nerf.py:776-792). frac=1.0 disables."""
        if self.image_shape is None:
            raise ValueError("precrop requires image_shape (use from_dataset)")
        self.precrop_frac = float(frac)

    def _sample_pixels(self, n: int) -> np.ndarray:
        """batch_size draws from range(n) WITHOUT replacement like the
        oracle (np.random.choice(coords, N_rand, replace=False),
        run_nerf.py:780); with replacement only when the batch exceeds the
        pixel pool (tiny images — a short batch would break sharding)."""
        if self.batch_size <= n:
            return self.rng.choice(n, self.batch_size, replace=False)
        return self.rng.integers(0, n, self.batch_size)

    def _crop_indices(self, img_idx: int) -> np.ndarray:
        n_imgs, H, W = self.image_shape
        if self.precrop_frac >= 1.0:
            return img_idx * H * W + self._sample_pixels(H * W)
        # Clamp to >=1: tiny images/fractions would otherwise degenerate
        # to an empty crop instead of the single central pixel.
        dh = max(1, int(H // 2 * self.precrop_frac))
        dw = max(1, int(W // 2 * self.precrop_frac))
        flat = self._sample_pixels(2 * dh * 2 * dw)
        rows = H // 2 - dh + flat // (2 * dw)
        cols = W // 2 - dw + flat % (2 * dw)
        return img_idx * H * W + rows * W + cols

    def next_batch(self) -> np.ndarray:
        if self.image_mode or self.precrop_frac < 1.0:
            img_idx = int(self.rng.integers(0, self.image_shape[0]))
            return self.pool[self._crop_indices(img_idx)]
        if self.pool.shape[0] < self.batch_size:
            # Tiny scene: sample with replacement so the batch keeps the
            # REQUESTED size (a short batch breaks mesh sharding and
            # silently changes the effective batch size).
            if not self._warned_small_pool:
                print(f"(ray pool {self.pool.shape[0]} < batch "
                      f"{self.batch_size}: sampling with replacement)")
                self._warned_small_pool = True
            idx = self.rng.integers(0, self.pool.shape[0], self.batch_size)
            return self.pool[idx]
        if self._perm is None or self._cursor + self.batch_size > len(self._perm):
            self._reshuffle()
        idx = self._perm[self._cursor : self._cursor + self.batch_size]
        self._cursor += self.batch_size
        return self.pool[idx]

    def _reshuffle(self) -> None:
        self._perm = self.rng.permutation(self.pool.shape[0])
        self._cursor = 0
        self.epoch += 1

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.next_batch()


def prefetch_to_device(iterator, sharding=None, buffer_size: int = 2):
    """Wrap a host batch iterator with async device puts.

    Keeps ``buffer_size`` batches in flight so host gather/shuffle overlaps
    device compute. With a ``NamedSharding`` the put also scatters the batch
    across the mesh's data axis (per-host sharding for multi-host setups).
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    it = iter(iterator)
    for _ in range(buffer_size):
        queue.append(put(next(it)))
    while True:
        yield queue.popleft()
        queue.append(put(next(it)))
