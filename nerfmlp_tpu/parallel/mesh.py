"""Device mesh + sharding helpers.

The reference is single-device (scripts/train.py:208); the TPU design
scales by data-parallel ray batches over a 1-D ``Mesh`` axis ``"data"``
(SURVEY §2.5): parameters are replicated, each step's (B, 9) ray batch is
sharded along the batch dimension, and XLA inserts the gradient
``all-reduce`` over ICI automatically (GSPMD). Rays are i.i.d. so this is
the whole story — no TP/PP is warranted for a ~600k-param MLP.

Multi-host: call ``jax.distributed.initialize()`` before :func:`make_mesh`;
``jax.devices()`` then spans the slice and per-host batch shards ride the
same code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = "data",
) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
