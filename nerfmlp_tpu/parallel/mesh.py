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


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize JAX's multi-host runtime (call before :func:`make_mesh`
    on a multi-host slice; on GCE TPU pods the args auto-detect).

    Returns the global device count. Safe to call on single-host setups —
    initialization errors degrade to single-process mode with a warning.
    """
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs = dict(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # pragma: no cover - depends on environment
        print(f"(jax.distributed.initialize skipped: {e})")
    return len(jax.devices())


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
