"""Tensor parallelism for the NeRF MLP over a ("data", "model") mesh.

The reference is single-device (SURVEY §2.5: TP "not needed for an 8x256
MLP; optionally shard the 256-wide layers over a mesh axis as a
demonstration") — this module is that demonstration, done the TPU-native
way: no hand-written collectives. We annotate *parameter* shardings in the
Megatron column/row alternation and let GSPMD propagate activation
layouts and insert the ICI collectives (all-gather / reduce-scatter /
psum) itself:

  * even trunk layers ``pts_0, pts_2, ...``: column-parallel — kernel
    ``P(None, "model")``, bias ``P("model")``; activations leave sharded
    on the feature axis,
  * odd trunk layers: row-parallel — kernel ``P("model", None)``, bias
    replicated; consumes feature-sharded activations, XLA emits the psum,
  * heads: ``bottleneck``/``view`` column-parallel, ``sigma``/``rgb``/
    ``output`` row-parallel (their tiny out-dims can't shard).

The skip concat (encoded input, replicated, joined to the sharded hidden
state before layer 5, models/mlp.py:66-69) and the non-divisible view
input (256+27) are exactly the cases where manual TP gets painful and
GSPMD just reshards — the point of doing it this way.

Adam's ``mu``/``nu`` mirror the param tree, so the same path-keyed rule
shards optimizer state consistently (each shard's optimizer math stays
local — no duplicated fp32 state on the model axis).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.train_step import TrainState, make_step_fn

# Layers whose kernel is split on the OUTPUT feature axis (column) vs the
# INPUT feature axis (row). Trunk layers alternate by index.
_COL_HEADS = ("bottleneck", "view")
_ROW_HEADS = ("sigma", "rgb", "output")


def make_tp_mesh(
    n_devices: int = 0, model_parallel: int = 2
) -> Mesh:
    """A ("data", "model") mesh: model axis innermost so its collectives
    ride the fastest ICI links (scaling-book layout rule)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    arr = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def _spec_for(path, leaf, tp: int) -> P:
    """Partition spec for one param/opt-state leaf, keyed on its tree path
    (layer name + kernel/bias) — applies uniformly to params and to
    optimizer moments, which share the same subtree layout."""
    names = [
        getattr(k, "key", None) or getattr(k, "name", "") for k in path
    ]
    kind = names[-1] if names else ""
    layer = names[-2] if len(names) >= 2 else ""
    shape = getattr(leaf, "shape", ())

    def div(dim):
        return dim % tp == 0 and dim >= tp

    is_col = (
        layer in _COL_HEADS
        or (layer.startswith("pts_") and int(layer[4:]) % 2 == 0)
    )
    if kind == "kernel" and len(shape) == 2:
        if is_col and div(shape[1]):
            return P(None, "model")
        if not is_col and div(shape[0]):
            return P("model", None)
    elif kind == "bias" and len(shape) == 1:
        if is_col and div(shape[0]):
            return P("model")
    return P()


def tp_state_sharding(state: TrainState, mesh: Mesh) -> Any:
    """NamedSharding pytree for the full TrainState (params + Adam moments
    follow the column/row rule; step/rng/counts replicated)."""
    tp = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, tp)),
        state,
    )


def make_tp_train_step(
    rc: RenderConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state: Optional[TrainState] = None,
    state_sharding: Optional[Any] = None,
):
    """Jitted TP+DP train step: batch sharded on "data", params/opt-state
    sharded on "model" per the column/row rule. Returns (step, sharding);
    place the state with ``jax.device_put(state, sharding)`` first."""
    if state_sharding is None:
        assert state is not None, "need state or state_sharding"
        state_sharding = tp_state_sharding(state, mesh)
    step_fn = make_step_fn(rc, tc)

    def step2(state, batch):
        return step_fn(state, batch, None)

    replicated = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        step2,
        in_shardings=(state_sharding, batch_shard),
        out_shardings=(state_sharding, replicated),
        donate_argnums=(0,),
    )
    return jitted, state_sharding
