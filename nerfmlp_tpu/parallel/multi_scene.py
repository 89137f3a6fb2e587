"""Multi-scene batched training: one NeRF per scene, one scene per device.

BASELINE.json config 5 asks for "multi-scene batched training across a
v5e-8 slice". Scenes are independent (no gradient coupling), so the right
TPU mapping is *spatial* batching, not data parallelism: the per-scene
model/optimizer states are STACKED along a leading scene axis that is
sharded across the mesh, each device advances its own scene's training
step locally via ``shard_map``, and the only cross-chip traffic is the
(tiny) metric reduction for logging.

All of it is ordinary JAX: ``jax.vmap`` expresses "a step per scene",
``shard_map`` pins one scene per device. Runs unmodified on the 8
fake-CPU-device test mesh.
"""

from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    loss_and_metrics,
    make_optimizer,
)


def create_multi_scene_state(
    n_scenes: int, rc: RenderConfig, tc: TrainConfig
) -> TrainState:
    """Stack ``n_scenes`` independently-seeded train states along axis 0."""
    states = [
        create_train_state(rc, tc, rng=jax.random.PRNGKey(tc.seed + 1000 * s))
        for s in range(n_scenes)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def make_multi_scene_step(
    rc: RenderConfig, tc: TrainConfig, mesh: Mesh, axis: str = "data"
):
    """Jitted step over stacked states + (n_scenes, B, 9) batches.

    ``n_scenes`` must be divisible by the mesh size; each device holds
    ``n_scenes / n_devices`` scenes and vmaps over its local stack.
    """
    optimizer = make_optimizer(tc)

    def one_scene_step(state: TrainState, batch: jnp.ndarray):
        rng, rng_step = jax.random.split(state.rng)
        rng_step = jax.random.fold_in(rng_step, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(state.params, batch, rng_step, rc, tc)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    def local_step(state_stack, batch_stack):
        # state_stack/batch_stack: this device's shard (scenes_local, ...).
        return jax.vmap(one_scene_step)(state_stack, batch_stack)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def scene_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
