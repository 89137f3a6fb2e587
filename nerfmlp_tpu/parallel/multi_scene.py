"""Multi-scene batched training: one NeRF per scene, one scene per device.

BASELINE.json config 5 asks for "multi-scene batched training across a
v5e-8 slice". Scenes are independent (no gradient coupling), so the right
TPU mapping is *spatial* batching, not data parallelism: the per-scene
model/optimizer states are STACKED along a leading scene axis that is
sharded across the mesh, each device advances its own scene's training
step locally via ``shard_map``, and the only cross-chip traffic is the
(tiny) metric reduction for logging.

All of it is ordinary JAX: ``jax.vmap`` of the SAME single-scene update
rule the data-parallel trainer uses (``train_step.make_step_fn``), pinned
one scene per device by ``shard_map``. Runs unmodified on the 8
fake-CPU-device test mesh. Occupancy-grid sampling works per scene: pass a
stacked grid (see :func:`create_multi_scene_grids` /
:func:`make_multi_scene_grid_update`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_step_fn,
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


def create_multi_scene_grids(n_scenes: int, rc: RenderConfig):
    """Stacked per-scene occupancy grids (scene axis leading)."""
    from nerfmlp_tpu.ops.occupancy import create_grid

    grids = [create_grid(rc.occ_grid_size) for _ in range(n_scenes)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *grids)


def make_multi_scene_grid_update(rc: RenderConfig, mesh: Mesh, axis: str = "data"):
    """Jitted per-scene grid refresh over the stacked states/grids."""
    from nerfmlp_tpu.ops.occupancy import update_grid

    def local(grid_stack, params_stack, rng_stack, decay):
        return jax.vmap(
            lambda g, p, r: update_grid(g, p, rc, r, decay=decay)
        )(grid_stack, params_stack, rng_stack)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_multi_scene_step(
    rc: RenderConfig, tc: TrainConfig, mesh: Mesh, axis: str = "data",
    with_bounds: bool = False,
):
    """Jitted step over stacked states + (n_scenes, B, 9|12) batches.

    ``n_scenes`` must be divisible by the mesh size; each device holds
    ``n_scenes / n_devices`` scenes and vmaps the shared single-scene
    update rule over its local stack. With ``rc.use_occupancy`` the step
    takes a third stacked-grids argument. With ``with_bounds`` the step
    takes a TRAILING (n_scenes, 2) [near, far] stack so every scene
    samples its own depth range (the config's scalars are ignored) —
    scenes of different dataset types/scales can batch together.
    """
    step_fn = make_step_fn(rc, tc)

    one = lambda s, b, g, bd: step_fn(s, b, g, bd)
    if rc.use_occupancy and with_bounds:
        local_step = lambda ss, bs, gs, bds: jax.vmap(one)(ss, bs, gs, bds)
        n_in = 4
    elif rc.use_occupancy:
        local_step = lambda ss, bs, gs: jax.vmap(
            lambda s, b, g: one(s, b, g, None)
        )(ss, bs, gs)
        n_in = 3
    elif with_bounds:
        local_step = lambda ss, bs, bds: jax.vmap(
            lambda s, b, bd: one(s, b, None, bd)
        )(ss, bs, bds)
        n_in = 3
    else:
        local_step = lambda ss, bs: jax.vmap(
            lambda s, b: one(s, b, None, None)
        )(ss, bs)
        n_in = 2

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(n_in)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def scene_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


# --------------------------------------------------------------------- #
# 2-D scene x data scaling: more chips than scenes.


def make_scene_mesh(n_scenes: int, n_devices: int = 0) -> Mesh:
    """A ("scene", "data") mesh: each scene group owns ``n_devices /
    n_scenes`` chips that data-parallelize its ray batch. Scene axis
    outermost — per-scene gradient all-reduces ride the contiguous inner
    (fastest-ICI) axis and never cross scene groups."""
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    if n % n_scenes:
        raise ValueError(f"{n} devices not divisible by {n_scenes} scenes")
    arr = np.asarray(devs[:n]).reshape(n_scenes, n // n_scenes)
    return Mesh(arr, axis_names=("scene", "data"))


def make_multi_scene_dp_step(
    rc: RenderConfig, tc: TrainConfig, mesh: Mesh, with_bounds: bool = False
):
    """Jitted step over a ("scene", "data") mesh: stacked states sharded on
    "scene" (replicated within each scene's data group), batches
    (n_scenes, B, 9|12) sharded on BOTH axes. Written as a plain vmap of
    the shared single-scene update rule — GSPMD partitions each scene's
    batch over its data group and inserts the per-group gradient
    all-reduce; no hand-written collectives (same math as
    :func:`make_multi_scene_step`, more chips than scenes).

    With ``rc.use_occupancy`` the step takes a stacked per-scene grids
    argument after the batch (:func:`create_multi_scene_grids`), sharded
    on "scene" like the states — each scene group samples from ITS OWN
    density grid, replicated across its data chips.
    ``with_bounds``: trailing (n_scenes, 2) per-scene [near, far] stack."""
    step_fn = make_step_fn(rc, tc)
    occ = rc.use_occupancy

    if occ and with_bounds:
        def step(state_stack, batch_stack, grid_stack, bounds_stack):
            return jax.vmap(step_fn)(
                state_stack, batch_stack, grid_stack, bounds_stack
            )
    elif occ:
        def step(state_stack, batch_stack, grid_stack):
            return jax.vmap(lambda s, b, g: step_fn(s, b, g))(
                state_stack, batch_stack, grid_stack
            )
    elif with_bounds:
        def step(state_stack, batch_stack, bounds_stack):
            return jax.vmap(lambda s, b, bd: step_fn(s, b, None, bd))(
                state_stack, batch_stack, bounds_stack
            )
    else:
        def step(state_stack, batch_stack):
            return jax.vmap(lambda s, b: step_fn(s, b, None))(
                state_stack, batch_stack
            )

    state_sh = NamedSharding(mesh, P("scene"))
    batch_sh = NamedSharding(mesh, P("scene", "data"))
    in_sh = (
        (state_sh, batch_sh)
        + ((state_sh,) if occ else ())
        + ((state_sh,) if with_bounds else ())
    )
    return (
        jax.jit(
            step,
            in_shardings=in_sh,
            out_shardings=(state_sh, state_sh),
            donate_argnums=(0,),
        ),
        state_sh,
        batch_sh,
    )


def make_multi_scene_dp_grid_update(rc: RenderConfig, mesh: Mesh):
    """Per-scene occupancy refresh on the ("scene", "data") mesh: the
    stacked grids/params/rngs are sharded on "scene" and each scene's
    jittered cell-center evaluation is data-replicated within its group
    (the 2-D counterpart of :func:`make_multi_scene_grid_update`)."""
    from nerfmlp_tpu.ops.occupancy import update_grid

    def upd(grid_stack, params_stack, rng_stack, decay):
        return jax.vmap(
            lambda g, p, r: update_grid(g, p, rc, r, decay=decay)
        )(grid_stack, params_stack, rng_stack)

    sh = NamedSharding(mesh, P("scene"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        upd, in_shardings=(sh, sh, sh, rep), out_shardings=sh,
        donate_argnums=(0,),
    )
