"""The jitted training step, data-parallel over a device mesh.

Design (vs the reference hot loop, scripts/train.py:365-406):
  * one fused XLA program per step: unpack batch -> coarse+fine render ->
    MSE loss (+ optional coarse term) -> grads -> Adam update -> metrics,
  * params/opt-state replicated, batch sharded on the mesh's "data" axis;
    GSPMD inserts the gradient all-reduce over ICI,
  * ``donate_argnums`` on the state so its HBM is reused in place,
  * loss/psnr/grad-norm come back as device scalars — the host never
    blocks on them except at log intervals (the reference syncs per step
    via ``loss.item()`` + skimage PSNR, SURVEY §3.1 — deliberately fixed).
"""

from __future__ import annotations



from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nerfmlp_tpu.config import RenderConfig, TrainConfig
from nerfmlp_tpu.models.mlp import init_model
from nerfmlp_tpu.ops.render import render_rays


@struct.dataclass
class TrainState:
    """Carries everything a step mutates. A flax struct => a pytree."""

    step: jnp.ndarray                 # () int32
    params: Any                       # {"coarse": ..., ["fine": ...]}
    opt_state: Any
    rng: jax.Array


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """Adam + exponential LR decay (0.1 every 250k steps by default),
    matching the official schedule (example/run_nerf.py:705-709)."""
    schedule = optax.exponential_decay(
        init_value=tc.lr,
        transition_steps=tc.lr_decay_steps,
        decay_rate=tc.lr_decay_rate,
    )
    chain = []
    if tc.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(tc.grad_clip))
    chain.append(optax.adam(schedule))
    return optax.chain(*chain)


def create_train_state(
    rc: RenderConfig, tc: TrainConfig, rng: Optional[jax.Array] = None
) -> TrainState:
    rng = jax.random.PRNGKey(tc.seed) if rng is None else rng
    k_coarse, k_fine, k_state = jax.random.split(rng, 3)
    params = {"coarse": init_model(k_coarse, rc.model_config())}
    if rc.separate_fine and rc.N_importance > 0:
        params["fine"] = init_model(k_fine, rc.model_config(fine=True))
    opt_state = make_optimizer(tc).init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=k_state,
    )


def loss_and_metrics(
    params: Any,
    batch: jnp.ndarray,
    rng: jax.Array,
    rc: RenderConfig,
    tc: TrainConfig,
    occ_grid=None,
    bounds=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch: (B, 9) = [rays_o | rays_d | rgb] — or (B, 12) with an extra
    world-viewdirs column for NDC datasets ([o | d_ndc | viewdir | rgb]).

    ``bounds``: optional (2,) [near, far] overriding the config's scalars —
    the multi-scene trainer vmaps a per-scene bounds stack through here so
    each scene samples its own depth range."""
    rays_o, rays_d = batch[:, 0:3], batch[:, 3:6]
    viewdirs = batch[:, 6:9] if batch.shape[1] == 12 else None
    target = batch[:, -3:]
    near = far = None
    if bounds is not None:
        near, far = bounds[0], bounds[1]
    out = render_rays(
        params, rays_o, rays_d, rng, rc, near=near, far=far,
        occ_grid=occ_grid, viewdirs=viewdirs,
    )
    loss_fine = jnp.mean((out["rgb_map"] - target) ** 2)
    loss = loss_fine
    if tc.coarse_loss and "rgb_map_coarse" in out:
        loss = loss + jnp.mean((out["rgb_map_coarse"] - target) ** 2)
    psnr = -10.0 * jnp.log10(jnp.maximum(loss_fine, 1e-10))
    return loss, {"loss": loss_fine, "psnr": psnr}


def make_step_fn(rc: RenderConfig, tc: TrainConfig):
    """The single-scene update rule (state, batch[, occ_grid]) -> (state,
    metrics) — shared by the data-parallel step below and the multi-scene
    trainer (which vmaps it over a stacked scene axis)."""
    optimizer = make_optimizer(tc)

    def step_fn(state: TrainState, batch: jnp.ndarray, occ_grid=None,
                bounds=None):
        rng, rng_step = jax.random.split(state.rng)
        rng_step = jax.random.fold_in(rng_step, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(state.params, batch, rng_step, rc, tc, occ_grid, bounds)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm, total_loss=loss)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    return step_fn


def make_train_scan(rc: RenderConfig, tc: TrainConfig, mesh=None, axis: str = "data"):
    """K steps in ONE jitted dispatch: ``lax.scan`` of the update rule over
    a stacked (K, B, F) batch window (``tc.steps_per_dispatch``).

    The scanned body is exactly ``make_step_fn``'s update — per-step math,
    RNG folding (keyed on ``state.step``, which increments inside the
    scan), and metrics are identical to K single dispatches; only the
    host<->device round-trip granularity changes. Metrics come back
    stacked (K,) so the caller can accumulate exact per-step sums and log
    the window's last step. Built for hosts where every dispatch carries a
    fixed cost (the axon tunnel's per-RPC bookkeeping here): K x fewer RPCs.
    """
    step_fn = make_step_fn(rc, tc)

    if rc.use_occupancy:
        def scan_fn(state, batches, occ_grid):
            return jax.lax.scan(
                lambda s, b: step_fn(s, b, occ_grid), state, batches
            )
    else:
        def scan_fn(state, batches):
            return jax.lax.scan(
                lambda s, b: step_fn(s, b, None), state, batches
            )

    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    window_shard = NamedSharding(mesh, P(None, axis))  # shard the ray axis
    in_shardings = (replicated, window_shard) + (
        (replicated,) if rc.use_occupancy else ()
    )
    return jax.jit(
        scan_fn,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def make_pool_scan(
    rc: RenderConfig,
    tc: TrainConfig,
    steps_per_epoch: int,
    mesh=None,
    axis: str = "data",
):
    """K pooled steps in ONE jitted dispatch: ``lax.scan`` of the
    pool-indexing update over the device-resident batch stack.

    Composes the two dispatch-cost tools: the device pool (zero
    host->device bytes per step) and the K-step scan (K x fewer RPCs).
    The r3 host-streamed scan was neutral-to-worse on this backend
    because its (K, B, F) window upload serialized on the tunnel
    (docs/RESULTS.md); a POOLED window ships nothing, and measured +7%
    on the turbo recipe where the ~2 ms per-dispatch host floor was the
    binding constraint. Per-step math/RNG are exactly ``make_pool_step``'s
    (batch index = ``state.step % steps_per_epoch``, incrementing inside
    the scan); a window must not cross an epoch boundary (the stack
    reshuffles there) — the caller caps it.

    Returns ``get(k)``: the jitted scan program for window length ``k``
    (cached per distinct k — window sizes shrink at event boundaries,
    each size compiles once, same as the host-streamed scan mode).
    """
    step_fn = make_step_fn(rc, tc)

    def _body(stack, occ_grid):
        def body(s, _):
            i = jnp.mod(s.step, steps_per_epoch)
            b = jax.lax.dynamic_index_in_dim(stack, i, axis=0,
                                             keepdims=False)
            return step_fn(s, b, occ_grid)

        return body

    def _build(k: int):
        if rc.use_occupancy:
            def scan_fn(state, stack, occ_grid):
                return jax.lax.scan(
                    _body(stack, occ_grid), state, None, length=k
                )
        else:
            def scan_fn(state, stack):
                return jax.lax.scan(
                    _body(stack, None), state, None, length=k
                )

        if mesh is None:
            return jax.jit(scan_fn, donate_argnums=(0,))

        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        stack_shard = NamedSharding(mesh, P(None, axis, None))
        in_shardings = (replicated, stack_shard) + (
            (replicated,) if rc.use_occupancy else ()
        )
        return jax.jit(
            scan_fn,
            in_shardings=in_shardings,
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )

    cache: Dict[int, Any] = {}

    def get(k: int):
        if k not in cache:
            cache[k] = _build(k)
        return cache[k]

    return get


def make_pool_step(
    rc: RenderConfig,
    tc: TrainConfig,
    steps_per_epoch: int,
    mesh=None,
    axis: str = "data",
):
    """The update rule reading its batch from a device-resident shuffled
    (steps_per_epoch, B, F) stack (data/device_pool.py::DeviceRayPool).

    The step ``dynamic_index``es batch ``state.step % steps_per_epoch``
    out of the stack, so a training dispatch ships ZERO host->device
    bytes (the stack and occupancy grid are resident device buffers; the
    state is donated). Per-step math/RNG are exactly ``make_step_fn``'s —
    only the batch SOURCE changes vs the host-streamed step.
    """
    step_fn = make_step_fn(rc, tc)

    def index_step(state, stack, occ_grid=None):
        k = jnp.mod(state.step, steps_per_epoch)
        batch = jax.lax.dynamic_index_in_dim(stack, k, axis=0, keepdims=False)
        return step_fn(state, batch, occ_grid)

    if rc.use_occupancy:
        pool_fn = index_step
    else:
        def pool_fn(state, stack):  # noqa: E306
            return index_step(state, stack, None)

    if mesh is None:
        return jax.jit(pool_fn, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    stack_shard = NamedSharding(mesh, P(None, axis, None))
    in_shardings = (replicated, stack_shard) + (
        (replicated,) if rc.use_occupancy else ()
    )
    return jax.jit(
        pool_fn,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def make_train_step(rc: RenderConfig, tc: TrainConfig, mesh=None, axis: str = "data"):
    """Build the jitted step. With a mesh, batches are sharded over ``axis``
    and state is replicated; XLA handles the cross-chip grad reduction."""
    step_fn = make_step_fn(rc, tc)

    # With occupancy sampling the step takes (state, batch, occ_grid);
    # otherwise the 2-arg signature is preserved.
    if rc.use_occupancy:
        occ_step = step_fn
    else:
        def occ_step(state, batch):  # noqa: E306
            return step_fn(state, batch, None)

    if mesh is None:
        return jax.jit(occ_step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(axis))
    in_shardings = (replicated, batch_shard) + (
        (replicated,) if rc.use_occupancy else ()
    )
    return jax.jit(
        occ_step,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
