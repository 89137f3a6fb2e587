"""Sharded whole-frame rendering over a device mesh.

The SURVEY §2.5 sequence-parallel analog for inference: rays are i.i.d.,
so a mega-resolution frame scales by sharding the pixel grid over the
mesh's data axis and gathering tiles — parameters (and the optional
occupancy grid) replicate, every ray's samples stay chip-local, and no
hand-written collective is needed (GSPMD splits each dispatch's row
dimension and the host gather is the "all-gather").

The host tile loop of ops/render.render_image_maps is kept (see its
docstring for why ``lax.map`` over Pallas tiles is not used); the only
change is input PLACEMENT: each dispatch covers ``n_devices`` tiles'
worth of rays laid out with ``NamedSharding(mesh, P(axis))``, so one
compiled program renders n_devices tiles concurrently.

Reference behavior covered: the chunked no-grad ``render()`` loop
(reference nerfmlp/renderer.py:23-45) at multi-chip scale — a capability
the single-device reference cannot express.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.ops.render import _tile_render_fn


def data_parallel_mesh(mesh: Optional[Mesh], axis: str = "data"):
    """``mesh`` if frame rendering can shard over it, else ``None``.

    Sharded rendering replicates params, so it is only valid on a pure
    data-parallel mesh: a >1 ``axis`` and no >1 "model" axis (under
    tensor parallelism the params are themselves sharded — the local
    renderer handles that placement correctly already).
    """
    if mesh is None or axis not in mesh.axis_names:
        return None
    if mesh.shape[axis] <= 1:
        return None
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return None
    return mesh


def render_image_sharded(
    params: Dict,
    rays_o,
    rays_d,
    H: int,
    W: int,
    cfg: RenderConfig,
    mesh: Mesh,
    axis: str = "data",
    tile: int = 4096,
    near=None,
    far=None,
    occ_grid=None,
    viewdirs=None,
    maps: Tuple[str, ...] = ("rgb_map",),
) -> Dict[str, np.ndarray]:
    """(H*W, 3) rays -> requested (H, W, ...) maps, sharded over ``mesh``.

    ``tile`` is the PER-DEVICE tile size: each dispatch renders
    ``tile * mesh.shape[axis]`` rays split across the axis. Output maps
    are gathered to host numpy arrays.
    """
    n_dev = mesh.shape[axis]
    super_tile = tile * n_dev
    shard = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    cfg = dataclasses.replace(cfg, perturb=False, raw_noise_std=0.0)
    rays_o = np.asarray(rays_o, np.float32)
    rays_d = np.asarray(rays_d, np.float32)
    n_rays = rays_o.shape[0]
    n_super = -(-n_rays // super_tile)
    pad = n_super * super_tile - n_rays
    rays_o = np.pad(rays_o, ((0, pad), (0, 0)))
    # Valid direction on padded lanes (0-norm viewdirs would NaN).
    down = np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), (pad, 3))
    rays_d = np.concatenate([rays_d, down], axis=0)
    if viewdirs is not None:
        viewdirs = np.concatenate(
            [np.asarray(viewdirs, np.float32), down], axis=0
        )

    def _prep_bound(b, default, fill):
        b = np.asarray(b if b is not None else default, np.float32)
        if b.ndim == 0:
            return b  # scalar: baked into every dispatch
        return np.pad(b, (0, pad), constant_values=fill)

    near_arg = _prep_bound(near, cfg.near, 1.0)
    far_arg = _prep_bound(far, cfg.far, 2.0)

    params = jax.device_put(params, replicated)
    if occ_grid is not None:
        occ_grid = jax.device_put(occ_grid, replicated)

    tile_fn = _tile_render_fn(cfg, tuple(maps))

    def _slice(arr, i):
        if arr is None or np.ndim(arr) == 0:
            return arr if arr is None else jnp.asarray(arr)
        return jax.device_put(
            arr[i * super_tile : (i + 1) * super_tile], shard
        )

    outs = [
        tile_fn(
            params,
            _slice(rays_o, i),
            _slice(rays_d, i),
            _slice(near_arg, i),
            _slice(far_arg, i),
            occ_grid,
            _slice(viewdirs, i),
        )
        for i in range(n_super)
    ]
    result = {}
    for key in maps:
        flat = np.concatenate(
            [np.asarray(o[key]) for o in outs], axis=0
        )[:n_rays]
        result[key] = flat.reshape((H, W) + flat.shape[1:])
    return result
