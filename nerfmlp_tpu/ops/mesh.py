"""Isosurface mesh extraction from a trained NeRF's density field.

A classic NeRF post-processing tool the reference does not ship (its
inference surface is image CLIs only, scripts/render_example.py): query
sigma on a regular grid over the scene AABB and surface the level set as
a triangle mesh for DCC tools / 3-D printing / collision geometry.

Density semantics match the renderer exactly — sigma is the 4th raw MLP
output passed through relu (``/root/reference/nerfmlp/renderer.py:114-163``,
our ops/integrate.py) and the grid query reuses the same `_query_mlp`
path the occupancy subsystem refreshes its grid with (ops/occupancy.py),
so the mesh is the level set of the field the renderer actually
integrates.

TPU-first design, in three stages:

1. **Dense density evaluation** (the FLOPs): the G^3 grid-node sigma
   query runs through the fused-MLP render path in fixed-size chunks —
   one compiled program reused across chunks, MXU-shaped batches.
2. **Surface-cell compaction** (host): cells whose corner values span
   the threshold are found with shifted-view numpy comparisons on the
   read-back volume. Only ~O(G^2) surface cells survive out of G^3 —
   compacting on the host once is the static-shape alternative to
   dynamic-shape stream compaction, mirroring how the occupancy sampler
   turns "skipping" into reweighting (ops/occupancy.py docstring).
3. **Marching tetrahedra** (device, jitted): each surviving cube is
   split into 6 tetrahedra sharing the main diagonal; per-tet case
   logic uses ONE-HOT CONTRACTIONS over a 16-entry table instead of
   gathers (the repo-wide TPU idiom, see ops/render.py::_merge_by_depth)
   and every shape is static — padded cells encode case 0 (no output).
   Marching tets needs only a 16x2x3 table derivable from first
   principles (tested exhaustively in tests/test_mesh.py), unlike the
   256-case marching-cubes tables, and has no ambiguous saddle cases.

Triangle winding out of the tet table is not globally consistent;
`mesh_from_volume` orients every face against the density gradient
(outward = decreasing density) after welding, which is both simpler and
more robust than tracking per-case parity through 6 tet orientations.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# ------------------------------------------------------------------ #
# Tetrahedral decomposition tables (derived, not copied — see test_mesh
# ::test_tet_table_is_exactly_the_crossing_edges for the exhaustive
# first-principles check).
# ------------------------------------------------------------------ #

# Cube corners are bit-coded: corner c sits at offset (c&1, c>>1&1, c>>2&1)
# in (x, y, z). The 6 tets all share the main diagonal corner0-corner7 and
# correspond to the 6 axis orders of the path 0 -> a -> a|b -> 7; together
# they exactly partition the cube with conforming faces.
TET_CORNERS = np.array(
    [
        [0, 1, 3, 7],  # x, y, z
        [0, 1, 5, 7],  # x, z, y
        [0, 2, 3, 7],  # y, x, z
        [0, 2, 6, 7],  # y, z, x
        [0, 4, 5, 7],  # z, x, y
        [0, 4, 6, 7],  # z, y, x
    ],
    np.int32,
)

# The 6 edges of a tetrahedron as local-corner pairs.
TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# For each of the 16 inside/outside cases (bit i = local corner i above
# threshold): up to two triangles, each as 3 tet-edge ids (-1 = unused).
# Single-corner cases surface the 3 edges touching that corner; two-corner
# cases surface the quad of 4 crossing edges split along a diagonal.
TRI_TABLE = np.array(
    [
        [[-1, -1, -1], [-1, -1, -1]],  # 0000
        [[0, 1, 2], [-1, -1, -1]],     # 0001  c0
        [[0, 3, 4], [-1, -1, -1]],     # 0010  c1
        [[1, 2, 4], [1, 4, 3]],        # 0011  c0 c1
        [[1, 3, 5], [-1, -1, -1]],     # 0100  c2
        [[0, 3, 5], [0, 5, 2]],        # 0101  c0 c2
        [[0, 1, 5], [0, 5, 4]],        # 0110  c1 c2
        [[2, 4, 5], [-1, -1, -1]],     # 0111  c0 c1 c2
        [[2, 4, 5], [-1, -1, -1]],     # 1000  c3
        [[0, 4, 5], [0, 5, 1]],        # 1001  c0 c3
        [[0, 2, 5], [0, 5, 3]],        # 1010  c1 c3
        [[1, 3, 5], [-1, -1, -1]],     # 1011  c0 c1 c3
        [[1, 2, 4], [1, 4, 3]],        # 1100  c2 c3
        [[0, 3, 4], [-1, -1, -1]],     # 1101  c0 c2 c3
        [[0, 1, 2], [-1, -1, -1]],     # 1110  c1 c2 c3
        [[-1, -1, -1], [-1, -1, -1]],  # 1111
    ],
    np.int32,
)

# One-hot vertex selector: SEL[case, tri, slot] is a 7-vector picking one
# of the 6 edge points (index 6 = the zero pad for unused slots). Lets the
# kernel turn the table lookup + edge pick into two einsums (MXU) instead
# of dynamic gathers.
_SEL = np.zeros((16, 2, 3, 7), np.float32)
for _c in range(16):
    for _t in range(2):
        for _s in range(3):
            _e = TRI_TABLE[_c, _t, _s]
            _SEL[_c, _t, _s, 6 if _e < 0 else _e] = 1.0
# Triangle validity per (case, tri).
_VALID = (TRI_TABLE[:, :, 0] >= 0).astype(np.float32)


def _corner_offsets() -> np.ndarray:
    """(8, 3) unit-cell corner offsets in (x, y, z) for bit-coded ids."""
    c = np.arange(8)
    return np.stack([c & 1, (c >> 1) & 1, (c >> 2) & 1], -1).astype(np.float32)


@jax.jit
def _tet_triangles(
    corner_vals: jnp.ndarray,  # (C, 8) f32 cube-corner densities
    cell_idx: jnp.ndarray,     # (C, 3) i32 integer cell coordinates
    box_min: jnp.ndarray,      # (3,) f32
    cell_size: jnp.ndarray,    # (3,) f32
    threshold: jnp.ndarray,    # () f32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Marching tetrahedra over a static-size batch of surface cells.

    Returns (C, 6, 2, 3, 3) triangle vertex positions and a (C, 6, 2)
    validity mask. Padded cells (all-zero corners with threshold > 0, or
    any cells whose corners are all on one side) produce case 0/15 ->
    mask False. Static shapes + one-hot contractions throughout; every
    non-shape input is traced, so one compile serves every
    threshold/aabb/resolution at a given chunk size.

    Corner positions are computed from INTEGER node indices
    (box_min + (cell_idx + corner_bits) * cell_size): neighboring cells
    and tets evaluate the exact same expression on the exact same values
    for a shared grid node, so shared edge intersection points come out
    BIT-IDENTICAL across cells — which is what lets mesh_from_volume
    weld by exact equality instead of fuzzy quantization. (Interpolation
    direction is consistent too: tet-edge endpoint order follows cube
    corner-id order, which is the (z, y, x)-lexicographic order of the
    global node coordinates in every cell that shares the edge.)
    """
    cs = jnp.asarray(cell_size, jnp.float32)
    sel = jnp.asarray(_SEL)
    valid_tab = jnp.asarray(_VALID)
    thr = threshold.astype(jnp.float32)
    corner_bits = jnp.asarray(_corner_offsets())  # (8, 3) 0/1 floats

    tris, valids = [], []
    for t in range(6):
        ids = TET_CORNERS[t]  # static python ints
        vals = corner_vals[:, ids]                     # (C, 4)
        node = cell_idx[:, None, :].astype(jnp.float32) + corner_bits[ids]
        pos = box_min + node * cs                      # (C, 4, 3)
        inside = (vals > thr).astype(jnp.int32)
        case = (
            inside[:, 0]
            + 2 * inside[:, 1]
            + 4 * inside[:, 2]
            + 8 * inside[:, 3]
        )  # (C,)

        # All 6 edge intersection points, computed unconditionally (the
        # selector only ever picks edges that actually cross, where the
        # denominator is nonzero; the epsilon guards the unused rest).
        pts = []
        for a, b in TET_EDGES:
            va, vb = vals[:, a], vals[:, b]
            denom = vb - va
            tt = (thr - va) / jnp.where(
                jnp.abs(denom) < 1e-12, jnp.float32(1e-12), denom
            )
            tt = jnp.clip(tt, 0.0, 1.0)[:, None]
            pts.append(pos[:, a] + tt * (pos[:, b] - pos[:, a]))
        edge_pts = jnp.stack(pts + [jnp.zeros_like(pts[0])], 1)  # (C, 7, 3)

        onehot = jax.nn.one_hot(case, 16, dtype=jnp.float32)     # (C, 16)
        pick = jnp.einsum("nc,ctse->ntse", onehot, sel)          # (C,2,3,7)
        verts = jnp.einsum("ntse,nex->ntsx", pick, edge_pts)     # (C,2,3,3)
        tris.append(verts)
        valids.append(onehot @ valid_tab)                        # (C, 2)
    return jnp.stack(tris, 1), jnp.stack(valids, 1) > 0.5


def _const_dir_enc(cfg, n: int):
    """Encoded constant view direction (density is view-independent —
    same trick as ops/occupancy.py::update_grid), or None."""
    if not cfg.use_viewdirs:
        return None
    from nerfmlp_tpu.ops.encoding import positional_encoding

    const_dir = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], jnp.float32), (n, 3)
    )
    return positional_encoding(const_dir, cfg.dir_enc_L)


def _shard_rows(x, mesh):
    """Constrain a (chunk, ...) array to be row-sharded over the mesh's
    first axis — GSPMD then partitions the whole MLP eval (params are
    replicated), the same pure-data-parallel layout as
    parallel/render_parallel.py's whole-frame renderer."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(mesh.axis_names[0]))
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "fine", "chunk", "mesh")
)
def _grid_sigma_chunk(net, start, g, box_min, box_span, cfg, fine, chunk,
                      mesh=None):
    """relu(sigma) at ``chunk`` consecutive flattened grid nodes starting
    at traced index ``start`` of a traced ``g``-per-axis grid.

    Grid-node positions are generated ON DEVICE from the index — the
    host ships two scalars per chunk instead of a (chunk, 3) point
    upload (the same dispatch-cost lesson as serving's on-device ray
    generation, render_path.rays_for_pose_device). Module-level jit with
    start AND g traced: ONE compile per (cfg, chunk) serves every
    resolution — a serve client sweeping resolutions must not recompile
    the G^3 eval under the dispatch lock. With a ``mesh``, the chunk's
    rows are sharded over the devices (multi-chip serving extracts at
    full-slice throughput).
    """
    g = g.astype(jnp.int32)
    n = start + jnp.arange(chunk, dtype=jnp.int32)
    n = jnp.minimum(n, g * g * g - 1)  # tail pad: recompute a valid node
    i = n // (g * g)
    j = (n // g) % g
    k = n % g
    denom = jnp.maximum(g - 1, 1).astype(jnp.float32)
    pts01 = jnp.stack([i, j, k], -1).astype(jnp.float32) / denom
    pts = _shard_rows(box_min + pts01 * box_span, mesh)
    from nerfmlp_tpu.ops.render import _query_mlp

    raw = _query_mlp(net, pts[:, None, :], _const_dir_enc(cfg, chunk),
                     cfg, fine=fine)
    return jax.nn.relu(raw[:, 0, 3].astype(jnp.float32))


def _check_aabb(aabb):
    aabb = tuple(float(v) for v in aabb)
    if len(aabb) != 6 or not all(np.isfinite(aabb)) or not all(
        aabb[i] < aabb[i + 3] for i in range(3)
    ):
        raise ValueError(
            "aabb must be 6 finite numbers with min < max per axis, got "
            f"{aabb!r}"
        )
    return aabb


def density_volume(
    params: Dict,
    cfg,
    resolution: int = 128,
    aabb=None,
    chunk: int = 65536,
    mesh=None,
) -> np.ndarray:
    """relu(sigma) at (G, G, G) grid NODES spanning the AABB (inclusive).

    Runs the same `_query_mlp` path the renderer integrates and the
    occupancy grid refreshes from (ops/occupancy.py::update_grid —
    including the final-net selection and the constant view direction,
    which does not affect density). Chunked at a fixed size so one
    compiled program serves every chunk; node positions are generated on
    device (see :func:`_grid_sigma_chunk`).
    """
    from nerfmlp_tpu.ops.render import _final_net

    aabb = cfg.aabb if aabb is None else aabb
    if aabb is None:
        raise ValueError(
            "mesh extraction needs scene bounds: pass aabb= or set "
            "RenderConfig.aabb"
        )
    aabb = _check_aabb(aabb)
    g = int(resolution)
    if g < 2:
        raise ValueError(f"resolution must be >= 2, got {g}")
    if g > 1289:
        # Flat node ids are generated on device in int32 and the tail
        # chunk computes start + arange(chunk) BEFORE clamping: g^3 plus
        # the 2^20 chunk cap below must fit (1289^3 + 2^20 < 2^31 <
        # 1290^3 + 2^20). Fail clearly, not by silent int32 wraparound.
        raise ValueError(f"resolution must be <= 1289 (int32 node ids), "
                         f"got {g}")
    net, fine = (params, False)
    if "coarse" in params:
        net, fine = _final_net(params, cfg)

    box_min = jnp.asarray(aabb[:3], jnp.float32)
    box_span = jnp.asarray(
        np.asarray(aabb[3:], np.float32) - np.asarray(aabb[:3], np.float32)
    )
    n = g * g * g
    # Bucket the chunk to a power of two (capped by the request) so the
    # number of distinct compiled programs stays O(log n) across
    # resolutions rather than one per grid size. Hard cap 2^20: bigger
    # buys nothing (HBM working set) and keeps the tail chunk's
    # start + arange(chunk) inside int32 at the max resolution.
    chunk = max(1, min(int(chunk), 1 << 20, 1 << (n - 1).bit_length()))
    if mesh is not None:  # even per-device rows
        d = int(np.prod(mesh.devices.shape))
        chunk = -(-chunk // d) * d
    out = np.empty(n, np.float32)
    for s in range(0, n, chunk):
        block = np.asarray(_grid_sigma_chunk(
            net, jnp.int32(s), jnp.int32(g), box_min, box_span, cfg, fine,
            chunk, mesh=mesh,
        ))
        out[s : s + chunk] = block[: n - s]
    return out.reshape(g, g, g)


def mesh_from_volume(
    vol: np.ndarray,
    aabb,
    threshold: float,
    chunk: int = 16384,
) -> Tuple[np.ndarray, np.ndarray]:
    """Surface the `density > threshold` level set of a (G, G, G) volume.

    Returns (verts (V, 3) float32 world coords, faces (T, 3) int32).
    Vertices shared between adjacent cells/tets are welded by EXACT
    equality — the tet kernel computes them bit-identically from integer
    node indices (see :func:`_tet_triangles`); every face is oriented so
    its normal points along DECREASING density (outward for a solid
    object). Empty level sets return (0,3)/(0,3) arrays rather than
    erroring — render-time code treats "nothing above threshold" the
    same way (ops/occupancy.py::occupancy_weights).
    """
    vol = np.asarray(vol, np.float32)
    g = vol.shape[0]
    if vol.shape != (g, g, g) or g < 2:
        raise ValueError(f"volume must be (G,G,G) with G>=2, got {vol.shape}")
    aabb = _check_aabb(aabb)
    box_min = np.asarray(aabb[:3], np.float32)
    box_max = np.asarray(aabb[3:], np.float32)
    cell = (box_max - box_min) / (g - 1)

    # Stage 2 (host): shifted-view min/max finds the crossing cells.
    corners = [
        vol[dx : g - 1 + dx, dy : g - 1 + dy, dz : g - 1 + dz]
        for dz in (0, 1)
        for dy in (0, 1)
        for dx in (0, 1)
    ]
    # Order above is (dz, dy, dx) loops -> index = dx + 2*dy + 4*dz,
    # matching the bit-coded corner ids.
    stack = np.stack(corners, -1)  # (g-1, g-1, g-1, 8)
    active = (stack.min(-1) <= threshold) & (stack.max(-1) > threshold)
    idx = np.argwhere(active)  # (A, 3) in (x, y, z) cell coords
    if idx.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    corner_vals = stack[active]  # (A, 8)

    # Stage 3 (device): fixed-size batches through the jitted tet kernel.
    chunk = max(1, int(chunk))
    bmin = jnp.asarray(box_min)
    cs = jnp.asarray(cell)
    thr = jnp.float32(threshold)
    all_tris = []
    for s in range(0, corner_vals.shape[0], chunk):
        cv = corner_vals[s : s + chunk]
        ci = idx[s : s + chunk].astype(np.int32)
        if cv.shape[0] < chunk:
            pad = chunk - cv.shape[0]
            cv = np.concatenate([cv, np.zeros((pad, 8), np.float32)])
            ci = np.concatenate([ci, np.zeros((pad, 3), np.int32)])
        tris, valid = _tet_triangles(
            jnp.asarray(cv), jnp.asarray(ci), bmin, cs, thr
        )
        tris = np.asarray(tris)
        valid = np.asarray(valid)
        all_tris.append(tris[valid])  # (t, 3, 3)
    tris = np.concatenate(all_tris, 0)
    if tris.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # Weld by exact equality: shared edge points are bit-identical across
    # cells and tets by construction (_tet_triangles computes them from
    # integer node indices), so no fuzzy quantization is needed — and no
    # quantization boundary can split an ulp-pair into a hairline crack.
    flat = tris.reshape(-1, 3)
    _, first, inverse = np.unique(
        flat, axis=0, return_index=True, return_inverse=True
    )
    verts = flat[first]
    faces = inverse.reshape(-1, 3).astype(np.int32)
    # Degenerate triangles (a corner exactly at threshold collapses an
    # edge point onto a tet corner shared by two slots).
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # Orient every face outward (normal along decreasing density) using
    # the host volume's gradient at the nearest node to the centroid.
    # np.gradient works in index units; divide per-axis by the cell size
    # so anisotropic AABBs get a true world-space direction.
    gx, gy, gz = (g_ / c_ for g_, c_ in zip(np.gradient(vol), cell))
    centroid = verts[faces].mean(1)
    node = np.clip(
        np.round((centroid - box_min) / cell).astype(np.int64), 0, g - 1
    )
    grad = np.stack(
        [g_[node[:, 0], node[:, 1], node[:, 2]] for g_ in (gx, gy, gz)], -1
    )
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    normal = np.cross(e1, e2)
    flip = (normal * grad).sum(-1) > 0
    faces[flip] = faces[flip][:, [0, 2, 1]]
    return verts, faces


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals from oriented faces (unit length)."""
    vn = np.zeros_like(verts)
    if faces.shape[0]:
        e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
        e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
        fn = np.cross(e1, e2)  # |fn| = 2*area: area weighting for free
        for c in range(3):
            np.add.at(vn, faces[:, c], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


def vertex_colors(
    params: Dict,
    cfg,
    verts: np.ndarray,
    normals: np.ndarray,
    chunk: int = 65536,
    mesh=None,
) -> np.ndarray:
    """Per-vertex RGB by querying the model looking INTO the surface.

    The view direction at each vertex is the inward surface normal — the
    direction a camera outside the object sees that point from, the
    standard trick for baking view-dependent NeRF color onto a mesh. RGB
    semantics match the renderer (sigmoid of raw[..., :3],
    /root/reference/nerfmlp/renderer.py:114-133).
    """
    from nerfmlp_tpu.ops.render import _final_net

    net, fine = (params, False)
    if "coarse" in params:
        net, fine = _final_net(params, cfg)

    n = verts.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.float32)
    chunk = max(1, min(int(chunk), n))
    if mesh is not None:  # even per-device rows
        d = int(np.prod(mesh.devices.shape))
        chunk = -(-chunk // d) * d
    out = np.empty((n, 3), np.float32)
    dirs = -np.asarray(normals, np.float32)
    for s in range(0, n, chunk):
        xv = verts[s : s + chunk].astype(np.float32)
        dv = dirs[s : s + chunk]
        if xv.shape[0] < chunk:
            pad = chunk - xv.shape[0]
            xv = np.concatenate([xv, np.zeros((pad, 3), np.float32)])
            dv = np.concatenate(
                [dv, np.tile(np.array([[0, 0, -1]], np.float32), (pad, 1))]
            )
        out[s : s + chunk] = np.asarray(
            _color_chunk(net, jnp.asarray(xv), jnp.asarray(dv), cfg, fine,
                         mesh=mesh)
        )[: n - s]
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "fine", "mesh"))
def _color_chunk(net, pts, dirs, cfg, fine, mesh=None):
    """sigmoid(rgb) at points with per-point view directions. Module-level
    jit: one compile per (cfg, chunk shape), reused across calls."""
    from nerfmlp_tpu.ops.encoding import positional_encoding
    from nerfmlp_tpu.ops.render import _query_mlp

    pts = _shard_rows(pts, mesh)
    dirs = _shard_rows(dirs, mesh)
    dirs_enc = (
        positional_encoding(dirs, cfg.dir_enc_L) if cfg.use_viewdirs
        else None
    )
    raw = _query_mlp(net, pts[:, None, :], dirs_enc, cfg, fine=fine)
    return jax.nn.sigmoid(raw[:, 0, :3].astype(jnp.float32))


def extract_mesh(
    params: Dict,
    cfg,
    resolution: int = 128,
    threshold: float = 25.0,
    aabb=None,
    color: bool = True,
    density_chunk: int = 65536,
    cell_chunk: int = 16384,
    mesh=None,
    gamma: bool = False,
    device_lock=None,
) -> Dict[str, np.ndarray]:
    """Checkpoint -> triangle mesh, end to end.

    Returns dict with verts (V,3) f32, faces (T,3) i32, normals (V,3)
    f32, colors (V,3) f32 in [0,1] (present when ``color``), and the
    evaluated sigma volume's min/max for threshold diagnostics.

    ``device_lock``: optional context manager held around the two
    DEVICE-heavy stages only (the G^3 density eval and the color bake) —
    the serve layer passes its dispatch lock so the host-side
    welding/orientation between them never blocks a concurrent render
    on an idle chip. The tet kernel's small batches dispatch outside the
    lock and may interleave with a render (slower for both, still
    correct — milliseconds against the seconds the unlock saves).

    ``gamma`` encodes baked colors to sRGB: the model outputs LINEAR
    radiance (the blender pipeline trains on sRGB->linear images,
    data/blender.py), so 8-bit viewers show linear colors too dark —
    same knob as the render CLIs' --apply_gamma
    (/root/reference/scripts/render_example.py:246-252).

    For NDC-trained checkpoints (LLFF forward-facing) the density field
    lives in NDC coordinates — pass the ``aabb`` in NDC space (the unit
    cube) rather than world metric units; point queries are untouched by
    ray-space conversions.
    """
    from contextlib import nullcontext

    lock = device_lock if device_lock is not None else nullcontext()
    with lock:
        vol = density_volume(
            params, cfg, resolution=resolution, aabb=aabb,
            chunk=density_chunk, mesh=mesh,
        )
    use_aabb = cfg.aabb if aabb is None else aabb
    verts, faces = mesh_from_volume(
        vol, use_aabb, threshold, chunk=cell_chunk
    )
    normals = vertex_normals(verts, faces)
    out = {
        "verts": verts,
        "faces": faces,
        "normals": normals,
        "sigma_min": float(vol.min()),
        "sigma_max": float(vol.max()),
    }
    if color:
        with lock:
            rgb = vertex_colors(params, cfg, verts, normals, mesh=mesh)
        if gamma:
            from nerfmlp_tpu.data.blender import linear_to_srgb

            rgb = linear_to_srgb(np.clip(rgb, 0.0, 1.0))
        out["colors"] = rgb
    return out


# ------------------------------------------------------------------ #
# Writers (.ply binary/ascii with optional vertex color, .obj)
# ------------------------------------------------------------------ #
def ply_bytes(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    binary: bool = True,
) -> bytes:
    """Standard PLY: float32 xyz [+ float32 nxnynz] [+ uchar rgb], int32
    triangle lists. Binary little-endian by default (ascii for eyeballs).
    Returns the full file as bytes (the serve layer ships it over HTTP;
    :func:`save_ply` writes it to disk)."""
    verts = np.asarray(verts, "<f4")
    faces = np.asarray(faces, "<i4")
    n_v, n_f = verts.shape[0], faces.shape[0]
    props = ["property float x", "property float y", "property float z"]
    cols = [verts]
    if normals is not None:
        props += ["property float nx", "property float ny",
                  "property float nz"]
        cols.append(np.asarray(normals, "<f4"))
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
        cols.append(
            np.clip(np.asarray(colors) * 255.0 + 0.5, 0, 255).astype("u1")
        )
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        "ply\n"
        f"format {fmt} 1.0\n"
        "comment nerfmlp_tpu extract_mesh\n"
        f"element vertex {n_v}\n" + "\n".join(props) + "\n"
        f"element face {n_f}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    parts = [header.encode("ascii")]
    if binary:
        fields = []
        for c in cols:
            for k in range(c.shape[1]):
                fields.append((f"f{len(fields)}", c.dtype.str))
        rec = np.empty(n_v, np.dtype(fields))
        i = 0
        for c in cols:
            for k in range(c.shape[1]):
                rec[f"f{i}"] = c[:, k]
                i += 1
        parts.append(rec.tobytes())
        frec = np.empty(
            n_f, np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
        )
        frec["n"] = 3
        frec["idx"] = faces
        parts.append(frec.tobytes())
    else:
        for row in np.concatenate(
            [np.asarray(c, np.float64) for c in cols], 1
        ):
            parts.append((" ".join(_fmt_ascii(row, cols)) + "\n").encode())
        for face in faces:
            parts.append(f"3 {face[0]} {face[1]} {face[2]}\n".encode())
    return b"".join(parts)


def save_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    binary: bool = True,
) -> None:
    """Write :func:`ply_bytes` to disk."""
    with open(path, "wb") as f:
        f.write(ply_bytes(verts, faces, colors=colors, normals=normals,
                          binary=binary))


def _fmt_ascii(row, cols):
    """Format one ascii PLY vertex row: %g floats, int uchar colors."""
    out, i = [], 0
    for c in cols:
        for _ in range(c.shape[1]):
            v = row[i]
            out.append(str(int(v)) if c.dtype.kind == "u" else f"{v:.7g}")
            i += 1
    return out


def obj_str(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
) -> str:
    """Wavefront OBJ (1-based faces). Vertex color uses the widely read
    'v x y z r g b' extension when given."""
    lines = ["# nerfmlp_tpu extract_mesh"]
    for i, v in enumerate(np.asarray(verts, np.float64)):
        line = f"v {v[0]:.7g} {v[1]:.7g} {v[2]:.7g}"
        if colors is not None:
            c = np.clip(np.asarray(colors[i], np.float64), 0.0, 1.0)
            line += f" {c[0]:.5g} {c[1]:.5g} {c[2]:.5g}"
        lines.append(line)
    for face in np.asarray(faces):
        lines.append(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}")
    return "\n".join(lines) + "\n"


def save_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
) -> None:
    """Write :func:`obj_str` to disk."""
    with open(path, "w") as f:
        f.write(obj_str(verts, faces, colors=colors))


def save_mesh(path: str, mesh: Dict[str, np.ndarray], binary: bool = True):
    """Dispatch on extension: .ply (binary/ascii) or .obj."""
    lower = path.lower()
    if lower.endswith(".obj"):
        save_obj(path, mesh["verts"], mesh["faces"], mesh.get("colors"))
    elif lower.endswith(".ply"):
        save_ply(
            path,
            mesh["verts"],
            mesh["faces"],
            colors=mesh.get("colors"),
            normals=mesh.get("normals"),
            binary=binary,
        )
    else:
        raise ValueError(f"unknown mesh extension (want .ply/.obj): {path}")
