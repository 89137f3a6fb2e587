"""Volume rendering: the end-to-end ray -> pixel pipeline, as pure functions.

This replaces the reference's ``NeRFRenderer`` class (nerfmlp/renderer.py)
with jit-friendly functions:

  * :func:`render_rays` — one fully-vectorized differentiable pass over a
    batch of rays (the training hot path; reference ``_render_rays``,
    renderer.py:47-112). No Python per-ray or per-chunk loops; every shape
    is static so XLA tiles the MLP matmuls onto the MXU.
  * :func:`render_image` — whole-image inference as a ``jax.lax.map`` over
    fixed-size ray tiles (reference ``render``, renderer.py:23-45, which
    chunks at 8-16k rays). Tiles are scanned, so peak HBM stays bounded
    regardless of resolution, and the per-tile compute graph is compiled
    once.

Params are a dict with keys ``coarse`` and (optionally) ``fine`` — the
reference runs ONE shared network for both passes (renderer.py:76,103);
``RenderConfig.separate_fine`` switches to the official two-net scheme
(example/run_nerf.py:397-403).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfmlp_tpu.config import RenderConfig
from nerfmlp_tpu.models.mlp import apply_model
from nerfmlp_tpu.ops.encoding import positional_encoding
from nerfmlp_tpu.ops.integrate import composite_rays
from nerfmlp_tpu.ops.sampling import sample_pdf, stratified_sample


def _final_net(params: Dict, cfg: RenderConfig):
    """(net_params, is_fine) for the network that renders the final image:
    the fine net under separate_fine, else the shared net (reference
    renderer.py:76,103 vs run_nerf.py:397-403)."""
    net = params.get("fine") if cfg.separate_fine else None
    return (net if net is not None else params["coarse"]), net is not None


def _query_mlp(
    params: Dict,
    pts: jnp.ndarray,
    viewdirs_enc: Optional[jnp.ndarray],
    cfg: RenderConfig,
    fine: bool = False,
) -> jnp.ndarray:
    """Encode points + run the MLP. pts: (N, S, 3) -> raw (N, S, 4).

    ``viewdirs_enc``: (N, E_dir) per-ray encoded directions (broadcast over
    samples), or None when use_viewdirs=False. ``fine`` selects the fine
    net's architecture (oracle --netdepth_fine/--netwidth_fine).
    """
    n_rays, n_samples, _ = pts.shape
    if cfg.coord_scale != 1.0:
        pts = pts * cfg.coord_scale
    flat = pts.reshape(n_rays * n_samples, 3)
    mc = cfg.model_config(fine=fine)

    # The fused kernel covers bf16 (single-pass fast path) and fp32 with
    # fp32_precision="high" (hand-rolled bf16x3 — 3 bf16 MXU passes with
    # fp32 accumulation, pallas_mlp.py::_make_dot). fp32 "highest" (the
    # 6-pass golden-parity mode) stays on XLA: Mosaic's own fp32-matmul
    # decomposition explodes compile times (~8 min observed).
    # The kernel is generic over the full architecture space (r4):
    # --netdepth/--netwidth/skips and both head variants (view-dependent
    # and the no-viewdirs single output head).
    _hi_lo = (
        jnp.dtype(cfg.compute_dtype) == jnp.float32
        and cfg.fp32_precision == "high"
    )
    from nerfmlp_tpu.ops.pallas_mlp import backward_fits_vmem

    use_pallas = (
        cfg.use_pallas
        and (jnp.dtype(cfg.compute_dtype) == jnp.bfloat16 or _hi_lo)
        # Wide trunks (~768+) overflow the backward kernel's scoped-VMEM
        # budget with tile-independent weight+grad-accumulator residents;
        # route them to XLA instead of a Mosaic allocation error
        # (advisor r4; backward_fits_vmem docstring has the numbers).
        and backward_fits_vmem(mc, _hi_lo)
    )
    dirs = None
    if viewdirs_enc is not None:
        dirs = jnp.broadcast_to(
            viewdirs_enc[:, None, :], (n_rays, n_samples, viewdirs_enc.shape[-1])
        ).reshape(n_rays * n_samples, -1)

    if use_pallas:
        from nerfmlp_tpu.ops.pallas_mlp import fused_nerf_mlp

        raw = fused_nerf_mlp(params, flat, dirs, cfg, mc=mc)
    else:
        def query(p, f, d):
            enc = positional_encoding(f, cfg.pos_enc_L)
            if jnp.dtype(cfg.compute_dtype) == jnp.float32:
                # TPU XLA MISCOMPILE GUARD (r3, measured): letting XLA fuse
                # the sin/cos encoding into the fp32 matmul chain produces
                # deterministically WRONG MLP outputs at >= 2048x64 points
                # (max abs error ~248 on unit-scale activations; both
                # "highest" and "high" precision; bf16 and the Pallas
                # kernel are unaffected). Materializing the encoding with
                # an optimization barrier restores bit-exact agreement
                # with the unfused graph (0.0 diff at 262k points).
                enc = jax.lax.optimization_barrier(enc)
            return apply_model(
                p, enc, d, mc,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                fp32_precision=cfg.fp32_precision,
            )

        if cfg.remat:
            # Don't store per-layer activations for backward; recompute.
            # (The Pallas path does this intrinsically.)
            query = jax.checkpoint(query)
        raw = query(params, flat, dirs)
    return raw.astype(jnp.float32).reshape(n_rays, n_samples, 4)


def _merge_by_depth(z_c, raw_c, z_f, raw_f):
    """Merge (z, raw) pairs into depth order WITHOUT argsort/gather.

    TPU gathers are catastrophically slow (measured 4.6 ms for
    argsort + take_along_axis at the flagship train shape — half a train
    step); instead each element's DESTINATION rank in the merged order is
    a comparison count (z_c is sorted, so z_c[i]'s rank is
    i + #{z_f < z_c[i]}; z_f[j]'s is #{z_f[:j+1] <= z_f[j]}-1 +
    #{z_c <= z_f[j]} — tie-broken coarse-first, a stable merge), and the
    permutation is applied as a one-hot contraction on the MXU (the same
    trick sample_pdf uses, measured 25x over positional gathers).

    HIGHEST-precision einsum: the one-hot is exact and raw values must
    pass through bit-exact (default TPU precision would round them
    through bf16)."""
    n, c = z_c.shape
    f = z_f.shape[-1]
    m = c + f
    # Destination rank of each element of concat([z_c, z_f]).
    lt = (z_f[:, None, :] < z_c[:, :, None]).astype(jnp.int32)   # (N, C, F)
    rank_c = jnp.arange(c, dtype=jnp.int32)[None, :] + lt.sum(-1)
    le_cf = (z_c[:, :, None] <= z_f[:, None, :]).astype(jnp.int32)
    # z_f may be unsorted (perturbed sampling): rank among z_f itself is a
    # comparison count too (strict < plus earlier-index ties).
    le_ff = (
        (z_f[:, None, :] < z_f[:, :, None])
        | (
            (z_f[:, None, :] == z_f[:, :, None])
            & (jnp.arange(f)[None, None, :] < jnp.arange(f)[None, :, None])
        )
    ).astype(jnp.int32)                                           # (N, F, F)
    rank_f = le_ff.sum(-1) + le_cf.sum(1)
    ranks = jnp.concatenate([rank_c, rank_f], axis=-1)            # (N, M)
    packed = jnp.concatenate(
        [
            jnp.concatenate([z_c, z_f], -1)[..., None],
            jnp.concatenate([raw_c, raw_f], 1),
        ],
        axis=-1,
    )                                                             # (N, M, 5)
    onehot = (
        ranks[:, None, :] == jnp.arange(m, dtype=jnp.int32)[None, :, None]
    ).astype(packed.dtype)                                        # (N, M, M)
    merged = jnp.einsum(
        "nkj,njc->nkc", onehot, packed,
        precision=jax.lax.Precision.HIGHEST,
    )
    return merged[..., 0], merged[..., 1:]


def render_rays(
    params: Dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rng: Optional[jax.Array],
    cfg: RenderConfig,
    near=None,
    far=None,
    occ_grid=None,
    viewdirs=None,
) -> Dict[str, jnp.ndarray]:
    """Differentiable coarse(+fine) render of (N, 3) ray batches.

    Returns fine maps under the reference's keys (``rgb_map`` etc.) plus
    ``*_coarse`` companions when hierarchical sampling is on
    (renderer.py:109-110). ``near``/``far`` default to the config but can
    be per-ray arrays (used by the zoom/look-at tooling).

    ``viewdirs``: optional (N, 3) WORLD-space view directions. Needed for
    NDC rays, whose ``rays_d`` live in NDC space — the oracle conditions
    the view branch on world directions computed BEFORE the NDC transform
    (example/run_nerf.py:297-312). Defaults to normalize(rays_d).
    """
    n_rays = rays_o.shape[0]
    near = cfg.near if near is None else near
    far = cfg.far if far is None else far
    far_cap = None
    if cfg.aabb is not None:
        from nerfmlp_tpu.ops.rays import intersect_aabb

        # Under tightening, the last sample sits at the box EXIT, not
        # scene infinity — cap its interval at the pre-tightening far so
        # beyond-box space contributes nothing instead of amplifying
        # boundary density noise through the reference's 1e10 convention
        # (composite_rays docstring; measured -4.2 dB without it, r5).
        far_cap = far
        # Tighten within the RESOLVED bounds so explicit near/far overrides
        # (zoom/look-at tooling) are respected, not cfg's globals.
        near, far = intersect_aabb(
            rays_o, rays_d, cfg.aabb[:3], cfg.aabb[3:], near, far
        )

    if rng is None:
        k_strat = k_noise_c = k_pdf = k_noise_f = None
    else:
        k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)

    viewdirs_enc_pre = None
    if cfg.use_viewdirs:
        if cfg.ndc and viewdirs is None:
            raise ValueError(
                "cfg.ndc with use_viewdirs requires explicit world-space "
                "viewdirs: normalizing NDC-space rays_d conditions the "
                "view branch on the wrong directions (the oracle computes "
                "viewdirs BEFORE the NDC projection, run_nerf.py:297-312)"
            )
        vd = rays_d if viewdirs is None else viewdirs
        vd = vd / (jnp.linalg.norm(vd, axis=-1, keepdims=True) + 1e-8)
        viewdirs_enc_pre = positional_encoding(vd, cfg.dir_enc_L)

    # --- Occupancy-grid sampling path (ops/occupancy.py) -----------------
    # The coarse MLP pass is replaced by a density-grid lookup over dense
    # stratified depths; all real samples go into occupied space and the
    # network runs once.
    if cfg.use_occupancy and occ_grid is None:
        # Falling back to the hierarchical path here would be silently
        # WRONG under separate_fine: occupancy training never trains the
        # coarse net (its job is the grid's), so coarse-driven fine-sample
        # placement renders garbage with no error. To render without the
        # grid, pass a cfg with use_occupancy=False explicitly.
        raise ValueError(
            "cfg.use_occupancy=True but no occ_grid was passed — build one "
            "with ops.occupancy.create_grid/update_grid, or render with "
            "dataclasses.replace(cfg, use_occupancy=False)"
        )
    if cfg.use_occupancy and occ_grid is not None:
        from nerfmlp_tpu.ops.occupancy import occupancy_weights

        z_dense = stratified_sample(
            k_strat, n_rays, cfg.occ_dense_samples, near, far,
            perturb=cfg.perturb, lindisp=cfg.lindisp,
        )
        w = occupancy_weights(
            occ_grid, rays_o, rays_d, z_dense, cfg, cfg.occ_threshold
        )
        # Interval mass between consecutive dense depths (M-1 weights over
        # M bin edges) — endpoint occupancy is NOT discarded (the coarse
        # path's w[1:-1] convention would drop surfaces at the interval
        # boundaries, exactly the rays an aabb-tightened near/far creates).
        w_int = 0.5 * (w[..., 1:] + w[..., :-1])
        # With separate_fine the single occupancy network is the FINE net
        # (it renders the final image and is also the grid's density
        # source, ops/occupancy.py::update_grid); the coarse net is
        # unused — its whole job was sample placement, now the grid's.
        net, is_fine = _final_net(params, cfg)
        one_shot = cfg.occ_one_shot or cfg.N_importance <= 0
        if one_shot:
            # r4 protocol: ALL depths from the grid prior, one MLP pass.
            n_total = cfg.N_samples + cfg.N_importance
            # stratified=True yields monotone samples -> no per-ray sort.
            z_vals = sample_pdf(
                k_pdf, z_dense, w_int, n_total,
                det=not cfg.perturb, stratified=True,
            )
            z_vals = jax.lax.stop_gradient(z_vals)
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            raw = _query_mlp(net, pts, viewdirs_enc_pre, cfg, fine=is_fine)
        else:
            # r5 default — HIERARCHICAL occupancy, same total MLP evals:
            # the grid places N_samples probes in occupied space, the
            # probes' actual compositing weights place the N_importance
            # refinement samples on the surfaces the ray sees (one-shot
            # grid sampling spreads depths over ALL occupied cells, which
            # starves thin structure at any budget — docs/RESULTS.md
            # hard-scene root-cause table).
            k_pdf_a = k_pdf_b = None
            if k_pdf is not None:
                k_pdf_a, k_pdf_b = jax.random.split(k_pdf)
            z_probe = sample_pdf(
                k_pdf_a, z_dense, w_int, cfg.N_samples,
                det=not cfg.perturb, stratified=True,
            )
            z_probe = jax.lax.stop_gradient(z_probe)
            pts_p = rays_o[:, None, :] + rays_d[:, None, :] * z_probe[..., None]
            raw_p = _query_mlp(net, pts_p, viewdirs_enc_pre, cfg, fine=is_fine)
            probe = composite_rays(
                raw_p, z_probe, rays_d,
                rng=k_noise_c, raw_noise_std=cfg.raw_noise_std,
                white_bkgd=cfg.white_bkgd, far_cap=far_cap,
            )
            z_mids = 0.5 * (z_probe[..., 1:] + z_probe[..., :-1])
            z_new = sample_pdf(
                k_pdf_b, z_mids, probe["weights"][..., 1:-1],
                cfg.N_importance, det=not cfg.perturb,
            )
            z_new = jax.lax.stop_gradient(z_new)
            pts_n = rays_o[:, None, :] + rays_d[:, None, :] * z_new[..., None]
            raw_n = _query_mlp(net, pts_n, viewdirs_enc_pre, cfg, fine=is_fine)
            z_vals, raw = _merge_by_depth(z_probe, raw_p, z_new, raw_n)
        out = composite_rays(
            raw, z_vals, rays_d,
            rng=k_noise_f, raw_noise_std=cfg.raw_noise_std,
            white_bkgd=cfg.white_bkgd, far_cap=far_cap,
        )
        return {
            "rgb_map": out["rgb_map"],
            "depth_map": out["depth_map"],
            "disp_map": out["disp_map"],
            "acc_map": out["acc_map"],
        }

    # --- Coarse pass -----------------------------------------------------
    z_vals = stratified_sample(
        k_strat, n_rays, cfg.N_samples, near, far,
        perturb=cfg.perturb, lindisp=cfg.lindisp,
    )
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    viewdirs_enc = viewdirs_enc_pre
    raw = _query_mlp(params["coarse"], pts, viewdirs_enc, cfg)
    coarse = composite_rays(
        raw, z_vals, rays_d,
        rng=k_noise_c, raw_noise_std=cfg.raw_noise_std,
        white_bkgd=cfg.white_bkgd, far_cap=far_cap,
    )

    if cfg.N_importance <= 0:
        return {
            "rgb_map": coarse["rgb_map"],
            "depth_map": coarse["depth_map"],
            "disp_map": coarse["disp_map"],
            "acc_map": coarse["acc_map"],
        }

    # --- Fine pass (hierarchical importance sampling) --------------------
    z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(
        k_pdf, z_mids, coarse["weights"][..., 1:-1], cfg.N_importance,
        det=not cfg.perturb,
    )
    z_samples = jax.lax.stop_gradient(z_samples)  # renderer.py:88 (.detach())

    fine_params, is_fine = _final_net(params, cfg)
    if not is_fine:
        # Shared coarse/fine net (the reference's default, renderer.py:76,
        # 103): the coarse raw outputs at z_vals are EXACTLY what the fine
        # pass would recompute for those depths — reuse them and query the
        # network only at the N_importance NEW depths, then merge into
        # sorted order. Bit-identical math (pure CSE: same params, same
        # points), 25% fewer MLP evals per hierarchical render — in both
        # the forward and the recompute-backward (autodiff sums the two
        # uses' cotangents into one backward pass automatically).
        pts_new = (
            rays_o[:, None, :] + rays_d[:, None, :] * z_samples[..., None]
        )
        raw_new = _query_mlp(fine_params, pts_new, viewdirs_enc, cfg)
        z_vals_fine, raw_fine = _merge_by_depth(
            z_vals, raw, z_samples, raw_new
        )
    else:
        z_vals_fine = jnp.sort(
            jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1
        )
        pts_fine = (
            rays_o[:, None, :] + rays_d[:, None, :] * z_vals_fine[..., None]
        )
        raw_fine = _query_mlp(
            fine_params, pts_fine, viewdirs_enc, cfg, fine=is_fine
        )
    fine = composite_rays(
        raw_fine, z_vals_fine, rays_d,
        rng=k_noise_f, raw_noise_std=cfg.raw_noise_std,
        white_bkgd=cfg.white_bkgd, far_cap=far_cap,
    )

    return {
        "rgb_map": fine["rgb_map"],
        "depth_map": fine["depth_map"],
        "disp_map": fine["disp_map"],
        "acc_map": fine["acc_map"],
        "rgb_map_coarse": coarse["rgb_map"],
        "depth_map_coarse": coarse["depth_map"],
        "disp_map_coarse": coarse["disp_map"],  # oracle's 'disp0' TB image
        "acc_map_coarse": coarse["acc_map"],
        "z_std": jnp.std(z_samples, axis=-1),  # official extra (run_nerf.py:237)
    }


def render_image_maps(
    params: Dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    H: int,
    W: int,
    cfg: RenderConfig,
    tile: int = 4096,
    near=None,
    far=None,
    occ_grid=None,
    viewdirs=None,
    maps: Tuple[str, ...] = ("rgb_map",),
) -> Dict[str, jnp.ndarray]:
    """Whole-image inference: (H*W, 3) rays -> requested (H, W, ...) maps.

    ``maps`` selects which render_rays outputs to assemble (``rgb_map``,
    ``disp_map``, ``depth_map``, ``acc_map``) — the oracle's render_path
    collects both rgb and disp for its videos (run_nerf.py:352-367).

    Deterministic (perturb/noise forced off, as in render_example.py:
    227-236). Rays are padded to a multiple of ``tile`` and a SINGLE
    jit-compiled tile program is dispatched per tile from the host — the
    TPU analog of the reference's 8k-ray chunk loop (renderer.py:36-43).

    Why a host loop and not ``lax.map``: scanning over a body that
    contains the Pallas kernel serializes pathologically on this backend
    (~10x slower than back-to-back dispatches of the same program) and
    multiplies compile time; 100-odd async dispatches of one compiled
    program cost ~1 ms each and pipeline fine.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, perturb=False, raw_noise_std=0.0)
    n_rays = rays_o.shape[0]
    n_tiles = -(-n_rays // tile)
    pad = n_tiles * tile - n_rays
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    # Pad with a valid direction to avoid 0-norm viewdirs on padded lanes.
    _down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (pad, 3))
    rays_d = jnp.concatenate([rays_d, _down], axis=0)
    if viewdirs is not None:
        viewdirs = jnp.concatenate([jnp.asarray(viewdirs), _down], axis=0)

    tile_fn = _tile_render_fn(cfg, tuple(maps))

    def _pad_bound(b, default, fill):
        """Per-ray near/far arrays are padded ONCE like the rays (padded
        lanes get a valid dummy interval); scalars pass through."""
        b = jnp.asarray(b if b is not None else default)
        if b.ndim == 0:
            return b
        return jnp.pad(b, (0, pad), constant_values=fill)

    near_arg = _pad_bound(near, cfg.near, 1.0)
    far_arg = _pad_bound(far, cfg.far, 2.0)

    def _bound_slice(b, i):
        if b.ndim == 0:
            return b
        return jax.lax.dynamic_slice_in_dim(b, i * tile, tile)

    outs = [
        tile_fn(
            params,
            jax.lax.dynamic_slice_in_dim(rays_o, i * tile, tile),
            jax.lax.dynamic_slice_in_dim(rays_d, i * tile, tile),
            _bound_slice(near_arg, i),
            _bound_slice(far_arg, i),
            occ_grid,
            None if viewdirs is None
            else jax.lax.dynamic_slice_in_dim(viewdirs, i * tile, tile),
        )
        for i in range(n_tiles)
    ]
    result = {}
    for key in maps:
        flat = jnp.concatenate([o[key] for o in outs], axis=0)[:n_rays]
        shape = (H, W) + flat.shape[1:]
        result[key] = flat.reshape(shape)
    return result


def render_image(
    params: Dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    H: int,
    W: int,
    cfg: RenderConfig,
    tile: int = 4096,
    near=None,
    far=None,
    occ_grid=None,
    viewdirs=None,
) -> jnp.ndarray:
    """(H*W, 3) rays -> (H, W, 3) rgb (see :func:`render_image_maps`)."""
    return render_image_maps(
        params, rays_o, rays_d, H, W, cfg, tile=tile, near=near, far=far,
        occ_grid=occ_grid, viewdirs=viewdirs, maps=("rgb_map",),
    )["rgb_map"]


@functools.lru_cache(maxsize=32)
def _tile_render_fn(cfg: RenderConfig, maps: Tuple[str, ...]):
    """One compiled deterministic tile renderer per (config, maps) pair
    (cfg is a frozen dataclass, so it is a valid cache key)."""

    @jax.jit
    def tile_fn(params, o, d, near, far, occ_grid, viewdirs):
        out = render_rays(
            params, o, d, None, cfg, near=near, far=far,
            occ_grid=occ_grid, viewdirs=viewdirs,
        )
        return {k: out[k] for k in maps}

    return tile_fn
