"""Fused NeRF-MLP Pallas TPU kernel.

The reference's hot path queries an 8x256 MLP 256 times per ray
(nerfmlp/renderer.py:76,103). Under plain XLA each Dense layer is its own
HLO: every (N, 256) activation round-trips HBM between layers — at the
flagship batch (262,144 points/step) that is ~2 GB of forward traffic
alone, which dominates step time (the matmuls themselves are ~1 TFLOP).

This kernel runs the ENTIRE network for a tile of points in one
``pallas_call``:

  * all weights (~600k params) are resident in VMEM (~1.2 MB bf16) for
    every grid step — they are re-fetched per tile by the pipeline but
    never leave on-chip memory between layers,
  * the positional encoding is computed in-kernel (one (3, 63) matmul +
    masked sin/cos), so HBM sees only raw points (3 floats) + encoded
    viewdirs (27, per-ray, broadcast) in and the 4-float output out;
    trunk activations live and die in VMEM/registers,
  * the skip concat (cat([x, h]) @ W5, model.py:62-64) is decomposed into
    ``x @ W5[:63] + h @ W5[63:]`` — two MXU calls, no concat,
  * likewise the view head's cat([bottleneck, dirs]) @ Wv,
  * matmuls accumulate in fp32 (``preferred_element_type``) with bf16 or
    fp32 operands per ``cfg.compute_dtype``.

The backward pass is a second fused kernel of the same shape
(flash-attention style): it RECOMPUTES the forward activations per tile in
VMEM and accumulates per-layer weight grads across grid steps, so training
never materializes trunk activations in HBM either.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nerfmlp_tpu.config import RenderConfig


# Fixed layer order for flattened weight lists fed to the kernels.
_TRUNK = [f"pts_{i}" for i in range(8)]
_HEADS = ["bottleneck", "view", "rgb", "sigma"]

DEFAULT_TILE = 1024


def _interpret() -> bool:
    """Interpret mode off-TPU (tests run on the CPU platform)."""
    return jax.default_backend() != "tpu"


def _flatten_params(params: Dict, skip_dim: int, dtype) -> Tuple[list, list]:
    """Params pytree -> ordered [kernels...], [biases...] with the skip and
    view-layer kernels split into their two operand blocks."""
    ks, bs = [], []
    for name in _TRUNK + _HEADS:
        k = params[name]["kernel"].astype(dtype)
        b = params[name]["bias"].astype(jnp.float32).reshape(1, -1)
        if name == "pts_5":
            ks.append(k[:skip_dim])   # encoded-input block
            ks.append(k[skip_dim:])   # hidden-state block
            bs.append(b)
        elif name == "view":
            ks.append(k[:256])        # bottleneck block
            ks.append(k[256:])        # viewdir block
            bs.append(b)
        else:
            ks.append(k)
            bs.append(b)
    return ks, bs


@functools.lru_cache(maxsize=None)
def _encode_consts(n_freqs: int):
    """Constants for in-kernel positional encoding.

    gamma(x) (reference layout: [x, sin(f0 x), cos(f0 x), ...]) is computed
    as one (3, 3+6L) matmul followed by a masked sin/cos — a single MXU call
    plus VPU transcendentals, instead of a separate XLA pass whose output
    round-trips HBM into the kernel.
    """
    from nerfmlp_tpu.ops.encoding import frequency_bands

    bands = frequency_bands(n_freqs)
    dim = 3 + 6 * n_freqs
    m = np.zeros((3, dim), np.float32)
    kind = np.zeros((1, dim), np.int32)  # 0 = identity, 1 = sin, 2 = cos
    m[:, :3] = np.eye(3)
    for l, f in enumerate(bands):
        c0 = 3 + 6 * l
        m[:, c0 : c0 + 3] = np.eye(3) * f
        kind[0, c0 : c0 + 3] = 1
        m[:, c0 + 3 : c0 + 6] = np.eye(3) * f
        kind[0, c0 + 3 : c0 + 6] = 2
    # Cached + shared: freeze against accidental in-place mutation.
    m.setflags(write=False)
    kind.setflags(write=False)
    return m, kind


def _encode_tile(pts, enc_m, enc_kind, dt):
    """(T, 3) points -> (T, 3+6L) encoded features, in VMEM.

    ``enc_m``/``enc_kind`` come in as kernel inputs (Pallas kernels cannot
    capture array constants)."""
    a = jnp.dot(
        pts.astype(jnp.float32), enc_m, preferred_element_type=jnp.float32
    )
    enc = jnp.where(
        enc_kind == 0, a, jnp.where(enc_kind == 1, jnp.sin(a), jnp.cos(a))
    )
    return enc.astype(dt)


def _mlp_tile_math(x, dirs, ks, bs, dt):
    """The full network on one (T, enc) tile; shared by fwd and bwd kernels.

    Returns (out, residuals) where residuals are the post-ReLU trunk
    activations + head intermediates needed by the backward pass.
    """
    f32 = jnp.float32
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)

    hs = []  # post-relu trunk activations h_0..h_7
    h = x
    ki = 0
    for i in range(8):
        if i == 5:
            acc = dot(x, ks[ki]) + dot(h, ks[ki + 1]) + bs[i]
            ki += 2
        else:
            acc = dot(h, ks[ki]) + bs[i]
            ki += 1
        h = jnp.maximum(acc, 0.0).astype(dt)
        hs.append(h)

    # Heads: ks[9]=Wb, ks[10]=Wv_bott, ks[11]=Wv_dirs, ks[12]=Wr, ks[13]=Ws
    bott = (dot(h, ks[9]) + bs[8]).astype(dt)
    v_acc = dot(bott, ks[10]) + dot(dirs, ks[11]) + bs[9]
    v = jnp.maximum(v_acc, 0.0).astype(dt)
    rgb = dot(v, ks[12]) + bs[10]
    sigma = dot(h, ks[13]) + bs[11]
    out = jnp.concatenate([rgb, sigma], axis=-1)
    return out, (hs, bott, v)


def _fwd_kernel(n_weights, dt, pts_ref, d_ref, em_ref, ek_ref, *refs):
    ks = [refs[i][:] for i in range(n_weights)]
    bs = [refs[n_weights + i][:] for i in range(12)]
    out_ref = refs[n_weights + 12]
    x = _encode_tile(pts_ref[:], em_ref[:], ek_ref[:], dt)
    out, _ = _mlp_tile_math(x, d_ref[:], ks, bs, dt)
    out_ref[:] = out.astype(jnp.float32)


def _pallas_forward(
    pts: jnp.ndarray, dirs: jnp.ndarray, ks: list, bs: list,
    n_freqs: int, dt, tile: int
) -> jnp.ndarray:
    n = pts.shape[0]
    grid = (n // tile,)
    n_w = len(ks)

    # Weights are small; full-array blocks resident in VMEM every step.
    w_specs = [pl.BlockSpec(k.shape, lambda i: (0, 0)) for k in ks]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]

    em, ek = _encode_consts(n_freqs)
    em, ek = jnp.asarray(em), jnp.asarray(ek)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_w, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, pts.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile, dirs.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec(em.shape, lambda i: (0, 0)),
            pl.BlockSpec(ek.shape, lambda i: (0, 0)),
            *w_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=_interpret(),
    )(pts, dirs, em, ek, *ks, *bs)


def _bwd_kernel(n_weights, dt, pts_ref, d_ref, em_ref, ek_ref, *refs):
    """Recompute-forward backward: accumulates dW/db across grid steps.

    refs = [*ks, *bs, g_ref, *dk_refs, *db_refs]; all dk/db blocks map to
    block (0, 0) for every grid step, so `+=` accumulates over tiles.
    """
    ks = [refs[i][:] for i in range(n_weights)]
    bs = [refs[n_weights + i][:] for i in range(12)]
    g_ref = refs[n_weights + 12]
    dk_refs = refs[n_weights + 13 : 2 * n_weights + 13]
    db_refs = refs[2 * n_weights + 13 :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*dk_refs, *db_refs):
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = _encode_tile(pts_ref[:], em_ref[:], ek_ref[:], dt)
    dirs = d_ref[:]
    _, (hs, bott, v) = _mlp_tile_math(x, dirs, ks, bs, dt)

    f32 = jnp.float32
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
    # dW = a^T @ g  — contract over the tile dimension without transposing.
    dotT = lambda a, g: jax.lax.dot_general(
        a, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    # g @ k^T without materializing a transpose (contract both dim 1).
    dotKT = lambda g, k: jax.lax.dot_general(
        g, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )

    g = g_ref[:]
    g_rgb = g[:, 0:3].astype(dt)
    g_sigma = g[:, 3:4].astype(dt)
    h7 = hs[7]

    # rgb head: rgb = v @ Wr + br
    dk_refs[12][:] += dotT(v, g_rgb)
    db_refs[10][:] += jnp.sum(g_rgb.astype(f32), 0, keepdims=True)
    dv = dotKT(g_rgb, ks[12])
    # v5e Mosaic has no bf16 compare — mask in f32.
    dv = jnp.where(v.astype(f32) > 0, dv, 0.0).astype(dt)

    # view layer: v = relu(bott @ Wv_b + dirs @ Wv_d + bv)
    dk_refs[10][:] += dotT(bott, dv)
    dk_refs[11][:] += dotT(dirs, dv)
    db_refs[9][:] += jnp.sum(dv.astype(f32), 0, keepdims=True)
    dbott = dotKT(dv, ks[10]).astype(dt)

    # bottleneck: bott = h7 @ Wb + bb  (no relu)
    dk_refs[9][:] += dotT(h7, dbott)
    db_refs[8][:] += jnp.sum(dbott.astype(f32), 0, keepdims=True)

    # sigma head: sigma = h7 @ Ws + bs
    dk_refs[13][:] += dotT(h7, g_sigma)
    db_refs[11][:] += jnp.sum(g_sigma.astype(f32), 0, keepdims=True)

    dh = (dotKT(dbott, ks[9]) + dotKT(g_sigma, ks[13])).astype(dt)

    # Trunk, reversed. Layer i consumed input a_i (= x for 0; h_{i-1}
    # otherwise; for 5 both x and h_4) and produced h_i = relu(acc_i).
    # Kernel-index map for trunk layers (layer 5 has two blocks).
    k_idx = []
    kk = 0
    for i in range(8):
        if i == 5:
            k_idx.append((kk, kk + 1))
            kk += 2
        else:
            k_idx.append((kk,))
            kk += 1

    for i in range(7, -1, -1):
        dacc = jnp.where(hs[i].astype(f32) > 0, dh.astype(f32), 0.0).astype(dt)
        db_refs[i][:] += jnp.sum(dacc.astype(f32), 0, keepdims=True)
        if i == 5:
            i_x, i_h = k_idx[5]
            dk_refs[i_x][:] += dotT(x, dacc)
            dk_refs[i_h][:] += dotT(hs[4], dacc)
            dh = dotKT(dacc, ks[i_h]).astype(dt)  # d(enc) branch dropped
        else:
            (i_k,) = k_idx[i]
            a = x if i == 0 else hs[i - 1]
            dk_refs[i_k][:] += dotT(a, dacc)
            if i > 0:
                dh = dotKT(dacc, ks[i_k]).astype(dt)


def _pallas_backward(
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    ks: list,
    bs: list,
    g: jnp.ndarray,
    n_freqs: int,
    dt,
    tile: int,
):
    n = pts.shape[0]
    grid = (n // tile,)
    n_w = len(ks)

    w_specs = [pl.BlockSpec(k.shape, lambda i: (0, 0)) for k in ks]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]
    dk_specs = [pl.BlockSpec(k.shape, lambda i: (0, 0)) for k in ks]
    db_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]

    em, ek = _encode_consts(n_freqs)
    em, ek = jnp.asarray(em), jnp.asarray(ek)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_w, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, pts.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile, dirs.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec(em.shape, lambda i: (0, 0)),
            pl.BlockSpec(ek.shape, lambda i: (0, 0)),
            *w_specs,
            *b_specs,
            pl.BlockSpec((tile, 4), lambda i: (i, 0)),
        ],
        out_specs=[*dk_specs, *db_specs],
        out_shape=[
            *[jax.ShapeDtypeStruct(k.shape, jnp.float32) for k in ks],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs],
        ],
        interpret=_interpret(),
    )(pts, dirs, em, ek, *ks, *bs, g)


def _grads_to_pytree(dks: list, dbs: list, params: Dict) -> Dict:
    """Reassemble flattened kernel/bias grads into the param pytree."""
    out = {}
    ki = 0
    bi = 0
    for name in _TRUNK + _HEADS:
        if name == "pts_5":
            dk = jnp.concatenate([dks[ki], dks[ki + 1]], axis=0)
            ki += 2
        elif name == "view":
            dk = jnp.concatenate([dks[ki], dks[ki + 1]], axis=0)
            ki += 2
        else:
            dk = dks[ki]
            ki += 1
        out[name] = {
            "kernel": dk.astype(params[name]["kernel"].dtype),
            "bias": dbs[bi].reshape(-1).astype(params[name]["bias"].dtype),
        }
        bi += 1
    return out


def _fwd_tile(n: int, tile: int) -> int:
    """Forward-only grid steps are cheaper at 2x the tile (fewer fixed
    per-step costs; measured 4.17 -> 3.88 ms at N=262k). The backward
    kernel stays at ``tile`` — its stored activations OOM VMEM beyond 1024."""
    return 2 * tile if n % (2 * tile) == 0 and 2 * tile <= 2048 else tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_apply(params, pts, dirs, n_freqs: int, dt_name: str, tile: int):
    dt = jnp.dtype(dt_name)
    enc_dim = 3 + 6 * n_freqs
    ks, bs = _flatten_params(params, enc_dim, dt)
    return _pallas_forward(
        pts, dirs.astype(dt), ks, bs, n_freqs, dt, _fwd_tile(pts.shape[0], tile)
    )


def _fused_fwd(params, pts, dirs, n_freqs, dt_name, tile):
    out = _fused_apply(params, pts, dirs, n_freqs, dt_name, tile)
    return out, (params, pts, dirs)


def _fused_bwd(n_freqs, dt_name, tile, res, g):
    params, pts, dirs = res
    dt = jnp.dtype(dt_name)
    enc_dim = 3 + 6 * n_freqs
    ks, bs = _flatten_params(params, enc_dim, dt)
    outs = _pallas_backward(
        pts, dirs.astype(dt), ks, bs, g.astype(jnp.float32), n_freqs, dt, tile
    )
    dks, dbs = outs[: len(ks)], outs[len(ks) :]
    dparams = _grads_to_pytree(dks, dbs, params)
    return dparams, jnp.zeros_like(pts), jnp.zeros_like(dirs)


_fused_apply.defvjp(_fused_fwd, _fused_bwd)


def fused_nerf_mlp(
    params: Dict,
    pts_flat: jnp.ndarray,
    dirs_enc_flat: Optional[jnp.ndarray],
    cfg: RenderConfig,
    tile: int = DEFAULT_TILE,
    mc=None,
) -> jnp.ndarray:
    """Fused encode->MLP->(rgb, sigma) Pallas kernel. pts: (N, 3) -> raw (N, 4).

    Supports the reference architecture (8x256 trunk, skip at 5, 256-wide
    bottleneck) — other shapes take the XLA path via use_pallas=False.

    Differentiable w.r.t. ``params`` (positions/dirs get zero cotangents —
    fine for NeRF training where ray geometry is data, renderer.py:88
    stop-gradients the sampled depths anyway).
    """
    if not cfg.use_viewdirs or dirs_enc_flat is None:
        raise NotImplementedError(
            "fused kernel currently requires use_viewdirs=True; "
            "set use_pallas=False for the no-viewdirs architecture"
        )
    # The kernels hardcode the reference architecture; fail actionably on
    # anything else instead of deep inside Mosaic shape errors. ``mc``:
    # the resolved net config (callers pass the fine net's when querying
    # it; default = the coarse architecture).
    mc = mc or cfg.model_config()
    if (
        mc.depth != 8 or mc.skips != (5,) or mc.width != 256
        or mc.bottleneck_ch != 256 or mc.view_width != 128
        or "pts_7" not in params
    ):
        raise NotImplementedError(
            "fused kernel supports only the reference architecture "
            "(8x256 trunk, skip at 5, 256-wide bottleneck); "
            "set use_pallas=False for custom shapes"
        )
    n = pts_flat.shape[0]
    tile = min(tile, max(256, 1 << (n - 1).bit_length()))
    # The backward kernel's stored activations OOM VMEM beyond tile 1024
    # (the forward pass doubles the tile itself when shapes allow).
    tile = min(tile, DEFAULT_TILE)
    pad = (-n) % tile
    if pad:
        pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
        dirs_enc_flat = jnp.pad(dirs_enc_flat, ((0, pad), (0, 0)))

    out = _fused_apply(
        params, pts_flat, dirs_enc_flat, cfg.pos_enc_L,
        str(jnp.dtype(cfg.compute_dtype)), tile,
    )
    return out[:n]
