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


def _compiler_params(limit_mb: int = 32):
    """Raise Mosaic's scoped-VMEM budget above the 16MB default (v5e has
    128MB physical VMEM): the recompute-backward kernel sits at ~16.4MB
    at tile 1024 and the default budget rejects it. Off-TPU (interpret
    mode) compiler params don't apply."""
    if _interpret():
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)


# Fixed layer order for flattened weight lists fed to the kernels.
# The trunk is arch-dependent (pts_0..pts_{depth-1}); heads are fixed.
_HEADS = ["bottleneck", "view", "rgb", "sigma"]

DEFAULT_TILE = 1024


def _interpret() -> bool:
    """Interpret mode off-TPU (tests run on the CPU platform)."""
    return jax.default_backend() != "tpu"


def _split_bf16(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 -> (hi, lo) bf16 pair with hi + lo ≈ a (the bf16x3 split).

    Three bf16 MXU passes (hi@hi + hi@lo + lo@hi) reproduce an fp32 matmul
    to ~1e-7 relative — the same scheme XLA uses for
    ``jax.lax.Precision.HIGH`` on TPU, done by hand here because Mosaic's
    own fp32-matmul decomposition explodes compile times (~8 min)."""
    a = a.astype(jnp.float32)
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(hi_lo: bool):
    """Forward dot: plain single-pass, or 3-pass bf16x3 when ``hi_lo``.

    In hi_lo mode each logical weight is a (hi, lo) bf16 pair and the
    activation operand is split per call (the compiler CSEs repeated
    splits of the same value)."""
    f32 = jnp.float32
    if not hi_lo:
        return lambda a, w: jnp.dot(a, w, preferred_element_type=f32)

    def dot3(a, w):
        w_hi, w_lo = w
        a_hi, a_lo = _split_bf16(a)
        return (
            jnp.dot(a_hi, w_hi, preferred_element_type=f32)
            + jnp.dot(a_hi, w_lo, preferred_element_type=f32)
            + jnp.dot(a_lo, w_hi, preferred_element_type=f32)
        )

    return dot3


def _flatten_params(
    params: Dict,
    skip_dim: int,
    dtype,
    hi_lo: bool = False,
    depth: int = 8,
    skips: Tuple[int, ...] = (5,),
    bottleneck_ch: int = 256,
    vdirs: bool = True,
) -> Tuple[list, list]:
    """Params pytree -> ordered [kernels...], [biases...] with the skip and
    view-layer kernels split into their two operand blocks.

    ``hi_lo=True`` (the fp32_precision="high" kernel mode) emits each
    logical kernel as a (hi, lo) bf16 pair instead of one array.
    ``depth``/``skips``/``bottleneck_ch``/``vdirs`` describe the
    architecture (config.py::ModelConfig) — any depth/width, any skip set;
    ``vdirs=False`` is the single-output-head variant (model.py:55)."""
    ks, bs = [], []

    def emit(k):
        ks.append(_split_bf16(k) if hi_lo else k.astype(dtype))

    trunk = [f"pts_{i}" for i in range(depth)]
    for i, name in enumerate(trunk + (_HEADS if vdirs else ["output"])):
        k = params[name]["kernel"]
        b = params[name]["bias"].astype(jnp.float32).reshape(1, -1)
        if i < depth and i in skips:
            emit(k[:skip_dim])   # encoded-input block
            emit(k[skip_dim:])   # hidden-state block
            bs.append(b)
        elif name == "view":
            emit(k[:bottleneck_ch])  # bottleneck block
            emit(k[bottleneck_ch:])  # viewdir block
            bs.append(b)
        else:
            emit(k)
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
    capture array constants).

    The frequency matrix holds only 0 / 1 / 2^l — every entry is EXACT in
    bf16 — and three bf16 pieces cover an f32 mantissa (3 x 8 bits), so
    p1+p2+p3 == pts exactly (each residual subtraction is Sterbenz-exact)
    and three bf16 MXU passes against the exact matrix reproduce the fp32
    matmul to f32-accumulation rounding. Full precision here matters:
    sin/cos args reach |x|·2^9 ≈ 2048, where even 2^-16 operand error
    becomes a visible phase error (a 2-piece split measured 3e-2 output
    error; the pre-fix single f32 matmul was Mosaic-decomposed — correct
    but the documented ~8-min-compile hazard in fp32 mode)."""
    m = enc_m.astype(jnp.bfloat16)  # exact: entries are powers of two
    f32 = jnp.float32
    p1 = pts.astype(jnp.bfloat16)
    r1 = pts - p1.astype(f32)
    p2 = r1.astype(jnp.bfloat16)
    p3 = (r1 - p2.astype(f32)).astype(jnp.bfloat16)
    # One (T, 9) @ (9, 63) matmul instead of three (T, 3) passes: the MXU
    # accumulates all three pieces' products in one f32 accumulator (same
    # value, tighter rounding) and the kernel holds ONE (T, 63) f32
    # temporary instead of three — three separate passes pushed the
    # backward kernel 351KB past the 16MB scoped-VMEM budget at tile 1024.
    p_cat = jnp.concatenate([p1, p2, p3], axis=1)
    m_cat = jnp.concatenate([m, m, m], axis=0)
    a = jnp.dot(p_cat, m_cat, preferred_element_type=f32)
    enc = jnp.where(
        enc_kind == 0, a, jnp.where(enc_kind == 1, jnp.sin(a), jnp.cos(a))
    )
    return enc.astype(dt)


def _mlp_tile_math(x, dirs, ks, bs, dt, hi_lo: bool = False,
                   depth: int = 8, skips: Tuple[int, ...] = (5,),
                   vdirs: bool = True):
    """The full network on one (T, enc) tile; shared by fwd and bwd kernels.

    Returns (out, residuals) where residuals are the post-ReLU trunk
    activations + head intermediates needed by the backward pass. The
    Python loop unrolls at trace time, so any ``depth``/``skips`` works.
    ``vdirs=False``: single output head, ``dirs`` ignored (model.py:55).
    """
    dot = _make_dot(hi_lo)

    hs = []  # post-relu trunk activations h_0..h_{depth-1}
    h = x
    ki = 0
    for i in range(depth):
        if i in skips:
            # concat([x, h]) @ W decomposed: x @ W[:enc] + h @ W[enc:].
            acc = dot(x, ks[ki]) + dot(h, ks[ki + 1]) + bs[i]
            ki += 2
        else:
            acc = dot(h, ks[ki]) + bs[i]
            ki += 1
        h = jnp.maximum(acc, 0.0).astype(dt)
        hs.append(h)

    # Heads (nt = depth + len(skips) flat trunk kernels precede them):
    # ks[nt]=Wb, ks[nt+1]=Wv_bott, ks[nt+2]=Wv_dirs, ks[nt+3]=Wr, ks[nt+4]=Ws
    # — or, no-viewdirs: ks[nt]=W_out only.
    nt = ki
    if not vdirs:
        out = dot(h, ks[nt]) + bs[depth]
        return out, (hs, None, None)
    bott = (dot(h, ks[nt]) + bs[depth]).astype(dt)
    v_acc = dot(bott, ks[nt + 1]) + dot(dirs, ks[nt + 2]) + bs[depth + 1]
    v = jnp.maximum(v_acc, 0.0).astype(dt)
    rgb = dot(v, ks[nt + 3]) + bs[depth + 2]
    sigma = dot(h, ks[nt + 4]) + bs[depth + 3]
    out = jnp.concatenate([rgb, sigma], axis=-1)
    return out, (hs, bott, v)


def _flat_weights(ks: list) -> list:
    """Logical weight list (arrays or (hi, lo) pairs) -> flat array list."""
    out = []
    for k in ks:
        out.extend(k if isinstance(k, tuple) else (k,))
    return out


def _regroup_weights(raw: list, hi_lo: bool) -> list:
    """Flat kernel-ref values -> logical list ((hi, lo) pairs in hi_lo)."""
    if not hi_lo:
        return raw
    return [(raw[2 * i], raw[2 * i + 1]) for i in range(len(raw) // 2)]


def _fwd_kernel(n_weights, n_bias, dt, hi_lo, depth, skips, vdirs,
                pts_ref, d_ref, em_ref, ek_ref, *refs):
    ks = _regroup_weights([refs[i][:] for i in range(n_weights)], hi_lo)
    bs = [refs[n_weights + i][:] for i in range(n_bias)]
    out_ref = refs[n_weights + n_bias]
    x = _encode_tile(pts_ref[:], em_ref[:], ek_ref[:], dt)
    out, _ = _mlp_tile_math(x, d_ref[:], ks, bs, dt, hi_lo, depth, skips,
                            vdirs)
    out_ref[:] = out.astype(jnp.float32)


def _pallas_forward(
    pts: jnp.ndarray, dirs: jnp.ndarray, ks: list, bs: list,
    n_freqs: int, dt, tile: int, hi_lo: bool = False,
    depth: int = 8, skips: Tuple[int, ...] = (5,), vdirs: bool = True,
) -> jnp.ndarray:
    n = pts.shape[0]
    grid = (n // tile,)
    ks_flat = _flat_weights(ks)
    n_w = len(ks_flat)
    out_w = 4 if vdirs else bs[-1].shape[1]  # rgb+sigma, or output_ch

    # Weights are small; full-array blocks resident in VMEM every step.
    w_specs = [pl.BlockSpec(k.shape, lambda i: (0, 0)) for k in ks_flat]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]

    em, ek = _encode_consts(n_freqs)
    em, ek = jnp.asarray(em), jnp.asarray(ek)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_w, len(bs), dt, hi_lo, depth, skips, vdirs
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, pts.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile, dirs.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec(em.shape, lambda i: (0, 0)),
            pl.BlockSpec(ek.shape, lambda i: (0, 0)),
            *w_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec((tile, out_w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, out_w), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(pts, dirs, em, ek, *ks_flat, *bs)


def _bwd_kernel(n_weights, n_logical, n_bias, dt, hi_lo, depth, skips, vdirs,
                pts_ref, d_ref, em_ref, ek_ref, *refs):
    """Recompute-forward backward: accumulates dW/db across grid steps.

    refs = [*ks_flat, *bs, g_ref, *dk_refs, *db_refs]; all dk/db blocks map
    to block (0, 0) for every grid step, so `+=` accumulates over tiles.
    ``n_weights`` counts flat kernel inputs (2x logical in hi_lo mode);
    dk outputs are always per LOGICAL weight, in fp32.
    """
    ks = _regroup_weights([refs[i][:] for i in range(n_weights)], hi_lo)
    bs = [refs[n_weights + i][:] for i in range(n_bias)]
    g_ref = refs[n_weights + n_bias]
    dk_refs = refs[n_weights + n_bias + 1 : n_weights + n_bias + 1 + n_logical]
    db_refs = refs[n_weights + n_bias + 1 + n_logical :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*dk_refs, *db_refs):
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = _encode_tile(pts_ref[:], em_ref[:], ek_ref[:], dt)
    dirs = d_ref[:]
    _, (hs, bott, v) = _mlp_tile_math(x, dirs, ks, bs, dt, hi_lo, depth,
                                      skips, vdirs)

    f32 = jnp.float32
    if not hi_lo:
        # dW = a^T @ g  — contract over the tile dim without transposing.
        dotT = lambda a, g: jax.lax.dot_general(
            a, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        # g @ k^T without materializing a transpose (contract both dim 1).
        dotKT = lambda g, k: jax.lax.dot_general(
            g, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
    else:
        # bf16x3 variants: split both operands (activations and grads are
        # fp32 here), 3 MXU passes per logical matmul; kernels arrive
        # pre-split as (hi, lo) pairs.
        def dotT(a, g):
            a_hi, a_lo = _split_bf16(a)
            g_hi, g_lo = _split_bf16(g)
            dg = lambda p, q: jax.lax.dot_general(
                p, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )
            return dg(a_hi, g_hi) + dg(a_hi, g_lo) + dg(a_lo, g_hi)

        def dotKT(g, k):
            k_hi, k_lo = k
            g_hi, g_lo = _split_bf16(g)
            dg = lambda p, q: jax.lax.dot_general(
                p, q, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            return dg(g_hi, k_hi) + dg(g_hi, k_lo) + dg(g_lo, k_hi)

    g = g_ref[:]
    h_last = hs[-1]

    # Kernel-index map for trunk layers (skip layers have two blocks);
    # heads follow at nt = depth + len(skips).
    k_idx = []
    kk = 0
    for i in range(depth):
        if i in skips:
            k_idx.append((kk, kk + 1))
            kk += 2
        else:
            k_idx.append((kk,))
            kk += 1
    nt = kk  # first head kernel index

    if not vdirs:
        # Single output head: out = h_last @ W_out + b_out (no relu).
        g_out = g.astype(dt)
        dk_refs[nt][:] += dotT(h_last, g_out)
        db_refs[depth][:] += jnp.sum(g_out.astype(f32), 0, keepdims=True)
        dh = dotKT(g_out, ks[nt]).astype(dt)
        _trunk_bwd(depth, skips, k_idx, ks, hs, x, dh, dk_refs, db_refs,
                   dotT, dotKT, dt, f32)
        return

    g_rgb = g[:, 0:3].astype(dt)
    g_sigma = g[:, 3:4].astype(dt)

    # rgb head: rgb = v @ Wr + br
    dk_refs[nt + 3][:] += dotT(v, g_rgb)
    db_refs[depth + 2][:] += jnp.sum(g_rgb.astype(f32), 0, keepdims=True)
    dv = dotKT(g_rgb, ks[nt + 3])
    # v5e Mosaic has no bf16 compare — mask in f32.
    dv = jnp.where(v.astype(f32) > 0, dv, 0.0).astype(dt)

    # view layer: v = relu(bott @ Wv_b + dirs @ Wv_d + bv)
    dk_refs[nt + 1][:] += dotT(bott, dv)
    dk_refs[nt + 2][:] += dotT(dirs, dv)
    db_refs[depth + 1][:] += jnp.sum(dv.astype(f32), 0, keepdims=True)
    dbott = dotKT(dv, ks[nt + 1]).astype(dt)

    # bottleneck: bott = h_last @ Wb + bb  (no relu)
    dk_refs[nt][:] += dotT(h_last, dbott)
    db_refs[depth][:] += jnp.sum(dbott.astype(f32), 0, keepdims=True)

    # sigma head: sigma = h_last @ Ws + bs
    dk_refs[nt + 4][:] += dotT(h_last, g_sigma)
    db_refs[depth + 3][:] += jnp.sum(g_sigma.astype(f32), 0, keepdims=True)

    dh = (dotKT(dbott, ks[nt]) + dotKT(g_sigma, ks[nt + 4])).astype(dt)
    _trunk_bwd(depth, skips, k_idx, ks, hs, x, dh, dk_refs, db_refs,
               dotT, dotKT, dt, f32)


def _trunk_bwd(depth, skips, k_idx, ks, hs, x, dh, dk_refs, db_refs,
               dotT, dotKT, dt, f32):
    """Trunk backward walk, reversed. Layer i consumed input a_i (= x for
    0; h_{i-1} otherwise; for a skip layer both x and h_{i-1}) and produced
    h_i = relu(acc_i). Shared by the viewdirs and no-viewdirs heads."""
    for i in range(depth - 1, -1, -1):
        dacc = jnp.where(hs[i].astype(f32) > 0, dh.astype(f32), 0.0).astype(dt)
        db_refs[i][:] += jnp.sum(dacc.astype(f32), 0, keepdims=True)
        a = x if i == 0 else hs[i - 1]
        if i in skips:
            i_x, i_h = k_idx[i]
            dk_refs[i_x][:] += dotT(x, dacc)
            dk_refs[i_h][:] += dotT(a, dacc)
            if i > 0:
                dh = dotKT(dacc, ks[i_h]).astype(dt)  # d(enc) branch dropped
        else:
            (i_k,) = k_idx[i]
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
    hi_lo: bool = False,
    depth: int = 8,
    skips: Tuple[int, ...] = (5,),
    vdirs: bool = True,
):
    n = pts.shape[0]
    grid = (n // tile,)
    ks_flat = _flat_weights(ks)
    n_w = len(ks_flat)
    # Grad outputs are per LOGICAL weight (hi/lo pairs share one fp32 grad).
    logical_shapes = [
        (k[0].shape if isinstance(k, tuple) else k.shape) for k in ks
    ]

    w_specs = [pl.BlockSpec(k.shape, lambda i: (0, 0)) for k in ks_flat]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]
    dk_specs = [pl.BlockSpec(s, lambda i: (0, 0)) for s in logical_shapes]
    db_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]

    em, ek = _encode_consts(n_freqs)
    em, ek = jnp.asarray(em), jnp.asarray(ek)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_w, len(ks), len(bs), dt, hi_lo, depth, skips,
            vdirs
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, pts.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile, dirs.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec(em.shape, lambda i: (0, 0)),
            pl.BlockSpec(ek.shape, lambda i: (0, 0)),
            *w_specs,
            *b_specs,
            pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=[*dk_specs, *db_specs],
        out_shape=[
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in logical_shapes],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs],
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(pts, dirs, em, ek, *ks_flat, *bs, g)


def _grads_to_pytree(
    dks: list, dbs: list, params: Dict,
    depth: int = 8, skips: Tuple[int, ...] = (5,), vdirs: bool = True,
) -> Dict:
    """Reassemble flattened kernel/bias grads into the param pytree."""
    out = {}
    ki = 0
    bi = 0
    trunk = [f"pts_{i}" for i in range(depth)]
    for i, name in enumerate(trunk + (_HEADS if vdirs else ["output"])):
        if (i < depth and i in skips) or name == "view":
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_apply(params, pts, dirs, n_freqs: int, dt_name: str, tile: int,
                 hi_lo: bool = False,
                 arch: Tuple = (8, (5,), 256, True)):
    depth, skips, bott_ch, vdirs = arch
    dt = jnp.dtype(dt_name)
    enc_dim = 3 + 6 * n_freqs
    ks, bs = _flatten_params(params, enc_dim, dt, hi_lo, depth, skips,
                             bott_ch, vdirs)
    fwd_tile = tile if hi_lo else _fwd_tile(pts.shape[0], tile)
    return _pallas_forward(
        pts, dirs.astype(dt), ks, bs, n_freqs, dt, fwd_tile, hi_lo,
        depth, skips, vdirs
    )


def _fused_fwd(params, pts, dirs, n_freqs, dt_name, tile, hi_lo, arch):
    out = _fused_apply(params, pts, dirs, n_freqs, dt_name, tile, hi_lo, arch)
    return out, (params, pts, dirs)


def _fused_bwd(n_freqs, dt_name, tile, hi_lo, arch, res, g):
    params, pts, dirs = res
    depth, skips, bott_ch, vdirs = arch
    dt = jnp.dtype(dt_name)
    enc_dim = 3 + 6 * n_freqs
    ks, bs = _flatten_params(params, enc_dim, dt, hi_lo, depth, skips,
                             bott_ch, vdirs)
    outs = _pallas_backward(
        pts, dirs.astype(dt), ks, bs, g.astype(jnp.float32), n_freqs, dt,
        tile, hi_lo, depth, skips, vdirs
    )
    dks, dbs = outs[: len(ks)], outs[len(ks) :]
    dparams = _grads_to_pytree(dks, dbs, params, depth, skips, vdirs)
    return dparams, jnp.zeros_like(pts), jnp.zeros_like(dirs)


_fused_apply.defvjp(_fused_fwd, _fused_bwd)


def _weight_elems(mc) -> int:
    """Total logical weight elements of the architecture described by mc.

    Mirrors the param shapes built by models/mlp.py:43-79 (trunk with
    skip-concat, view-dependent head or single output layer)."""
    total = 0
    in_ch = mc.input_ch
    for i in range(mc.depth):
        d_in = in_ch if i == 0 else (
            mc.width + in_ch if i in mc.skips else mc.width
        )
        total += d_in * mc.width
    if mc.use_viewdirs:
        total += mc.width * 1                                   # sigma
        total += mc.width * mc.bottleneck_ch                    # bottleneck
        total += (mc.bottleneck_ch + mc.input_ch_views) * mc.view_width
        total += mc.view_width * 3                              # rgb
    else:
        total += mc.width * mc.output_ch
    return total


def backward_fits_vmem(mc, hi_lo: bool, budget_bytes: int = 28 << 20) -> bool:
    """True when the backward kernel's tile-independent VMEM residents fit.

    The backward kernel keeps EVERY weight (bf16; hi/lo bf16 pairs in
    hi_lo mode) plus one fp32 grad accumulator per logical weight resident
    in VMEM for the whole grid — a width^2-scaling cost the activation-tile
    cap at fused_nerf_mlp's call site cannot bound (advisor r4). Estimate
    that footprint from the architecture and report whether it fits the
    32MB scoped-VMEM budget (_compiler_params) with headroom for the
    tile-proportional activations (min tile 128). Widest on-chip-validated
    trunk is 384; this gate sends ~768+ trunks back to the XLA path with
    their pre-r4 behavior instead of a Mosaic allocation error."""
    w_elems = _weight_elems(mc)
    w_bytes = 4 if hi_lo else 2          # bf16, doubled for hi/lo pairs
    resident = w_elems * (w_bytes + 4)   # weights + fp32 dk accumulators
    act_min = (mc.depth + 2) * 128 * max(mc.width, mc.input_ch) * 4
    return resident + act_min <= budget_bytes


def fused_nerf_mlp(
    params: Dict,
    pts_flat: jnp.ndarray,
    dirs_enc_flat: Optional[jnp.ndarray],
    cfg: RenderConfig,
    tile: int = DEFAULT_TILE,
    mc=None,
) -> jnp.ndarray:
    """Fused encode->MLP->raw Pallas kernel. pts: (N, 3) -> raw (N, 4).

    Generic over the whole architecture space (r4 — the network loop
    unrolls at trace time): any ``--netdepth``/``--netwidth``/skip set,
    the view-dependent head of nerfmlp/model.py:44-53, AND the no-viewdirs
    single-output-head variant (model.py:55; pass ``dirs_enc_flat=None``,
    output is (N, output_ch)).

    Differentiable w.r.t. ``params`` (positions/dirs get zero cotangents —
    fine for NeRF training where ray geometry is data, renderer.py:88
    stop-gradients the sampled depths anyway).
    """
    vdirs = bool(cfg.use_viewdirs) and dirs_enc_flat is not None
    # ``mc``: the resolved net config (callers pass the fine net's when
    # querying it; default = the coarse architecture). Fail actionably on
    # a params/arch mismatch instead of deep inside Mosaic shape errors.
    mc = mc or cfg.model_config()
    head = "view" if vdirs else "output"
    head_rows = (
        mc.bottleneck_ch + mc.input_ch_views if vdirs else mc.width
    )
    if (
        f"pts_{mc.depth - 1}" not in params
        or f"pts_{mc.depth}" in params
        or head not in params
        or any(not 0 <= s < mc.depth for s in mc.skips)
        # Width/bottleneck consistency (advisor r4): a same-depth width
        # mismatch otherwise fails deep inside Mosaic shape errors.
        or params["pts_0"]["kernel"].shape[1] != mc.width
        or params[head]["kernel"].shape[0] != head_rows
    ):
        raise NotImplementedError(
            f"params do not match the configured architecture (depth "
            f"{mc.depth}, width {mc.width}, skips {mc.skips}, {head} head "
            f"rows {head_rows}); set use_pallas=False or fix "
            "--netdepth/--netwidth/--use_viewdirs"
        )
    if not vdirs:
        # The kernels still take a dirs operand; feed a 1-lane dummy.
        dirs_enc_flat = jnp.zeros((pts_flat.shape[0], 1), jnp.float32)
    # fp32_precision="high" in fp32 mode: hand-rolled bf16x3 (3 bf16 MXU
    # passes per logical matmul, fp32 accumulation/activations). Mosaic's
    # own fp32-matmul decomposition is avoided entirely — the renderer
    # routes fp32 "highest" (6-pass golden parity) to XLA instead.
    hi_lo = (
        jnp.dtype(cfg.compute_dtype) == jnp.float32
        and cfg.fp32_precision == "high"
    )
    n = pts_flat.shape[0]
    tile = min(tile, max(256, 1 << (n - 1).bit_length()))
    # The backward kernel's stored activations OOM VMEM beyond tile 1024
    # for the reference 8x256 trunk (the forward pass doubles the tile
    # itself when shapes allow). Scale that measured-good point by the
    # trunk's activation footprint (depth x width) for other shapes; in
    # hi_lo mode activations are fp32 (2x VMEM) — halve again.
    cap = DEFAULT_TILE * 8 * 256 // max(mc.depth * mc.width, 1)
    if hi_lo:  # fp32 activations double VMEM — halve BEFORE the clamp so
        cap //= 2  # the 128 floor holds in both modes (advisor r4)
    cap = max(128, 1 << max(cap, 1).bit_length() - 1)  # pow2, floor 128
    tile = min(tile, cap, DEFAULT_TILE)
    pad = (-n) % tile
    if pad:
        pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
        dirs_enc_flat = jnp.pad(dirs_enc_flat, ((0, pad), (0, 0)))

    out = _fused_apply(
        params, pts_flat, dirs_enc_flat, cfg.pos_enc_L,
        str(jnp.dtype(cfg.compute_dtype)), tile, hi_lo,
        (mc.depth, tuple(mc.skips), mc.bottleneck_ch, vdirs),
    )
    return out[:n]
