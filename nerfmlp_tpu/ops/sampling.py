"""Ray-depth sampling: stratified coarse bins + inverse-CDF fine sampling.

Behavioral parity targets:
  * stratified sampling with in-bin jitter — nerfmlp/renderer.py:52-61
  * optional ``lindisp`` inverse-depth spacing — example/run_nerf.py:186-188
  * hierarchical inverse-CDF sampling — nerfmlp/renderer.py:165-198
    (itself a port of example/run_nerf_helpers.py:183-211)

Everything is static-shape and fully vectorized; ``searchsorted`` +
``take_along_axis`` lower to efficient XLA gathers on TPU. Randomness is
keyed JAX PRNG (same distributions as the reference's torch.rand draws).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_sample(
    rng: Optional[jax.Array],
    n_rays: int,
    n_samples: int,
    near,
    far,
    perturb: bool = True,
    lindisp: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Coarse z-values, shape (n_rays, n_samples).

    Linear in depth by default; linear in disparity when ``lindisp``.
    When ``perturb``, each z is drawn uniformly inside its stratum
    (bin edges at midpoints, as in renderer.py:57-61).
    ``near``/``far`` may be scalars or per-ray (n_rays,) arrays.
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    near = jnp.broadcast_to(jnp.asarray(near, dtype=dtype), (n_rays,))[:, None]
    far = jnp.broadcast_to(jnp.asarray(far, dtype=dtype), (n_rays,))[:, None]
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb:
        if rng is None:
            raise ValueError("stratified_sample(perturb=True) needs an rng key")
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(rng, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    rng: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
    stratified: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` new z-values per ray.

    ``bins``: (..., M) bin positions (z-midpoints), ``weights``: (..., M-1)
    unnormalized probability mass per bin interval... matching the
    reference's call shape (renderer.py:86-87: bins = z_mids (N-1 wide),
    weights = coarse weights[..., 1:-1] (N-2 wide)).

    Deterministic mode uses evenly spaced u in [0, 1] (renderer.py:179-181).
    Gradients are stopped by the caller (z_samples.detach(), renderer.py:88).
    """
    weights = weights + 1e-5  # avoid nans on empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        if rng is None:
            raise ValueError("sample_pdf(det=False) needs an rng key")
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)
        if stratified:
            # Jitter within CDF strata: u is SORTED by construction, so
            # the returned samples are monotone and the caller can skip
            # its per-ray depth sort (a win the iid draw — the reference's
            # choice, renderer.py:182 — cannot offer). Statistically this
            # is plain stratified sampling of the inverse CDF.
            base = jnp.arange(n_samples, dtype=cdf.dtype) / n_samples
            u = base + u / n_samples

    # Invert the CDF. searchsorted(side="right") = #{j : cdf_j <= u}.
    # A vmapped binary search is ~25x slower on TPU than this broadcast
    # compare-all (the CDF is only M~63 wide, so B x S x M bool ops are
    # trivial VPU work), and take_along_axis gathers are similarly slow —
    # the bracketing values are read out with one-hot contractions instead.
    m = cdf.shape[-1]
    mask = cdf[..., None, :] <= u[..., :, None]  # (B, S, M)
    inds = jnp.sum(mask.astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, m - 1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    oh_below = (below[..., None] == iota).astype(cdf.dtype)  # (B, S, M)
    oh_above = (above[..., None] == iota).astype(cdf.dtype)

    cdf_below = jnp.sum(oh_below * cdf[..., None, :], axis=-1)
    cdf_above = jnp.sum(oh_above * cdf[..., None, :], axis=-1)
    if bins.shape[-1] != m:
        # The contract is bins (..., M) with weights (..., M-1) -> cdf
        # width M; a mismatched caller (easy off-by-one) must fail loudly,
        # not have its top-bin samples silently collapsed to a point.
        raise ValueError(
            f"sample_pdf: bins last dim {bins.shape[-1]} must be "
            f"weights last dim + 1 ({m})"
        )
    bins_pad = bins
    bins_below = jnp.sum(oh_below * bins_pad[..., None, :], axis=-1)
    bins_above = jnp.sum(oh_above * bins_pad[..., None, :], axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
