"""Positional (Fourier-feature) encoding.

Matches the reference math exactly (nerfmlp/model.py:5-26, which itself
matches the official TF embedder, example/run_nerf_helpers.py:22-75):

  gamma(x) = [x, sin(f_0 x), cos(f_0 x), ..., sin(f_{L-1} x), cos(f_{L-1} x)]

with NO pi multiplier. Frequency bands are ``2**linspace(0, L-1, L)``
(log sampling, the default) or ``linspace(2^0, 2^(L-1), L)`` (linear).

Unlike the reference's Python loop over frequencies, this is a single
vectorized broadcast+reshape so XLA fuses it into neighbouring ops (and the
Pallas kernel recomputes it in VMEM, so encoded features never touch HBM).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def frequency_bands(num_freqs: int, log_sampling: bool = True) -> np.ndarray:
    """Frequency bands as host constants (baked into the jaxpr)."""
    if num_freqs <= 0:
        bands = np.zeros((0,), dtype=np.float32)
    elif log_sampling:
        bands = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        bands = np.linspace(2.0 ** 0.0, 2.0 ** (num_freqs - 1), num_freqs)
    bands = bands.astype(np.float32)
    # The cache hands out the SAME array to every caller: freeze it so an
    # in-place mutation can't silently corrupt all later encodings.
    bands.setflags(write=False)
    return bands


def encoded_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * num_freqs)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """gamma(x): (..., D) -> (..., D * ((include_input) + 2L)).

    Output layout per the reference loop (model.py:22-26):
    ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]`` where each
    block spans the full D input channels.
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    bands = jnp.asarray(frequency_bands(num_freqs, log_sampling), dtype=x.dtype)
    # (..., L, D): scale each input channel by each frequency.
    xb = x[..., None, :] * bands[:, None]
    # (..., L, 2, D): sin block then cos block per frequency.
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = sc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
