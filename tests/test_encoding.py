"""Positional encoding vs an independent numpy oracle (math from
nerfmlp/model.py:5-26 / example/run_nerf_helpers.py:22-75)."""

import numpy as np
import jax.numpy as jnp

from nerfmlp_tpu.ops.encoding import positional_encoding, encoded_dim, frequency_bands


def _oracle(x, L, include_input=True, log_sampling=True):
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, L - 1, L)
    else:
        freqs = np.linspace(1.0, 2.0 ** (L - 1), L)
    out = [x] if include_input else []
    for f in freqs:
        out.append(np.sin(f * x))
        out.append(np.cos(f * x))
    return np.concatenate(out, axis=-1)


def test_dims():
    assert encoded_dim(3, 10) == 63
    assert encoded_dim(3, 4) == 27
    assert encoded_dim(3, 10, include_input=False) == 60


def test_freq_bands_log():
    np.testing.assert_allclose(
        frequency_bands(10), 2.0 ** np.arange(10), rtol=1e-6
    )


def test_freq_bands_linear():
    b = frequency_bands(4, log_sampling=False)
    np.testing.assert_allclose(b, np.linspace(1.0, 8.0, 4), rtol=1e-6)


def test_matches_oracle_log():
    x = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 10))
    want = _oracle(x, 10)
    assert got.shape == (17, 63)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matches_oracle_linear_no_input():
    x = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(
        positional_encoding(jnp.asarray(x), 4, include_input=False, log_sampling=False)
    )
    want = _oracle(x, 4, include_input=False, log_sampling=False)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_shapes():
    x = jnp.zeros((2, 7, 3))
    assert positional_encoding(x, 4).shape == (2, 7, 27)
