"""Stratified + inverse-CDF sampling invariants and oracle checks
(math from nerfmlp/renderer.py:52-61, 165-198)."""

import numpy as np
import jax
import jax.numpy as jnp

from nerfmlp_tpu.ops.sampling import stratified_sample, sample_pdf


def test_stratified_deterministic_linspace():
    z = stratified_sample(None, 4, 8, 2.0, 6.0, perturb=False)
    want = np.linspace(2.0, 6.0, 8)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(want, (4, 8)), atol=1e-6)


def test_stratified_perturb_stays_in_bins():
    rng = jax.random.PRNGKey(0)
    z = np.asarray(stratified_sample(rng, 128, 64, 2.0, 6.0, perturb=True))
    base = np.linspace(2.0, 6.0, 64)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    assert (np.diff(z, axis=-1) > -1e-6).all()  # sorted within each ray


def test_stratified_lindisp():
    z = np.asarray(stratified_sample(None, 1, 5, 1.0, 4.0, perturb=False, lindisp=True))
    t = np.linspace(0, 1, 5)
    want = 1.0 / (1.0 / 1.0 * (1 - t) + 1.0 / 4.0 * t)
    np.testing.assert_allclose(z[0], want, atol=1e-6)


def test_stratified_per_ray_bounds():
    near = jnp.array([1.0, 2.0])
    far = jnp.array([2.0, 8.0])
    z = np.asarray(stratified_sample(None, 2, 3, near, far, perturb=False))
    np.testing.assert_allclose(z[0], [1.0, 1.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(z[1], [2.0, 5.0, 8.0], atol=1e-6)


def _sample_pdf_oracle(bins, weights, n_samples, u):
    """Independent numpy inverse-CDF implementation."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    out = np.zeros(u.shape, dtype=np.float64)
    for r in range(u.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.clip(inds - 1, 0, None)
        above = np.clip(inds, None, cdf.shape[-1] - 1)
        cdf_b, cdf_a = cdf[r][below], cdf[r][above]
        bins_b = bins[r][np.clip(below, 0, bins.shape[-1] - 1)]
        bins_a = bins[r][np.clip(above, 0, bins.shape[-1] - 1)]
        denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u[r] - cdf_b) / denom
        out[r] = bins_b + t * (bins_a - bins_b)
    return out


def test_sample_pdf_det_matches_oracle():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(2.0, 6.0, size=(8, 63)), axis=-1).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, size=(8, 62)).astype(np.float32)
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), 32, det=True))
    u = np.broadcast_to(np.linspace(0.0, 1.0, 32), (8, 32))
    want = _sample_pdf_oracle(bins, weights, 32, u)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_pdf_concentrates_mass():
    # All the weight in one bin -> nearly all samples land inside it.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    weights = jnp.zeros((4, 10)).at[:, 5].set(1.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, weights, 100, det=False))
    frac_inside = ((s >= 0.5) & (s <= 0.6)).mean()
    assert frac_inside > 0.95


def test_sample_pdf_range():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 63), (16, 63))
    weights = jax.random.uniform(jax.random.PRNGKey(2), (16, 62))
    s = np.asarray(sample_pdf(jax.random.PRNGKey(3), bins, weights, 128))
    assert (s >= 2.0 - 1e-5).all() and (s <= 6.0 + 1e-5).all()


def test_sample_pdf_stratified_is_sorted_and_in_range():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 33), (64, 33))
    weights = jax.random.uniform(jax.random.PRNGKey(5), (64, 32))
    s = np.asarray(
        sample_pdf(jax.random.PRNGKey(6), bins, weights, 48, stratified=True)
    )
    assert (np.diff(s, axis=-1) >= -1e-6).all()  # monotone per ray
    assert (s >= 2.0 - 1e-5).all() and (s <= 6.0 + 1e-5).all()


def test_sample_pdf_stratified_concentrates_mass():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    weights = jnp.zeros((4, 10)).at[:, 5].set(1.0)
    s = np.asarray(
        sample_pdf(jax.random.PRNGKey(7), bins, weights, 100, stratified=True)
    )
    assert ((s >= 0.5) & (s <= 0.6)).mean() > 0.95
