"""Affine-invariant stretch sampler correctness + shipped quasar basis
artifact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.inference.ensemble_stretch import stretch_init, stretch_kernel

COV = np.array([[4.0, 1.8], [1.8, 1.0]])   # strongly correlated, scale-split
MEAN = np.array([2.0, -1.0])
PREC = np.linalg.inv(COV)


def logdensity(x):
    d = x - jnp.asarray(MEAN, jnp.float32)
    return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d


def test_stretch_gaussian():
    key = jax.random.key(0)
    k_i, k_r = jax.random.split(key)
    k_walkers = 64
    xs0 = jnp.asarray(MEAN, jnp.float32) + jax.random.normal(k_i, (k_walkers, 2))
    state = stretch_init(xs0, logdensity)
    kern = stretch_kernel(logdensity)

    def run(key, s, n):
        def body(s, k):
            s, info = kern(k, s)
            return s, (s.xs, info.accept_rate)
        return jax.lax.scan(body, s, jax.random.split(key, n))

    state, (xs_trace, acc) = jax.jit(lambda k, s: run(k, s, 800))(k_r, state)
    acc_rate = float(jnp.mean(acc))
    assert 0.2 < acc_rate < 0.8, acc_rate
    kept = np.asarray(xs_trace[200:]).reshape(-1, 2)
    np.testing.assert_allclose(kept.mean(0), MEAN, atol=0.15)
    np.testing.assert_allclose(np.cov(kept.T), COV, atol=0.5)


def test_stretch_affine_invariance():
    """The defining property: acceptance statistics are unchanged under an
    affine reparameterization of the target."""
    a_mat = np.array([[30.0, 0.0], [5.0, 0.02]])   # brutal anisotropy

    def logdensity_skewed(y):
        x = jnp.linalg.solve(jnp.asarray(a_mat, jnp.float32), y)
        return logdensity(x)

    key = jax.random.key(1)
    k_i, k_r = jax.random.split(key)
    xs0 = jnp.asarray(MEAN, jnp.float32) + jax.random.normal(k_i, (64, 2))
    ys0 = xs0 @ jnp.asarray(a_mat.T, jnp.float32)

    def acc_of(logd, x0):
        state = stretch_init(x0, logd)
        kern = stretch_kernel(logd)
        def body(s, k):
            s, info = kern(k, s)
            return s, info.accept_rate
        _, acc = jax.lax.scan(body, state, jax.random.split(k_r, 300))
        return float(jnp.mean(acc[100:]))

    a1 = acc_of(logdensity, xs0)
    a2 = acc_of(logdensity_skewed, ys0)
    assert abs(a1 - a2) < 0.05, (a1, a2)


def test_default_basis_artifact():
    from celeste_tpu.quasar import sdss_like_filterbank, project_to_bands
    from celeste_tpu.quasar.basis import QuasarBasis

    basis = QuasarBasis.default()
    assert basis.b.shape[0] == 4
    assert np.all(np.asarray(basis.b) >= 0.0)
    filters = sdss_like_filterbank(n_pts=64)
    flux = project_to_bands(basis, filters, jnp.asarray([0.25] * 4), 1.0, 2.0)
    assert np.all(np.isfinite(np.asarray(flux))) and np.all(np.asarray(flux) > 0)


def test_photo_z_with_default_basis():
    """Photo-z end-to-end on the shipped artifact."""
    from celeste_tpu.quasar import (PhotoZConfig, project_to_bands, run_photo_z,
                                    sdss_like_filterbank)
    from celeste_tpu.quasar.basis import QuasarBasis

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    rng = np.random.default_rng(4)
    z_true = 1.8
    w = jnp.asarray(rng.dirichlet(np.full(4, 1.0)), jnp.float32)
    flux = project_to_bands(basis, filters, w, 1.5, z_true)
    err = 0.03 * np.abs(np.asarray(flux)) + 1e-6
    obs = np.asarray(flux) + rng.normal(size=5) * err
    out = run_photo_z(jax.random.key(2), basis, filters, obs, err,
                      PhotoZConfig(n_temps=6, n_steps=500, n_warmup=200, n_systems=4))
    z = np.asarray(out["z"]).ravel()
    assert np.mean(np.abs(z - z_true) < 0.3) > 0.3, np.percentile(z, [25, 50, 75])
