"""Dense-metric (whitened-space) sampling — inference/whiten.py.

The crowded-field posterior couples parameters across overlapping sources;
the diagonal-metric samplers need a pooled dense metric to move (DESIGN.md
§5).  Gates: the affine algebra is exact, the wrapped vg keeps batch-rule
parity, and NUTS in whitened space recovers a strongly correlated
Gaussian's moments that the diagonal metric measurably struggles with.
"""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from celeste_tpu.inference import (
    ensemble_covariance,
    hmc_init,
    nuts_kernel,
    run_chains_ensemble,
    whiten_logdensity,
)


def _correlated_gaussian(d=6, rho=0.97, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d)).astype(np.float32)
    cov = a @ a.T + d * np.eye(d, dtype=np.float32)
    # inflate correlations: scale to unit diag then mix with rho-uniform
    s = np.sqrt(np.diagonal(cov))
    corr = cov / np.outer(s, s)
    corr = (1 - rho) * corr + rho * np.ones((d, d), np.float32)
    np.fill_diagonal(corr, 1.0)
    scales = np.geomspace(0.05, 20.0, d).astype(np.float32)
    cov = corr * np.outer(scales, scales)
    mean = rng.normal(size=d).astype(np.float32)
    prec = np.linalg.inv(cov).astype(np.float32)

    def logd(x):
        diff = x - mean
        return -0.5 * jnp.dot(diff, jnp.matmul(prec, diff,
                                               precision=jax.lax.Precision.HIGHEST),
                              precision=jax.lax.Precision.HIGHEST)

    return logd, mean, cov


def test_ensemble_covariance_matches_numpy():
    rng = np.random.default_rng(1)
    xs = rng.normal(size=(256, 5)).astype(np.float32) * [1, 2, 3, 4, 5]
    m, cov = ensemble_covariance(xs, ridge=0.0)
    np.testing.assert_allclose(np.asarray(m), xs.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.cov(xs.T), rtol=2e-4,
                               atol=2e-4)
    # pooled [chains, steps, D] flattens
    m2, _ = ensemble_covariance(xs.reshape(16, 16, 5), ridge=0.0)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-6)


def test_whiten_roundtrip_and_isotropy():
    logd, mean, cov = _correlated_gaussian()
    logd_z, to_x, to_z = whiten_logdensity(logd, mean, cov)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(7, 6)), jnp.float32)
    np.testing.assert_allclose(np.asarray(to_z(to_x(z))), np.asarray(z),
                               rtol=2e-4, atol=2e-4)
    # in z-space the target is a standard normal (up to fp error)
    lz = jax.vmap(logd_z)(z)
    expected = -0.5 * np.sum(np.asarray(z) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(lz), expected, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_whitened_vg_batch_parity():
    """The wrapped logdensity's batch-aware vg must agree with plain
    autodiff (exercised on the tiled crowded logdensity, which is the
    production carrier of .batched)."""
    from celeste_tpu.bench.config5 import build_config5

    logd, _, vec, _ = build_config5(impl="jnp")
    d = int(vec.shape[0])
    rng = np.random.default_rng(3)
    xs = np.asarray(vec)[None, :] + 0.01 * rng.normal(size=(32, d)).astype(
        np.float32)
    mean, cov = ensemble_covariance(jnp.asarray(xs))
    logd_z, to_x, to_z = whiten_logdensity(logd, mean, cov)
    assert hasattr(logd_z, "value_and_grad")
    zs = to_z(jnp.asarray(xs[:4]))
    v0, g0 = jax.vmap(jax.value_and_grad(logd_z))(zs)
    v1, g1 = jax.vmap(logd_z.value_and_grad)(zs)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=5e-4,
                               atol=0.5)


def test_dense_metric_nuts_beats_diagonal_on_correlated_target():
    """NUTS with the pooled dense metric recovers the correlated Gaussian's
    variances; the diagonal metric at the same budget is measurably worse
    (this is the config-5 situation in miniature)."""
    logd, mean, cov = _correlated_gaussian()
    d = mean.shape[0]
    n_chains, n_steps = 64, 96
    key = jax.random.key(0)
    x0 = jnp.asarray(mean)[None, :] + jax.random.normal(
        jax.random.key(1), (n_chains, d))

    # --- diagonal metric baseline (same step budget)
    from celeste_tpu.inference import hmc_warmup
    states, ss, im = jax.jit(jax.vmap(
        lambda k, x: hmc_warmup(k, logd, x, n_warmup=100, n_leapfrog=8)))(
        jax.random.split(jax.random.key(2), n_chains), x0)
    kern_d = nuts_kernel(logd, step_size=float(jnp.median(ss)),
                         inv_mass=jnp.mean(im, 0), max_depth=6)
    s_d, _, _ = jax.jit(lambda k, s: run_chains_ensemble(k, kern_d, s,
                                                         n_steps=n_steps))(
        key, states)

    # --- dense metric from the ensemble (pool the diagonal run's tail)
    m_hat, cov_hat = ensemble_covariance(s_d[:, n_steps // 2:])
    logd_z, to_x, to_z = whiten_logdensity(logd, m_hat, cov_hat)
    z0 = to_z(states.x)
    states_z = jax.vmap(lambda z: hmc_init(z, logd_z))(z0)
    kern_w = nuts_kernel(logd_z, step_size=0.5, inv_mass=jnp.ones(d),
                         max_depth=6)
    s_z, _, info_w = jax.jit(lambda k, s: run_chains_ensemble(k, kern_w, s,
                                                              n_steps=n_steps))(
        jax.random.key(3), states_z)
    s_w = to_x(s_z)

    # whitened trees are shallow (the metric matches the geometry)
    assert float(jnp.mean(info_w.tree_depth.astype(jnp.float32))) <= 4.0
    # variance recovery: dense metric within 25% on every axis
    var_w = np.var(np.asarray(s_w[:, n_steps // 2:]).reshape(-1, d), axis=0)
    true_var = np.diagonal(cov)
    err_w = np.max(np.abs(var_w / true_var - 1.0))
    assert err_w < 0.25, err_w
    # and it beats the diagonal run at the same budget
    var_d = np.var(np.asarray(s_d[:, n_steps // 2:]).reshape(-1, d), axis=0)
    err_d = np.max(np.abs(var_d / true_var - 1.0))
    assert err_w < err_d, (err_w, err_d)
