"""Sampler kernel correctness on analytically-known targets (SURVEY.md §4
item 3c): every kernel (MH, slice, HMC, NUTS) must recover the moments of a
correlated Gaussian within Monte-Carlo error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.inference import (
    hmc_init,
    hmc_kernel,
    hmc_warmup,
    mh_init,
    mh_kernel,
    nuts_kernel,
    run_chains_ensemble,
    slice_init,
    slice_kernel,
    split_rhat,
    ess,
)

# 3-D correlated Gaussian target
COV = np.array([[2.0, 0.9, -0.4], [0.9, 1.0, 0.3], [-0.4, 0.3, 0.7]])
MEAN = np.array([1.0, -2.0, 0.5])
PREC = np.linalg.inv(COV)


def logdensity(x):
    d = x - jnp.asarray(MEAN, jnp.float32)
    return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d


N_CHAINS = 16


def _init_positions(key):
    return jnp.asarray(MEAN, jnp.float32) + jax.random.normal(key, (N_CHAINS, 3))


def _check_moments(samples, mean_tol, cov_tol):
    flat = np.asarray(samples).reshape(-1, 3)
    m = flat.mean(0)
    c = np.cov(flat.T)
    np.testing.assert_allclose(m, MEAN, atol=mean_tol)
    np.testing.assert_allclose(c, COV, atol=cov_tol)
    r = np.asarray(split_rhat(np.asarray(samples)))
    assert np.all(r < 1.1), f"rhat={r}"


def test_mh_gaussian():
    key = jax.random.key(0)
    k_init, k_run = jax.random.split(key)
    kernel = mh_kernel(logdensity, step_scales=jnp.full(3, 0.8))
    init = jax.vmap(lambda x: mh_init(x, logdensity))(_init_positions(k_init))
    samples, _, info = run_chains_ensemble(k_run, kernel, init, n_steps=4000)
    acc = float(jnp.mean(info.accepted))
    assert 0.1 < acc < 0.7, acc
    _check_moments(samples[:, 1000:], 0.15, 0.35)


def test_slice_gaussian():
    key = jax.random.key(1)
    k_init, k_run = jax.random.split(key)
    kernel = slice_kernel(logdensity, widths=jnp.full(3, 2.0))
    init = jax.vmap(lambda x: slice_init(x, logdensity))(_init_positions(k_init))
    samples, _, info = run_chains_ensemble(k_run, kernel, init, n_steps=1500)
    _check_moments(samples[:, 300:], 0.12, 0.3)


def test_hmc_gaussian():
    key = jax.random.key(2)
    k_init, k_run = jax.random.split(key)
    kernel = hmc_kernel(logdensity, step_size=0.4, inv_mass=jnp.diag(COV).astype(jnp.float32),
                        n_leapfrog=8)
    init = jax.vmap(lambda x: hmc_init(x, logdensity))(_init_positions(k_init))
    samples, _, info = run_chains_ensemble(k_run, kernel, init, n_steps=2000)
    acc = float(jnp.mean(info.accept_prob))
    assert acc > 0.6, acc
    _check_moments(samples[:, 400:], 0.12, 0.3)


def test_nuts_gaussian():
    key = jax.random.key(3)
    k_init, k_run = jax.random.split(key)
    kernel = nuts_kernel(logdensity, step_size=0.5,
                         inv_mass=jnp.diag(COV).astype(jnp.float32), max_depth=6)
    init = jax.vmap(lambda x: hmc_init(x, logdensity))(_init_positions(k_init))
    samples, _, info = run_chains_ensemble(k_run, kernel, init, n_steps=1200)
    assert not bool(jnp.any(info.diverged)), "NUTS diverged on a Gaussian"
    assert float(jnp.mean(info.tree_depth)) >= 1.0
    _check_moments(samples[:, 200:], 0.12, 0.3)


def test_hmc_warmup_adapts():
    """Dual averaging should land in a sane step-size range and the Welford
    mass should approximate the target variances."""
    key = jax.random.key(4)
    keys = jax.random.split(key, N_CHAINS)
    x0 = _init_positions(jax.random.key(5))
    states, step_sizes, inv_mass = jax.vmap(
        lambda k, x: hmc_warmup(k, logdensity, x, n_warmup=600, n_leapfrog=8)
    )(keys, x0)
    ss = np.asarray(step_sizes)
    assert np.all(ss > 0.05) and np.all(ss < 5.0), ss
    im = np.asarray(inv_mass).mean(0)
    np.testing.assert_allclose(im, np.diag(COV), rtol=0.6)


def test_ess_sanity():
    """ESS of iid samples ~ n; ESS of heavily autocorrelated samples << n."""
    rng = np.random.default_rng(0)
    iid = rng.normal(size=(4, 1000))
    e_iid = float(ess(jnp.asarray(iid, jnp.float32)))
    assert e_iid > 2000, e_iid  # 4000 total
    ar = np.zeros((4, 1000))
    for c in range(4):
        for t in range(1, 1000):
            ar[c, t] = 0.95 * ar[c, t - 1] + rng.normal() * 0.1
    e_ar = float(ess(jnp.asarray(ar, jnp.float32)))
    assert e_ar < 1000, e_ar
