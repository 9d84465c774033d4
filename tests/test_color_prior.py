"""GMM color prior (model/color_prior.py): EM fit recovery, density
normalization/marginalization invariants, and FluxPrior integration."""

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.model.color_prior import (
    ColorGMM, default_galaxy_gmm, default_star_gmm, fit_color_gmm,
    synthetic_star_colors,
)
from celeste_tpu.model.priors import FluxPrior
import pytest


def test_em_recovers_two_component_mixture():
    rng = np.random.default_rng(3)
    a = rng.normal([-2.0, 1.0], 0.3, (1500, 2))
    b = rng.normal([2.0, -1.0], 0.5, (1500, 2))
    gmm = fit_color_gmm(np.vstack([a, b]), n_comp=2, seed=5)
    means = np.asarray(gmm.means)
    # one component near each true mean (order-free)
    d_a = np.min(np.linalg.norm(means - np.array([-2.0, 1.0]), axis=1))
    d_b = np.min(np.linalg.norm(means - np.array([2.0, -1.0]), axis=1))
    assert d_a < 0.15 and d_b < 0.15, means
    w = np.asarray(gmm.weights)
    np.testing.assert_allclose(w, [0.5, 0.5], atol=0.05)


def test_logpdf_matches_manual_mixture():
    """ColorGMM.logpdf == log sum_k w_k N(x; mu_k, Sigma_k) via numpy."""
    rng = np.random.default_rng(7)
    covs = []
    for _ in range(3):
        m = rng.normal(0, 1, (4, 4))
        covs.append(m @ m.T + 0.5 * np.eye(4))
    mus = rng.normal(0, 1, (3, 4))
    w = np.array([0.5, 0.3, 0.2])
    gmm = ColorGMM.from_arrays(w, mus, np.stack(covs))
    x = rng.normal(0, 1.5, (16, 4)).astype(np.float32)
    got = np.asarray(gmm.logpdf(jnp.asarray(x)))
    dens = np.zeros(16)
    for k in range(3):
        cov = covs[k]
        diff = x - mus[k]
        maha = np.sum(diff @ np.linalg.inv(cov) * diff, axis=1)
        dens += w[k] * np.exp(-0.5 * maha) / np.sqrt(
            (2 * np.pi) ** 4 * np.linalg.det(cov))
    np.testing.assert_allclose(got, np.log(dens), rtol=2e-4, atol=2e-4)


def test_logpdf_normalizes_1d():
    """Marginalized to 1 color, the density integrates to ~1 (trapezoid)."""
    gmm = default_star_gmm()
    xs = np.linspace(-6, 10, 4001, dtype=np.float32)
    p = np.exp(np.asarray(gmm.logpdf(jnp.asarray(xs[:, None]))))
    integral = np.trapezoid(p, xs)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-3)


def test_marginalization_matches_truncated_construction():
    """Evaluating the 4-color GMM on 2 colors must equal a GMM explicitly
    built from the leading 2x2 covariance blocks."""
    gmm4 = default_galaxy_gmm()
    # rebuild covariances from inv_chols
    icl = np.asarray(gmm4.inv_chols)
    L = np.stack([np.linalg.inv(m) for m in icl])
    covs = np.einsum("kij,klj->kil", L, L)
    gmm2 = ColorGMM.from_arrays(np.asarray(gmm4.weights),
                                np.asarray(gmm4.means)[:, :2],
                                covs[:, :2, :2])
    x = np.random.default_rng(9).normal(0.5, 0.5, (32, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(gmm4.logpdf(jnp.asarray(x))),
                               np.asarray(gmm2.logpdf(jnp.asarray(x))),
                               rtol=1e-4, atol=1e-4)


def test_flux_prior_with_gmm_jits_and_differentiates():
    prior = FluxPrior(color_gmm=default_star_gmm())
    log_flux = jnp.asarray(np.log([20.0, 18.0, 15.0, 13.0, 12.0]),
                           jnp.float32)
    lp = jax.jit(prior.logpdf)(log_flux)
    g = jax.grad(lambda lf: prior.logpdf(lf))(log_flux)
    assert np.isfinite(float(lp))
    assert np.isfinite(np.asarray(g)).all()


def test_gmm_prior_covers_scene_defaults():
    """The shipped default GMMs must place the synthetic-scene default SEDs
    in their bulk (a prior 40 nats off the data, as a magnitude-convention
    mixup once produced, wrecks warmup geometry)."""
    from celeste_tpu.data.synthetic import galaxy_source, star_source
    from celeste_tpu.model.color_prior import default_galaxy_gmm

    s, g = star_source(flux_r=30.0), galaxy_source()
    cs = np.log(np.asarray(s["flux"][:-1]) / np.asarray(s["flux"][1:]))
    cg = np.log(np.asarray(g["flux"][:-1]) / np.asarray(g["flux"][1:]))
    lp_s = float(default_star_gmm().logpdf(jnp.asarray(cs, jnp.float32)))
    lp_g = float(default_galaxy_gmm().logpdf(jnp.asarray(cg, jnp.float32)))
    assert lp_s > -5.0, lp_s
    assert lp_g > -5.0, lp_g


@pytest.mark.slow
def test_gmm_prior_through_runner_chees():
    """star_ugriz with color_prior=gmm flows through the runner and mixes
    under the ChEES + dense-metric combination."""
    from celeste_tpu.experiments import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(name="star_ugriz", sampler="chees",
                           metric="dense", n_chains=8, n_steps=200,
                           n_warmup=150, bands=(0, 1, 2, 3, 4),
                           color_prior="gmm", shape=(19, 19))
    r = run_experiment(cfg)
    assert float(np.max(r["rhat"])) < 1.1
    assert float(np.min(r["ess"])) > 100.0


def test_gmm_prior_prefers_locus_colors():
    """Colors on the synthetic stellar locus score higher than colors far
    off it (the point of the empirical prior vs the broad Gaussian)."""
    gmm = default_star_gmm()
    locus = synthetic_star_colors(n=200, seed=33).astype(np.float32)
    off = locus + np.array([3.0, -3.0, 3.0, -3.0], np.float32)
    lp_on = np.asarray(gmm.logpdf(jnp.asarray(locus)))
    lp_off = np.asarray(gmm.logpdf(jnp.asarray(off)))
    assert np.median(lp_on) > np.median(lp_off) + 10.0
