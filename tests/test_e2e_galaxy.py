"""BASELINE config 3: galaxy source — exp/deV MoG profiles with
shape/orientation params, NUTS over the 11-dim posterior (SURVEY.md §7 M4;
hard part: the (theta, ab, phi, r_e) geometry needs the unconstrained
reparameterization + gradient sampling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp
from celeste_tpu.inference import (
    hmc_init,
    hmc_warmup,
    nuts_kernel,
    run_chains_ensemble,
    split_rhat,
)
from celeste_tpu.inference.problems import make_galaxy_logdensity
from celeste_tpu.model.params import GalaxyParams
from celeste_tpu.model.priors import FluxPrior, SourcePriors

FLUX_R = 80.0


@pytest.fixture(scope="module")
def galaxy_run():
    src = galaxy_source(u=(30.0, 10.0), flux_r=FLUX_R, theta_dev=0.35, sigma=1.6,
                        ab=0.55, phi=0.8)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=17)
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(FLUX_R), log_ref_std=2.0))
    logd = make_galaxy_logdensity([scene.stamps[0]], bands=[0], priors=priors, n_bands=1)
    du = scene.wcs.equa2duas(src["u"])
    t = src["theta_dev"]
    x_true = np.asarray(np.concatenate([
        du, [np.log(src["flux"][2]), np.log(t / (1 - t)), np.log(src["sigma"]),
             np.log(src["ab"] / (1 - src["ab"])), src["phi"]],
    ]), np.float32)

    n_chains = 8
    x0 = jnp.asarray(x_true)[None, :] + 0.02 * jax.random.normal(jax.random.key(0),
                                                                 (n_chains, 7))
    states, ss, im = jax.vmap(
        lambda k, x: hmc_warmup(k, logd, x, n_warmup=200, n_leapfrog=10)
    )(jax.random.split(jax.random.key(1), n_chains), x0)
    kern = nuts_kernel(logd, step_size=float(jnp.median(ss)),
                       inv_mass=jnp.mean(im, axis=0), max_depth=5)
    samples, _, info = run_chains_ensemble(jax.random.key(2), kern, states, n_steps=250)
    return samples, info, x_true


@pytest.mark.slow
def test_galaxy_posterior_brackets_truth(galaxy_run):
    samples, info, x_true = galaxy_run
    kept = np.asarray(samples[:, 60:]).reshape(-1, 7)
    mean, std = kept.mean(0), kept.std(0)
    # all marginals bracket truth at 4.5 sigma (phi is pi-periodic; compare
    # in principal value)
    err = np.abs(mean - x_true)
    err[6] = min(err[6], abs(err[6] - np.pi))
    assert np.all(err < 4.5 * std + 5e-3), (mean, std, x_true)


def test_galaxy_shape_identified(galaxy_run):
    """sigma and ab must be genuinely constrained by the data (posterior
    much tighter than the prior), phi constrained for an ab=0.55 galaxy."""
    samples, info, x_true = galaxy_run
    kept = np.asarray(samples[:, 60:]).reshape(-1, 7)
    std = kept.std(0)
    assert std[4] < 0.2      # log sigma well measured (prior sigma = 1.0)
    assert std[5] < 0.6      # logit ab
    assert std[6] < 0.5      # phi (radians)


def test_galaxy_sampler_health(galaxy_run):
    samples, info, x_true = galaxy_run
    div_frac = float(np.asarray(info.diverged, np.float32).mean())
    assert div_frac < 0.05, div_frac
    r = np.asarray(split_rhat(np.asarray(samples[:, 60:])))
    assert np.all(r < 1.2), r
