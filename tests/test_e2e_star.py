"""End-to-end BASELINE config 1: single point source, MoG-PSF render +
Poisson log-lik on one r-band stamp, MH over (position, flux) — JAX chain
ensemble vs the NumPy-oracle sampler on the SAME data must agree in
posterior mean/std (SURVEY.md §4 item 3b: posterior parity), and both must
bracket the ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
from celeste_tpu.inference import mh_init, mh_kernel, run_chains_ensemble, summarize
from celeste_tpu.inference.problems import make_star_logdensity
from celeste_tpu.model.priors import FluxPrior, SourcePriors
from celeste_tpu.oracle.forward import oracle_poisson_loglik, oracle_star_lambda
from celeste_tpu.oracle.samplers import oracle_mh

FLUX_R = 30.0


@pytest.fixture(scope="module")
def scene():
    src = star_source(u=(30.00005, 10.00008), flux_r=FLUX_R)
    return make_synthetic_stamp([src], shape=(21, 21), bands=(2,), seed=11)


@pytest.fixture(scope="module")
def posteriors(scene):
    """Run both samplers once; reused by the assertions below."""
    src = scene.sources[0]
    stamp = scene.stamps[0]
    ost = scene.oracle_stamps[0]
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(FLUX_R), log_ref_std=2.0))

    # --- JAX: n_bands=1 model (single r-band stamp), 32 chains ----------
    logd = make_star_logdensity([stamp], bands=[0], priors=priors, n_bands=1)
    # n_bands=1: vector = [du_e, du_n, log_flux_r]; stamp band slot 0
    du_true = scene.wcs.equa2duas(src["u"])
    x_true = jnp.asarray([du_true[0], du_true[1], np.log(src["flux"][2])], jnp.float32)

    key = jax.random.key(42)
    k_i, k_r = jax.random.split(key)
    x0 = x_true + 0.05 * jax.random.normal(k_i, (32, 3))
    kernel = mh_kernel(logd, step_scales=jnp.asarray([0.012, 0.012, 0.008]))
    init = jax.vmap(lambda x: mh_init(x, logd))(x0)
    samples, _, info = run_chains_ensemble(k_r, kernel, init, n_steps=3000)
    jax_samples = np.asarray(samples[:, 1000:, :]).reshape(-1, 3)

    # --- oracle: same posterior in (du_e, du_n, log_flux) coordinates ----
    wcs = scene.wcs

    def oracle_logpost(vec):
        u = wcs.duas2equa(vec[:2])
        flux = np.exp(vec[2])
        lam = oracle_star_lambda(u, flux, ost)
        ll = oracle_poisson_loglik(lam, ost["counts"])
        lp = (-0.5 * ((vec[2] - np.log(FLUX_R)) / 2.0) ** 2)  # same flux prior
        return ll + lp  # position prior flat here; jacobian exp-transform
        # note: the JAX side's log-det-jacobian (log flux) corresponds to
        # sampling in log-flux space, which this oracle does too.

    rng = np.random.default_rng(7)
    o_samples, acc = oracle_mh(
        oracle_logpost, np.asarray(x_true, np.float64), n_steps=6000,
        step_scales=np.array([0.012, 0.012, 0.008]), rng=rng,
    )
    oracle_samples = o_samples[2000:]
    return jax_samples, oracle_samples, np.asarray(x_true, np.float64), acc


def test_acceptance_sane(posteriors):
    _, _, _, acc = posteriors
    assert 0.08 < acc < 0.9


def test_posterior_brackets_truth(posteriors):
    jax_s, _, x_true, _ = posteriors
    mean, std = jax_s.mean(0), jax_s.std(0)
    # truth within 4 posterior sigmas for every parameter
    assert np.all(np.abs(mean - x_true) < 4.0 * std + 1e-3), (mean, std, x_true)


def test_posterior_parity_with_oracle(posteriors):
    """SURVEY.md correctness gate: marginal mean within a fraction of the
    posterior sigma, sigmas within 25% of each other."""
    jax_s, ora_s, _, _ = posteriors
    jm, js = jax_s.mean(0), jax_s.std(0)
    om, os_ = ora_s.mean(0), ora_s.std(0)
    assert np.all(np.abs(jm - om) < 0.5 * np.maximum(js, os_)), (jm, om, js, os_)
    assert np.all(js / os_ > 0.7) and np.all(js / os_ < 1.4), (js, os_)


def test_posterior_precision_physical(posteriors):
    """Position posterior sigma should be at the expected astrometric scale
    (sub-pixel: ~sigma_psf / SNR); flux sigma ~ flux / SNR."""
    jax_s, _, _, _ = posteriors
    std = jax_s.std(0)
    assert std[0] < 0.396  # du_e tighter than one pixel
    assert std[1] < 0.396
    assert std[2] < 0.2    # log-flux to better than 20%


def test_slice_parity_with_oracle_slice(scene, posteriors):
    """The rebuild's slice sampler vs the oracle's slice sampler on the
    SAME posterior (the reference's workhorse kernel, C10) — marginal
    parity like the MH comparison above."""
    from celeste_tpu.inference import run_chains_ensemble, slice_init, slice_kernel
    from celeste_tpu.oracle.samplers import oracle_slice_sample

    src = scene.sources[0]
    stamp = scene.stamps[0]
    ost = scene.oracle_stamps[0]
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(FLUX_R), log_ref_std=2.0))
    logd = make_star_logdensity([stamp], bands=[0], priors=priors, n_bands=1)
    du_true = scene.wcs.equa2duas(src["u"])
    x_true = jnp.asarray([du_true[0], du_true[1], np.log(src["flux"][2])], jnp.float32)

    kern = slice_kernel(logd, widths=jnp.full(3, 0.05))
    x0 = x_true + 0.03 * jax.random.normal(jax.random.key(7), (16, 3))
    init = jax.vmap(lambda x: slice_init(x, logd))(x0)
    samples, _, _ = run_chains_ensemble(jax.random.key(8), kern, init, n_steps=400)
    jax_s = np.asarray(samples[:, 100:]).reshape(-1, 3)

    wcs = scene.wcs

    def oracle_logpost(vec):
        u = wcs.duas2equa(vec[:2])
        lam = oracle_star_lambda(u, np.exp(vec[2]), ost)
        ll = oracle_poisson_loglik(lam, ost["counts"])
        return ll - 0.5 * ((vec[2] - np.log(FLUX_R)) / 2.0) ** 2

    rng = np.random.default_rng(17)
    o = oracle_slice_sample(oracle_logpost, np.asarray(x_true, np.float64),
                            n_steps=500, widths=np.full(3, 0.05), rng=rng)
    ora_s = o[100:]
    jm, js = jax_s.mean(0), jax_s.std(0)
    om, os_ = ora_s.mean(0), ora_s.std(0)
    assert np.all(np.abs(jm - om) < 0.5 * np.maximum(js, os_)), (jm, om)
    assert np.all(js / os_ > 0.65) and np.all(js / os_ < 1.55), (js, os_)
