"""BASELINE config 2: multi-band ugriz point source with color priors —
slice sampling vs HMC posterior parity (the reference's gradient-free
kernel against the rebuild's gradient kernel on the SAME posterior)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
from celeste_tpu.inference import (
    hmc_init,
    hmc_kernel,
    hmc_warmup,
    run_chains_ensemble,
    slice_init,
    slice_kernel,
    split_rhat,
)
from celeste_tpu.inference.problems import make_star_logdensity
from celeste_tpu.model.priors import FluxPrior, SourcePriors


@pytest.fixture(scope="module")
def setup():
    src = star_source(u=(30.0001, 10.00005), flux_r=40.0)
    scene = make_synthetic_stamp([src], shape=(21, 21), bands=(0, 1, 2, 3, 4), seed=13)
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(40.0), log_ref_std=2.0,
                                         color_std=(1.0, 1.0, 1.0, 1.0)))
    logd = make_star_logdensity(scene.stamps, bands=[0, 1, 2, 3, 4], priors=priors,
                                n_bands=5)
    du = scene.wcs.equa2duas(src["u"])
    x_true = jnp.asarray(np.concatenate([du, np.log(src["flux"])]), jnp.float32)
    return scene, logd, x_true


@pytest.mark.slow
def test_slice_vs_hmc_parity(setup):
    scene, logd, x_true = setup
    key = jax.random.key(0)
    n_chains = 12
    x0 = x_true + 0.03 * jax.random.normal(jax.random.key(1), (n_chains, 7))

    # slice
    widths = jnp.asarray([0.05, 0.05, 0.1, 0.05, 0.03, 0.03, 0.05])
    sk = slice_kernel(logd, widths)
    s_init = jax.vmap(lambda x: slice_init(x, logd))(x0)
    s_samp, _, _ = run_chains_ensemble(jax.random.key(2), sk, s_init, n_steps=600)
    s_kept = np.asarray(s_samp[:, 150:]).reshape(-1, 7)

    # hmc with adapted settings
    states, ss, im = jax.vmap(
        lambda k, x: hmc_warmup(k, logd, x, n_warmup=300, n_leapfrog=12)
    )(jax.random.split(jax.random.key(3), n_chains), x0)
    hk = hmc_kernel(logd, step_size=float(jnp.median(ss)), inv_mass=jnp.mean(im, axis=0),
                    n_leapfrog=12)
    h_samp, _, h_info = run_chains_ensemble(jax.random.key(4), hk, states, n_steps=600)
    assert float(jnp.mean(h_info.accept_prob)) > 0.5
    h_kept = np.asarray(h_samp[:, 150:]).reshape(-1, 7)

    sm, ss_ = s_kept.mean(0), s_kept.std(0)
    hm, hs = h_kept.mean(0), h_kept.std(0)
    # posterior parity: means within 0.5 sigma, widths within 35%
    assert np.all(np.abs(sm - hm) < 0.5 * np.maximum(ss_, hs)), (sm, hm, ss_, hs)
    ratio = ss_ / hs
    assert np.all(ratio > 0.65) and np.all(ratio < 1.55), ratio

    # both bracket truth
    assert np.all(np.abs(hm - np.asarray(x_true)) < 4.0 * hs + 1e-3)

    # convergence (positions are the slowest-mixing axes; 1.15 over 450
    # kept steps x 12 chains is adequate for a parity check)
    assert np.all(np.asarray(split_rhat(np.asarray(h_samp[:, 150:]))) < 1.15)


@pytest.mark.slow
def test_color_prior_tightens_posterior(setup):
    """With a very tight color prior, cross-band flux marginals should
    shrink relative to the weak-prior posterior (the priors actually act)."""
    scene, _, x_true = setup
    tight = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(40.0), log_ref_std=2.0,
                                        color_mean=tuple(np.diff(-np.log(
                                            [s for s in np.asarray(jnp.exp(x_true[2:]))]
                                        ))[::-1] * 0 + 0.0),
                                        color_std=(0.01, 0.01, 0.01, 0.01)))
    # simpler: tight color prior centered at the TRUE colors
    lf = np.asarray(x_true[2:])
    colors = tuple((lf[:-1] - lf[1:]).tolist())
    tight = SourcePriors(flux=FluxPrior(log_ref_mean=np.log(40.0), log_ref_std=2.0,
                                        color_mean=colors,
                                        color_std=(0.01, 0.01, 0.01, 0.01)))
    logd_tight = make_star_logdensity(scene.stamps, bands=[0, 1, 2, 3, 4],
                                      priors=tight, n_bands=5)
    logd_weak = make_star_logdensity(scene.stamps, bands=[0, 1, 2, 3, 4],
                                     priors=SourcePriors(), n_bands=5)
    n_chains = 8
    x0 = x_true + 0.02 * jax.random.normal(jax.random.key(5), (n_chains, 7))
    widths = jnp.full(7, 0.05)

    def posterior_std(logd):
        sk = slice_kernel(logd, widths)
        init = jax.vmap(lambda x: slice_init(x, logd))(x0)
        samp, _, _ = run_chains_ensemble(jax.random.key(6), sk, init, n_steps=400)
        return np.asarray(samp[:, 100:]).reshape(-1, 7).std(0)

    std_t = posterior_std(logd_tight)
    std_w = posterior_std(logd_weak)
    # u-band flux (noisiest band) must tighten substantially under the
    # color prior that ties it to the well-measured r band
    assert std_t[2] < 0.7 * std_w[2], (std_t, std_w)
