"""Quasar SED subsystem tests (SURVEY.md C13-C15, BASELINE config 4):
basis fit recovery, filter projection physics, and photo-z posterior
recovery on synthetic targets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.quasar import (
    FilterBank,
    PhotoZConfig,
    fit_basis,
    make_photo_z_logdensity,
    project_to_bands,
    run_photo_z,
    sdss_like_filterbank,
    synthetic_quasar_spectra,
    synthetic_template_basis,
)


@pytest.fixture(scope="module")
def basis():
    return synthetic_template_basis(n_grid=512)


@pytest.fixture(scope="module")
def filters():
    return sdss_like_filterbank(n_pts=64)


def test_filterbank_normalization(filters):
    w = np.asarray(filters.resp * filters.lam * filters.dlam).sum(axis=1)
    np.testing.assert_allclose(w, 1.0, rtol=1e-5)


def test_projection_flat_spectrum(filters):
    """A flat f(lam)=const SED must give equal flux in every band (the
    photon-counting normalization makes band flux = weighted mean of f).
    Needs a rest grid covering the reddest filter tail at z=0."""
    wide = synthetic_template_basis(n_grid=512, lam_max=1100.0)
    flat = wide._replace(b=jnp.ones_like(wide.b))
    flux = project_to_bands(flat, filters, jnp.asarray([1.0, 0, 0, 0]), 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(flux), np.asarray(flux)[0], rtol=1e-4)


def test_projection_redshift_lyman_break(filters, basis):
    """The Lyman break must sweep through the bands with redshift: u-band
    flux collapses by orders of magnitude between z=2 and z=3 (break
    crossing u), and g/r drops from z=2 to z=3.5 (break entering g)."""
    w = jnp.asarray([0.0, 0.0, 1.0, 0.0])   # strong-line template
    f20 = np.asarray(project_to_bands(basis, filters, w, 1.0, 2.0))
    f30 = np.asarray(project_to_bands(basis, filters, w, 1.0, 3.0))
    f35 = np.asarray(project_to_bands(basis, filters, w, 1.0, 3.5))
    assert f20[0] / f30[0] > 100.0
    assert f20[1] / f20[2] > f35[1] / f35[2]


def test_band_matrix_grid_matches_exact(filters, basis):
    """The tabulated projection (PhotoZConfig default) must stay below the
    likelihood's noise floor everywhere: worst model-flux deviation from
    the exact per-eval projection < 10% of a 3%-photometry sigma, median
    < 1e-3 sigma, over random (w, m, z) draws."""
    from celeste_tpu.quasar.photometry import (
        band_matrix_grid, project_to_bands_grid,
    )

    grid = band_matrix_grid(basis, filters, z_max=6.0, n_z=8192)
    rng = np.random.default_rng(3)
    zs = jnp.asarray(rng.uniform(0.01, 5.99, 256), jnp.float32)
    ws = jnp.asarray(rng.dirichlet(np.ones(basis.n_basis), 256), jnp.float32)
    ms = jnp.asarray(np.exp(rng.normal(0, 1, 256)), jnp.float32)
    exact = np.asarray(jax.jit(jax.vmap(
        lambda w, m, z: project_to_bands(basis, filters, w, m, z)))(ws, ms, zs))
    fast = np.asarray(jax.jit(jax.vmap(
        lambda w, m, z: project_to_bands_grid(grid, w, m, z)))(ws, ms, zs))
    sig = 0.03 * np.abs(exact) + 1e-5
    err_sigma = np.abs(fast - exact) / sig
    assert float(err_sigma.max()) < 0.10, float(err_sigma.max())
    assert float(np.median(err_sigma)) < 1e-3


def test_photo_z_grid_logdensity_grad_matches_exact(filters, basis):
    """The grid-backed log density tracks the exact path where it matters —
    the posterior-typical region (residuals of order sigma): values within
    0.05 nats and gradients within a few % there.  (Far out in the tails
    the deviation grows with the residual — a 3e-4-sigma model wobble on a
    50-sigma residual is ~1.5 nats of a ~1e3-nat chi2 — which moves no
    sampler: the tails are where chains are rejected anyway.)"""
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, make_photo_z_logdensity,
    )

    rng = np.random.default_rng(7)
    z_true, m_true = 1.7, 2.0
    w = jnp.asarray([0.4, 0.3, 0.2, 0.1])
    f = np.asarray(project_to_bands(basis, filters, w, m_true, z_true))
    e = 0.03 * np.abs(f) + 1e-5
    flux = f + rng.normal(size=f.shape) * e
    logd_fast = make_photo_z_logdensity(
        basis, filters, flux, e, PhotoZConfig())
    logd_exact = make_photo_z_logdensity(
        basis, filters, flux, e, PhotoZConfig(flux_grid_n=0))
    # posterior-typical points: unconstrained truth + small jitter
    zeta0 = float(np.log(z_true / (6.0 - z_true)))
    eta0 = np.log(np.asarray(w[:3]) / float(w[3]))
    vec0 = np.concatenate([[zeta0], eta0, [np.log(m_true)]])
    vecs = jnp.asarray(
        vec0[None] + 0.05 * rng.normal(size=(64, vec0.size)), jnp.float32)
    lf = jax.jit(jax.vmap(logd_fast))(vecs)
    le = jax.jit(jax.vmap(logd_exact))(vecs)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le), atol=0.05)
    gf = np.asarray(jax.jit(jax.vmap(jax.grad(logd_fast)))(vecs))
    ge = np.asarray(jax.jit(jax.vmap(jax.grad(logd_exact)))(vecs))
    assert np.isfinite(gf).all()
    # gradients agree to a few % where they are not ~0 (the interp kinks
    # perturb the z-derivative only at the table scale)
    denom = np.abs(ge) + 1e-2 * np.abs(ge).max()
    assert float(np.median(np.abs(gf - ge) / denom)) < 0.02


def test_oracle_photoz_logprob_matches_jax(filters, basis):
    """The NumPy photo-z oracle (the config-4 throughput denominator,
    oracle/photoz.py) targets the IDENTICAL density as the rebuild's
    exact-path logdensity: priors, Jacobians, projection — parity at fp32
    noise over random unconstrained points."""
    from celeste_tpu.oracle.photoz import oracle_photoz_logprob
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, make_photo_z_logdensity,
    )

    rng = np.random.default_rng(11)
    w = jnp.asarray([0.4, 0.3, 0.2, 0.1])
    f = np.asarray(project_to_bands(basis, filters, w, 2.0, 1.7))
    e = 0.03 * np.abs(f) + 1e-5
    flux = f + rng.normal(size=f.shape) * e
    logd = make_photo_z_logdensity(basis, filters, flux, e,
                                   PhotoZConfig(flux_grid_n=0))
    lam_rest = np.asarray(basis.lam_rest, float)
    b = np.asarray(basis.b, float)
    fl = np.asarray(filters.lam, float)
    fw = np.asarray(filters.resp * filters.lam * filters.dlam, float)
    for _ in range(20):
        v = rng.normal(0, 1.5, basis.n_basis + 1)
        a = float(logd(jnp.asarray(v, jnp.float32)))
        o = oracle_photoz_logprob(v, lam_rest, b, fl, fw, flux, e)
        assert abs(a - o) / max(abs(o), 1.0) < 1e-5, (a, o)


def test_oracle_photoz_pt_recovers_z(filters, basis):
    """The oracle slice-within-PT sampler actually works (its measured
    targets/s is a fair denominator, not a broken chain's): on a bright
    target it recovers z within 0.25."""
    from celeste_tpu.oracle.photoz import (
        geometric_betas, oracle_photoz_logprob, oracle_photoz_pt,
    )

    rng = np.random.default_rng(2)
    z_true = 2.2
    w = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    f = np.asarray(project_to_bands(basis, filters, w, 2.0, z_true))
    e = 0.03 * np.abs(f) + 1e-5
    flux = f + rng.normal(size=f.shape) * e
    lam_rest = np.asarray(basis.lam_rest, float)
    b = np.asarray(basis.b, float)
    fl = np.asarray(filters.lam, float)
    fw = np.asarray(filters.resp * filters.lam * filters.dlam, float)
    lp = lambda v: oracle_photoz_logprob(  # noqa: E731
        v, lam_rest, b, fl, fw, flux, e)
    k = basis.n_basis
    x0s = rng.normal(size=(4, k + 1)) * np.asarray([2.0] + [1.0] * k)
    betas = geometric_betas(4, 0.02)
    cold, swap_rate = oracle_photoz_pt(lp, x0s, betas, 160,
                                       np.full(k + 1, 1.0), rng)
    z = 6.0 / (1.0 + np.exp(-cold[60:, 0]))
    assert abs(float(np.median(z)) - z_true) < 0.25, float(np.median(z))
    assert 0.0 < swap_rate <= 1.0


def test_basis_fit_recovers_subspace(basis):
    """Fit on synthetic spectra: the fitted basis must reconstruct held-out
    spectra to within ~2x the noise level."""
    spectra, ivar, w_true, m_true = synthetic_quasar_spectra(64, basis, seed=1, snr=30.0)
    fitted, losses = fit_basis(spectra, ivar, basis.lam_rest, n_basis=4,
                               n_steps=1200, seed=0)
    assert float(losses[-1]) < float(losses[10])  # optimization progressed
    # reconstruct each training spectrum with nonneg least squares on the
    # fitted basis (solve via normal equations with ridge, clip)
    b = np.asarray(fitted.b)
    s = np.asarray(spectra)
    coef, *_ = np.linalg.lstsq(b.T, s.T, rcond=None)
    recon = (b.T @ coef).T
    resid = s - recon
    noise = 1.0 / np.sqrt(np.asarray(ivar))
    chi = np.abs(resid) / noise
    assert np.mean(chi) < 2.0, float(np.mean(chi))


def test_photo_z_recovers_redshift(basis, filters):
    """End-to-end config 4: generate fluxes at a known z, run the tempered
    sampler, require the posterior to put substantial mass near z_true."""
    rng = np.random.default_rng(3)
    z_true = 2.4
    w_true = jnp.asarray([0.15, 0.1, 0.65, 0.1])
    m_true = 2.0
    flux_clean = project_to_bands(basis, filters, w_true, m_true, z_true)
    err = 0.03 * np.abs(np.asarray(flux_clean)) + 1e-5
    flux_obs = np.asarray(flux_clean) + rng.normal(size=5) * err

    cfg = PhotoZConfig(n_temps=6, n_steps=600, n_warmup=200, n_systems=6)
    out = run_photo_z(jax.random.key(0), basis, filters, flux_obs, err, cfg)
    z = np.asarray(out["z"]).ravel()
    frac_near = np.mean(np.abs(z - z_true) < 0.25)
    assert frac_near > 0.3, (frac_near, np.percentile(z, [5, 25, 50, 75, 95]))
    assert float(out["swap_rate"]) > 0.05


def test_photo_z_logdensity_finite_and_differentiable(basis, filters):
    logd = make_photo_z_logdensity(basis, filters,
                                   jnp.asarray([1.0, 2.0, 3.0, 3.5, 4.0]) * 1e-3,
                                   jnp.full(5, 1e-4))
    vec = jnp.zeros(5)
    val, grad = jax.value_and_grad(logd)(vec)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


def test_photo_z_hmc_inner(basis, filters):
    """Gradient-based HMC within tempering recovers the same redshift
    posterior as the slice inner kernel."""
    rng = np.random.default_rng(6)
    z_true = 1.6
    w_true = jnp.asarray([0.3, 0.2, 0.3, 0.2])
    flux = project_to_bands(basis, filters, w_true, 1.4, z_true)
    err = 0.03 * np.abs(np.asarray(flux)) + 1e-6
    obs = np.asarray(flux) + rng.normal(size=5) * err
    cfg = PhotoZConfig(n_temps=6, n_steps=500, n_warmup=200, n_systems=4,
                       inner="hmc")
    out = run_photo_z(jax.random.key(5), basis, filters, obs, err, cfg)
    z = np.asarray(out["z"]).ravel()
    assert np.mean(np.abs(z - z_true) < 0.3) > 0.3, np.percentile(z, [25, 50, 75])


def test_photo_z_hmc_adaptive_inner_robust_across_snr(basis, filters):
    """VERDICT r1 weak #6: per-replica dual-averaging warmup
    (inner='hmc_adaptive') replaces the one-size beta^(-1/4) step heuristic;
    the ladder must keep swapping AND recover z at BOTH a high and a low
    SNR (the heuristic was tuned at one synthetic SNR)."""
    rng = np.random.default_rng(13)
    z_true = 2.4
    w_true = jnp.asarray([0.15, 0.1, 0.65, 0.1])
    flux_clean = project_to_bands(basis, filters, w_true, 2.0, z_true)
    for snr_frac, min_frac in ((0.01, 0.3), (0.15, 0.15)):
        err = snr_frac * np.abs(np.asarray(flux_clean)) + 1e-5
        obs = np.asarray(flux_clean) + rng.normal(size=5) * err
        cfg = PhotoZConfig(n_temps=6, n_steps=400, n_warmup=150, n_systems=4,
                           inner="hmc_adaptive", pt_warmup_steps=120,
                           hmc_n_leapfrog=8)
        out = run_photo_z(jax.random.key(11), basis, filters, obs, err, cfg)
        z = np.asarray(out["z"]).ravel()
        assert np.isfinite(z).all()
        # ladder actually exchanges at both SNRs (no hot-end collapse)
        assert float(out["swap_rate"]) > 0.1, (snr_frac, float(out["swap_rate"]))
        frac_near = np.mean(np.abs(z - z_true) < 0.35)
        assert frac_near > min_frac, (snr_frac, frac_near,
                                      np.percentile(z, [5, 50, 95]))


def test_photo_z_batch_independent_targets(basis, filters):
    """run_photo_z_batch: two targets at different z, one vmapped program;
    each posterior must track ITS OWN target (no cross-target leakage)."""
    import numpy as np
    from celeste_tpu.quasar.photo_z import PhotoZConfig, run_photo_z_batch

    rng = np.random.default_rng(5)
    z_true = np.array([1.2, 3.1])
    flux, err = [], []
    for z in z_true:
        w = jnp.asarray([0.25, 0.25, 0.25, 0.25])
        f = np.asarray(project_to_bands(basis, filters, w, 2.0, float(z)))
        e = 0.03 * np.abs(f) + 1e-5
        flux.append(f + rng.normal(size=f.shape) * e)
        err.append(e)
    cfg = PhotoZConfig(n_temps=5, n_steps=400, n_warmup=150, n_systems=2,
                       inner="hmc_adaptive")
    out = run_photo_z_batch(jax.random.key(6), basis, filters,
                            np.stack(flux), np.stack(err), cfg)
    z = np.asarray(out["z"]).reshape(2, -1)
    z_med = np.median(z, axis=1)
    assert abs(z_med[0] - z_true[0]) < 0.35, (z_med, z_true)
    assert abs(z_med[1] - z_true[1]) < 0.35, (z_med, z_true)


def test_photo_z_batch_segmented_invariance(basis, filters):
    """Segmented config-4 execution (VERDICT r2 Next #3): splitting the
    sampling scan into bounded device calls must be INVISIBLE to the chain
    — bitwise-identical samples for any segment_steps, because the
    per-step key stream is pre-split once and segments scan slices."""
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, run_photo_z_batch_segmented,
    )

    rng = np.random.default_rng(9)
    flux, err = [], []
    for z in (1.0, 2.8):
        w = jnp.asarray([0.25, 0.25, 0.25, 0.25])
        f = np.asarray(project_to_bands(basis, filters, w, 2.0, float(z)))
        e = 0.03 * np.abs(f) + 1e-5
        flux.append(f + rng.normal(size=f.shape) * e)
        err.append(e)
    flux, err = np.stack(flux), np.stack(err)
    cfg = PhotoZConfig(n_temps=4, n_steps=24, n_warmup=6, n_systems=1,
                       inner="hmc_adaptive", pt_warmup_steps=15)
    k = jax.random.key(3)
    o_mono = run_photo_z_batch_segmented(k, basis, filters, flux, err, cfg,
                                         segment_steps=24)
    o_seg = run_photo_z_batch_segmented(k, basis, filters, flux, err, cfg,
                                        segment_steps=7)
    np.testing.assert_array_equal(np.asarray(o_mono["vec"]),
                                  np.asarray(o_seg["vec"]))
    assert o_mono["z"].shape == (2, 1, 18)
    assert np.isfinite(np.asarray(o_mono["z"])).all()


def test_photo_z_batch_segmented_deadline_stop(basis, filters):
    """A tripped deadline stops the segmented run cleanly BETWEEN segments:
    at least one segment always runs, the partial samples are the bitwise
    prefix of the full run's, and the timing/progress fields report what
    actually happened (the bench's budget hook contract)."""
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, run_photo_z_batch_segmented,
    )

    rng = np.random.default_rng(5)
    w = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    f = np.asarray(project_to_bands(basis, filters, w, 2.0, 1.5))
    e = 0.03 * np.abs(f) + 1e-5
    flux = (f + rng.normal(size=f.shape) * e)[None]
    err = e[None]
    cfg = PhotoZConfig(n_temps=4, n_steps=21, n_warmup=3, n_systems=1,
                       inner="hmc_adaptive", pt_warmup_steps=10)
    k = jax.random.key(4)
    o_full = run_photo_z_batch_segmented(k, basis, filters, flux, err, cfg,
                                         segment_steps=7)
    o_cut = run_photo_z_batch_segmented(k, basis, filters, flux, err, cfg,
                                        segment_steps=7,
                                        deadline_fn=lambda: False)
    assert o_full["n_steps_done"] == 21
    assert o_cut["n_steps_done"] == 7          # one segment, then the stop
    assert len(o_cut["timings"]["segment_s"]) == 1
    # the partial run is the PREFIX of the full run (pre-split key stream)
    np.testing.assert_array_equal(
        np.asarray(o_full["vec"])[:, :, :7 - cfg.n_warmup],
        np.asarray(o_cut["vec"]))
    assert np.isfinite(np.asarray(o_cut["z"])).all()


def test_photo_z_batch_size_invariance(basis, filters):
    """Per-target keys are fold_in(key, target_index): a target's chain is
    IDENTICAL whether it runs in a batch of 3 or 6 — batch size cannot
    change per-target recovery by construction.  This is the diagnosis of
    the r2 'recovery degrades with N' observation: composition + binomial
    noise, not ladder under-mixing (BASELINE.md)."""
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, run_photo_z_batch_segmented,
    )

    rng = np.random.default_rng(11)
    flux, err = [], []
    for z in (0.8, 1.9, 3.0, 1.4, 2.5, 3.6):
        w = jnp.asarray([0.25, 0.25, 0.25, 0.25])
        f = np.asarray(project_to_bands(basis, filters, w, 2.0, float(z)))
        e = 0.03 * np.abs(f) + 1e-5
        flux.append(f + rng.normal(size=f.shape) * e)
        err.append(e)
    flux, err = np.stack(flux), np.stack(err)
    cfg = PhotoZConfig(n_temps=4, n_steps=20, n_warmup=5, n_systems=1,
                       inner="hmc_adaptive", pt_warmup_steps=10)
    k = jax.random.key(2)
    o_big = run_photo_z_batch_segmented(k, basis, filters, flux, err, cfg)
    o_sub = run_photo_z_batch_segmented(k, basis, filters, flux[:3], err[:3],
                                        cfg)
    np.testing.assert_array_equal(np.asarray(o_big["vec"])[:3],
                                  np.asarray(o_sub["vec"]))
