"""C2 (psField -> MoG PSF fitting) and C16 (spectro preprocessing) tests."""

import numpy as np
import pytest

from celeste_tpu.model.psf import fit_psf_mog, sdss_like_psf
from celeste_tpu.quasar.preprocess import (
    build_training_matrix,
    normalize_spectra,
    resample_to_rest,
    train_test_split,
)


def test_fit_psf_mog_recovers_widths():
    """EM fit on a rendered PSF image recovers the mixture within a few
    percent in total flux-weighted width."""
    truth = sdss_like_psf(fwhm_arcsec=1.3)
    n = 35
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    c = (n - 1) / 2.0
    img = np.zeros((n, n))
    w = np.asarray(truth.w); cov = np.asarray(truth.cov)
    for k in range(len(w)):
        v = cov[k, 0, 0]
        img += w[k] / (2 * np.pi * v) * np.exp(-0.5 * ((xx - c) ** 2 + (yy - c) ** 2) / v)
    fit = fit_psf_mog(img, n_comp=3)
    # flux-weighted second moment (width^2) parity
    want = float(np.sum(np.asarray(truth.w) * np.asarray(truth.cov)[:, 0, 0]))
    got = float(np.sum(np.asarray(fit.w) * np.asarray(fit.cov)[:, 0, 0]))
    assert abs(got - want) / want < 0.05, (got, want)
    assert abs(float(np.sum(np.asarray(fit.w))) - 1.0) < 1e-6


def test_resample_preserves_smooth_spectrum():
    lam_grid = np.geomspace(100, 900, 300)
    z = 1.5
    lam_obs = np.linspace(300, 2000, 4000)
    true_rest = lambda l: (l / 250.0) ** -1.2
    flux = true_rest(lam_obs / (1 + z))
    ivar = np.full_like(flux, 100.0)
    f, w = resample_to_rest(lam_obs, flux, ivar, z, lam_grid)
    covered = w > 0
    assert covered.sum() > 100
    np.testing.assert_allclose(f[covered], true_rest(lam_grid[covered]), rtol=2e-2)


def test_build_matrix_and_split():
    lam_grid = np.geomspace(100, 900, 200)
    rng = np.random.default_rng(0)
    spectra = []
    for i in range(10):
        z = rng.uniform(0.5, 3.0)
        lam_obs = np.linspace(360, 1000, 1500)
        flux = (lam_obs / 500) ** -1.0 + rng.normal(0, 0.01, 1500)
        spectra.append({"lam_obs": lam_obs, "flux": flux,
                        "ivar": np.full(1500, 1e4), "z": z})
    f, w = build_training_matrix(spectra, lam_grid)
    assert f.shape == (10, 200) and w.shape == (10, 200)
    tr, te = train_test_split(10, test_frac=0.2, seed=1)
    assert len(tr) == 8 and len(te) == 2
    assert set(tr) | set(te) == set(range(10))
    tr2, te2 = train_test_split(10, test_frac=0.2, seed=1)
    np.testing.assert_array_equal(tr, tr2)


def test_normalize_spectra():
    lam_grid = np.geomspace(100, 900, 200)
    flux = np.stack([np.full(200, 3.0), np.full(200, 0.5)])
    ivar = np.ones_like(flux)
    nf, niv, scale = normalize_spectra(flux, ivar, lam_grid)
    sel = (lam_grid >= 200) & (lam_grid <= 280)
    np.testing.assert_allclose(nf[:, sel].mean(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(scale, [3.0, 0.5], rtol=1e-6)
