"""psField KL-PSF reconstruction (C2) + TDIM bintable support."""

import numpy as np
import pytest

from celeste_tpu.data.ingest.fits_lite import (
    read_fits,
    write_fits,
    write_fits_image,
    write_fits_table,
)
from celeste_tpu.data.ingest.psfield import psf_at_position, psfield_to_mog


def test_tdim_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cells = rng.normal(size=(3, 6, 8))   # 3 rows of 6x8 cells
    path = str(tmp_path / "tdim.fits")
    write_fits(path, [write_fits_image(np.zeros((2, 2), np.float32)),
                      write_fits_table({"IMG": cells})])
    hdus = read_fits(path)
    np.testing.assert_allclose(hdus[1]["data"]["IMG"], cells)


def _make_psfield(tmp_path, sigma_core=1.3, n_eigen=2, size=31):
    """Synthesize a psField-like file: eigen 0 = Gaussian PSF, eigen 1 = a
    width-gradient mode; linear spatial variation in the row coordinate."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    c0 = (size - 1) / 2.0
    r2 = (xx - c0) ** 2 + (yy - c0) ** 2
    g = lambda s: np.exp(-0.5 * r2 / s**2) / (2 * np.pi * s**2)
    eig0 = g(sigma_core)
    eig1 = g(1.25 * sigma_core) - g(sigma_core)    # broadening mode

    # per-eigen polynomial coeffs over (row*RCS)^i (col*RCS)^j
    c_arr = np.zeros((n_eigen, 3, 3))
    c_arr[0, 0, 0] = 1.0
    c_arr[1, 1, 0] = 2.0        # eig1 grows linearly with row*RCS
    cols = {
        "NROW_B": np.array([3, 3], np.int32),
        "NCOL_B": np.array([3, 3], np.int32),
        "RNROW": np.array([size, size], np.int32),
        "RNCOL": np.array([size, size], np.int32),
        "C": c_arr,
        "RROWS": np.stack([eig0.ravel(), eig1.ravel()]),
    }
    hdus = [write_fits_image(np.zeros((2, 2), np.float32))]
    for _ in range(5):
        hdus.append(write_fits_table(cols))
    path = str(tmp_path / "psField-000001-1-0001.fit")
    write_fits(path, hdus)
    return path, eig0, eig1


def test_psf_reconstruction(tmp_path):
    path, eig0, eig1 = _make_psfield(tmp_path)
    hdus = read_fits(path)
    img0 = psf_at_position(hdus[3]["data"], row=0.0, col=0.0)
    np.testing.assert_allclose(img0, eig0, rtol=1e-10)
    img_far = psf_at_position(hdus[3]["data"], row=1000.0, col=0.0)
    np.testing.assert_allclose(img_far, eig0 + 2.0 * (1000 * 5e-4) * eig1, rtol=1e-10)


def test_psfield_to_mog(tmp_path):
    path, *_ = _make_psfield(tmp_path, sigma_core=1.3)
    psf = psfield_to_mog(path, band=2, row=0.0, col=0.0, n_comp=3)
    w = np.asarray(psf.w)
    cov = np.asarray(psf.cov)
    assert abs(w.sum() - 1.0) < 1e-6
    width2 = float(np.sum(w * cov[:, 0, 0]))
    assert abs(width2 - 1.3**2) / 1.3**2 < 0.08, width2
    # PSF at high row is broader (the gradient mode)
    psf2 = psfield_to_mog(path, band=2, row=1500.0, col=0.0, n_comp=3)
    w2 = np.asarray(psf2.w)
    cov2 = np.asarray(psf2.cov)
    width2_far = float(np.sum(w2 * cov2[:, 0, 0]))
    assert width2_far > width2
