"""JAX forward model vs NumPy oracle parity (SURVEY.md §4 item 1) plus
analytic invariants (item 2): unit-profile completeness, WCS round-trip,
Poisson loglik vs scipy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.stats

from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
from celeste_tpu.likelihood import poisson_loglik, stamp_loglik
from celeste_tpu.model import expected_image
from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.mog import MoG2D, convolve, eval_grid, isotropic
from celeste_tpu.oracle.forward import (
    oracle_galaxy_lambda,
    oracle_poisson_loglik,
    oracle_star_lambda,
)


@pytest.fixture(scope="module")
def star_scene():
    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    return make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)


@pytest.fixture(scope="module")
def galaxy_scene():
    src = galaxy_source(u=(30.0, 10.0), flux_r=60.0, theta_dev=0.35, sigma=1.8, ab=0.55, phi=0.9)
    return make_synthetic_stamp([src], shape=(31, 31), bands=(2,), seed=4)


def test_star_lambda_parity(star_scene):
    src = star_scene.sources[0]
    stamp = star_scene.stamps[0]
    ost = star_scene.oracle_stamps[0]
    lam_oracle = oracle_star_lambda(src["u"], src["flux"][2], ost)
    du = star_scene.wcs.equa2duas(src["u"])
    sp = StarParams(u=jnp.asarray(du, jnp.float32), flux=jnp.asarray(src["flux"], jnp.float32))
    lam_jax = np.asarray(expected_image([sp], stamp, band=2))
    np.testing.assert_allclose(lam_jax, lam_oracle, rtol=2e-4, atol=1e-3)


def test_galaxy_lambda_parity(galaxy_scene):
    src = galaxy_scene.sources[0]
    stamp = galaxy_scene.stamps[0]
    ost = galaxy_scene.oracle_stamps[0]
    lam_oracle = oracle_galaxy_lambda(
        src["u"], src["flux"][2], src["theta_dev"], src["sigma"], src["ab"], src["phi"], ost
    )
    du = galaxy_scene.wcs.equa2duas(src["u"])
    gp = GalaxyParams(
        u=jnp.asarray(du, jnp.float32),
        flux=jnp.asarray(src["flux"], jnp.float32),
        theta_dev=jnp.float32(src["theta_dev"]),
        sigma=jnp.float32(src["sigma"]),
        ab=jnp.float32(src["ab"]),
        phi=jnp.float32(src["phi"]),
    )
    lam_jax = np.asarray(expected_image([gp], stamp, band=2))
    np.testing.assert_allclose(lam_jax, lam_oracle, rtol=5e-4, atol=2e-3)


def test_loglik_parity(star_scene):
    src = star_scene.sources[0]
    stamp = star_scene.stamps[0]
    ost = star_scene.oracle_stamps[0]
    lam_oracle = oracle_star_lambda(src["u"], src["flux"][2], ost)
    ll_oracle = oracle_poisson_loglik(lam_oracle, ost["counts"])
    du = star_scene.wcs.equa2duas(src["u"])
    sp = StarParams(u=jnp.asarray(du, jnp.float32), flux=jnp.asarray(src["flux"], jnp.float32))
    ll_jax = float(stamp_loglik([sp], stamp, band=2))
    # fp32 summation over ~1e5-magnitude terms: allow ~1e-5 relative
    assert abs(ll_jax - ll_oracle) < 0.5 + 1e-5 * abs(ll_oracle)


def test_poisson_vs_scipy():
    rng = np.random.default_rng(0)
    lam = rng.uniform(1.0, 50.0, size=(7, 9))
    counts = rng.poisson(lam).astype(np.float64)
    want = scipy.stats.poisson.logpmf(counts, lam).sum()
    got = float(poisson_loglik(jnp.asarray(lam, jnp.float32), jnp.asarray(counts, jnp.float32),
                               normalized=True))
    assert abs(got - want) < 1e-2


def test_psf_completeness(star_scene):
    """Unit profile integrates to ~1 over a big grid (photometric
    completeness; pixel area = 1 in pixel coords)."""
    stamp = star_scene.stamps[0]
    psf = stamp.psf
    n = 41
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    dens = eval_grid(psf.shift(jnp.asarray([c, c], jnp.float32)),
                     jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()))
    assert abs(float(jnp.sum(dens)) - 1.0) < 5e-3


def test_wcs_roundtrip(star_scene):
    """Host fp64 WCS round-trip (C12) + host/device affine agreement."""
    wcs = star_scene.wcs
    u = np.array([30.0012, 9.9987])
    p = wcs.equa2pixel(u)
    np.testing.assert_allclose(wcs.pixel2equa(p), u, atol=1e-9)
    stamp = star_scene.stamps[0]
    du = wcs.equa2duas(u)
    p_dev = stamp.duas2pixel(jnp.asarray(du, jnp.float32))
    np.testing.assert_allclose(np.asarray(p_dev), p, atol=1e-3)


def test_mog_convolution_closure():
    """MoG (*) MoG analytic convolution vs brute-force FFT convolution."""
    f = isotropic([0.7, 0.3], np.zeros((2, 2)), [1.5, 4.0])
    g = isotropic([0.6, 0.4], np.zeros((2, 2)), [0.8, 2.5])
    conv = convolve(f, g)
    n = 65
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    shift = jnp.asarray([c, c], jnp.float32)
    grid = lambda m: np.asarray(
        eval_grid(m.shift(shift), jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()))
    ).reshape(n, n)
    img_f, img_g, img_conv = grid(f), grid(g), grid(conv)
    fft_conv = np.real(np.fft.ifft2(np.fft.fft2(np.fft.ifftshift(img_f)) * np.fft.fft2(img_g)))
    np.testing.assert_allclose(img_conv, fft_conv, atol=5e-5)


def test_grad_flows(star_scene):
    """Autodiff through the whole stack returns finite grads (HMC-readiness)."""
    stamp = star_scene.stamps[0]
    src = star_scene.sources[0]

    def ll(vec):
        sp = StarParams.from_vector(vec, n_bands=5)
        return stamp_loglik([sp], stamp, band=2)

    du = star_scene.wcs.equa2duas(src["u"])
    vec = StarParams(
        u=jnp.asarray(du, jnp.float32), flux=jnp.asarray(src["flux"], jnp.float32)
    ).to_vector()
    g = jax.grad(ll)(vec)
    assert np.all(np.isfinite(np.asarray(g)))
