"""Fused Pallas kernel vs dense jnp path parity (SURVEY.md §4 item 1 /
§7 M2).  On CPU the kernel runs in interpret mode — same program, same
answers; the TPU-compiled path is exercised by bench.py on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
from celeste_tpu.kernels import batched_stamp_loglik, mog_field_render, stamp_pixel_data
from celeste_tpu.likelihood import stamp_loglik
from celeste_tpu.model.params import GalaxyParams, StarParams


@pytest.fixture(scope="module")
def star_scene():
    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    return make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)


@pytest.fixture(scope="module")
def gal_scene():
    src = galaxy_source(u=(30.0, 10.0), flux_r=60.0)
    return make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=5)


def _star_vecs(scene, n=9):
    src = scene.sources[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])])
    rng = np.random.default_rng(0)
    vecs = base[None, :] + 0.05 * rng.normal(size=(n, base.size))
    return jnp.asarray(vecs, jnp.float32)


def _gal_vecs(scene, n=5):
    src = scene.sources[0]
    du = scene.wcs.equa2duas(src["u"])
    from celeste_tpu.model.params import logit
    base = np.concatenate([
        du, np.log(src["flux"]),
        [np.log(src["theta_dev"] / (1 - src["theta_dev"])), np.log(src["sigma"]),
         np.log(src["ab"] / (1 - src["ab"])), src["phi"]],
    ])
    rng = np.random.default_rng(1)
    vecs = base[None, :] + 0.03 * rng.normal(size=(n, base.size))
    return jnp.asarray(vecs, jnp.float32)


def _dense_loglik(vecs, stamp, kind, n_bands=5, band=2):
    def one(vec):
        if kind == "star":
            p = StarParams.from_vector(vec, n_bands)
        else:
            p = GalaxyParams.from_vector(vec, n_bands)
        return stamp_loglik([p], stamp, band=band)
    return jax.vmap(one)(vecs)


def test_star_kernel_parity(star_scene):
    stamp = star_scene.stamps[0]
    vecs = _star_vecs(star_scene)
    want = _dense_loglik(vecs, stamp, "star")
    got = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=0.5)


def test_star_jnp_impl_parity(star_scene):
    stamp = star_scene.stamps[0]
    vecs = _star_vecs(star_scene)
    want = _dense_loglik(vecs, stamp, "star")
    got = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=0.5)


def test_galaxy_kernel_parity(gal_scene):
    stamp = gal_scene.stamps[0]
    vecs = _gal_vecs(gal_scene)
    want = _dense_loglik(vecs, stamp, "galaxy")
    got = batched_stamp_loglik(vecs, stamp, band=2, kind="galaxy", impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=1.0)


def test_kernel_grad_parity(star_scene):
    """custom-vjp backward == autodiff of the dense path."""
    stamp = star_scene.stamps[0]
    vecs = _star_vecs(star_scene, n=4)

    f_pallas = lambda v: jnp.sum(batched_stamp_loglik(v, stamp, band=2, kind="star"))
    f_dense = lambda v: jnp.sum(_dense_loglik(v, stamp, "star"))
    g_pallas = jax.grad(f_pallas)(vecs)
    g_dense = jax.grad(f_dense)(vecs)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense),
                               rtol=5e-4, atol=5e-2)


def test_render_kernel(star_scene):
    """Render variant reproduces expected_image."""
    from celeste_tpu.kernels.mog_field import _field_planes
    from celeste_tpu.model import expected_image
    stamp = star_scene.stamps[0]
    vecs = _star_vecs(star_scene, n=2)
    planes = jax.vmap(lambda v: _field_planes(v, stamp, 2, "star", 5))(vecs)
    pd = stamp_pixel_data(stamp)
    lam = mog_field_render(*planes, pd)
    h, w = stamp.counts.shape
    p0 = StarParams.from_vector(vecs[0], 5)
    want = expected_image([p0], stamp, band=2)
    got = np.asarray(lam[0, : h * w]).reshape(h, w)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-3)


def test_batch_padding(star_scene):
    """B not a multiple of the tile size works (internal padding)."""
    stamp = star_scene.stamps[0]
    vecs = _star_vecs(star_scene, n=3)
    got = batched_stamp_loglik(vecs, stamp, band=2, kind="star")
    want = _dense_loglik(vecs, stamp, "star")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=0.5)
