"""Separable isotropic kernel parity (values + grads) against the general
kernel and the dense model path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
from celeste_tpu.kernels import batched_stamp_loglik
from celeste_tpu.kernels.mog_field_sep import psf_is_isotropic


@pytest.fixture(scope="module")
def scene():
    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    return make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)


def _vecs(scene, n=9):
    src = scene.sources[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])])
    rng = np.random.default_rng(0)
    return jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)


def test_psf_isotropy_detected(scene):
    assert psf_is_isotropic(scene.stamps[0].psf)


def test_sep_dispatch_value_parity(scene):
    stamp = scene.stamps[0]
    vecs = _vecs(scene)
    got = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="pallas_sep")
    want = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=0.5)


def test_sep_general_agreement(scene):
    stamp = scene.stamps[0]
    vecs = _vecs(scene)
    sep = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="pallas_sep")
    gen = batched_stamp_loglik(vecs, stamp, band=2, kind="star", impl="pallas")
    np.testing.assert_allclose(np.asarray(sep), np.asarray(gen), rtol=2e-6, atol=0.5)


def test_sep_grad_parity(scene):
    stamp = scene.stamps[0]
    vecs = _vecs(scene, n=4)
    f_sep = lambda v: jnp.sum(batched_stamp_loglik(v, stamp, band=2, kind="star",
                                                   impl="pallas_sep"))
    f_jnp = lambda v: jnp.sum(batched_stamp_loglik(v, stamp, band=2, kind="star",
                                                   impl="jnp"))
    g_sep = jax.grad(f_sep)(vecs)
    g_jnp = jax.grad(f_jnp)(vecs)
    np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_jnp),
                               rtol=5e-4, atol=5e-2)


def test_sep_jit_under_scan(scene):
    """The dispatch must survive jit + scan (MCMC usage shape)."""
    stamp = scene.stamps[0]
    vecs = _vecs(scene, n=8)

    @jax.jit
    def run(vecs):
        def body(c, _):
            return c, batched_stamp_loglik(c, stamp, band=2, kind="star",
                                           impl="pallas_sep")
        _, lls = jax.lax.scan(body, vecs, None, length=3)
        return lls

    out = run(vecs)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))
