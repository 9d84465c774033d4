"""Carlin-Chib type-switch sampler (inference/type_switch.py): the
within-MCMC star<->galaxy indicator must call clear-cut sources correctly
and agree with the Laplace-evidence classifier it complements.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import (
    galaxy_source, make_synthetic_stamp, star_source,
)
from celeste_tpu.inference.model_select import classify_source
from celeste_tpu.inference.type_switch import sample_source_type
from celeste_tpu.model.params import GalaxyParams, StarParams


def _x0s(scene, src, n_bands=1):
    """Init vectors for both models from the detection-style info."""
    du = jnp.asarray(scene.wcs.equa2duas(src["u"]), jnp.float32)
    logf = jnp.log(jnp.asarray([src["flux"][2]], jnp.float32))
    x0_star = jnp.concatenate([du, logf])
    # galaxy defaults: theta_dev=0.5, sigma=1 arcsec, ab=0.7, phi=0
    shape0 = jnp.asarray([0.0, 0.0, np.log(0.7 / 0.3), 0.0], jnp.float32)
    x0_gal = jnp.concatenate([du, logf, shape0])
    return x0_star, x0_gal


@pytest.mark.parametrize("kind", ["star", "galaxy"])
@pytest.mark.slow
def test_type_switch_clear_cut(kind):
    if kind == "star":
        src = star_source(u=(30.0002, 10.0001), flux_r=40.0)
    else:
        src = galaxy_source(u=(30.0002, 10.0001), flux_r=80.0, sigma=1.6,
                            ab=0.55)
    scene = make_synthetic_stamp([src], shape=(21, 21), bands=(2,), seed=9)
    st = scene.stamps[0]
    x0_star, x0_gal = _x0s(scene, src)
    out = sample_source_type(jax.random.key(0), [st], bands=[0],
                             x0_star=x0_star, x0_gal=x0_gal, n_bands=1,
                             n_chains=3, n_steps=240)
    p = float(out["p_star"])
    if kind == "star":
        assert p > 0.9, p
    else:
        assert p < 0.1, p


def test_type_switch_agrees_with_laplace():
    """On a moderately-bright galaxy both routes should land on the same
    side with comparable confidence (they estimate the same posterior)."""
    src = galaxy_source(u=(30.0001, 10.0001), flux_r=60.0, sigma=1.2, ab=0.7)
    scene = make_synthetic_stamp([src], shape=(21, 21), bands=(2,), seed=21)
    st = scene.stamps[0]
    x0_star, x0_gal = _x0s(scene, src)
    out = sample_source_type(jax.random.key(1), [st], bands=[0],
                             x0_star=x0_star, x0_gal=x0_gal, n_bands=1,
                             n_chains=3, n_steps=240)
    cls = classify_source([st], bands=[0], x0_star=x0_star,
                          x0_galaxy=x0_gal, n_bands=1)
    p_mcmc = float(out["p_star"])
    p_laplace = float(cls["p_star"])
    assert (p_mcmc < 0.5) == (p_laplace < 0.5), (p_mcmc, p_laplace)
    assert abs(p_mcmc - p_laplace) < 0.25, (p_mcmc, p_laplace)


@pytest.mark.slow
def test_type_switch_state_is_vmappable():
    """The kernel is a fixed-shape pure function: a vmapped 3-chain run
    compiles and produces finite traces and a sane switch rate."""
    src = star_source(u=(30.0001, 10.0), flux_r=30.0)
    scene = make_synthetic_stamp([src], shape=(19, 19), bands=(2,), seed=4)
    st = scene.stamps[0]
    x0_star, x0_gal = _x0s(scene, src)
    out = sample_source_type(jax.random.key(2), [st], bands=[0],
                             x0_star=x0_star, x0_gal=x0_gal, n_bands=1,
                             n_chains=3, n_steps=100)
    assert np.isfinite(np.asarray(out["x_star_samples"])).all()
    assert out["a_trace"].shape == (3, 100)
    assert 0.0 <= float(out["switch_rate"]) <= 1.0
