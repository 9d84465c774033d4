"""Saturated-model (deviance) centering of the Poisson log-likelihood
(``celeste_tpu.likelihood._pixel``): per-pixel subtraction of the
parameter-independent constant ``x log x - x`` BEFORE the pixel sum.

Contract: identical posterior (log-density differences), identical
gradients, ~1000x smaller summed magnitude — which is what keeps fp32
Hamiltonian energy errors resolvable on multi-band fields (the 3-band
config-5 log-posterior is ~1.65e7 uncentered, where fp32 resolves only
~2 nats and HMC acceptance is rounding noise; measured 2026-08-17).
"""

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import (
    galaxy_source, make_synthetic_stamp, star_source,
)
from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity
from celeste_tpu.parallel.crowded import make_tiled_crowded_logdensity


def _small_scene():
    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 2.0 / 3600 / cosd, 10.0), flux_r=25.0),
        galaxy_source(u=(30.0 + 2.0 / 3600 / cosd, 10.0), flux_r=50.0,
                      sigma=1.0, ab=0.7),
    ]
    sd = make_synthetic_stamp(srcs, shape=(24, 24), bands=(2,), seed=5)
    cs = CrowdedScene(kinds=("star", "galaxy"), n_bands=1)
    parts = []
    for s, kind in zip(srcs, cs.kinds):
        du = sd.wcs.equa2duas(s["u"])
        if kind == "star":
            parts.append(np.concatenate([du, [np.log(s["flux"][2])]]))
        else:
            th, ab = s["theta_dev"], s["ab"]
            parts.append(np.concatenate(
                [du, [np.log(s["flux"][2]), np.log(th / (1 - th)),
                      np.log(s["sigma"]), np.log(ab / (1 - ab)), s["phi"]]]))
    vec = jnp.asarray(np.concatenate(parts), jnp.float32)
    return cs, sd, vec


def test_centering_is_a_constant_shift_with_identical_gradients():
    cs, sd, vec = _small_scene()
    stamp = sd.stamps[0]
    ld_u = make_crowded_logdensity(cs, [stamp], bands=[0], centered=False)
    ld_c = make_crowded_logdensity(cs, [stamp], bands=[0], centered=True)

    probes = vec[None, :] + 0.02 * jax.random.normal(jax.random.key(0),
                                                     (6, vec.shape[0]))
    shifts = np.asarray(jax.vmap(ld_c)(probes)) - np.asarray(
        jax.vmap(ld_u)(probes))
    # small 24x24 stamp keeps the uncentered magnitude ~2e5 so the fp32
    # resolution of the uncentered side (~0.03 nats) bounds this check
    assert np.max(np.abs(shifts - shifts[0])) < 0.1, shifts

    g_u = np.asarray(jax.grad(ld_u)(vec))
    g_c = np.asarray(jax.grad(ld_c)(vec))
    # centering terms carry no parameter dependence: VJPs are the same
    # program, bitwise
    np.testing.assert_array_equal(g_u, g_c)


def test_centered_magnitude_is_chi2_scale():
    cs, sd, vec = _small_scene()
    stamp = sd.stamps[0]
    ld_u = make_crowded_logdensity(cs, [stamp], bands=[0], centered=False)
    ld_c = make_crowded_logdensity(cs, [stamp], bands=[0], centered=True)
    lu, lc = float(ld_u(vec)), float(ld_c(vec))
    n_pix = int(np.asarray(stamp.counts).size)
    assert abs(lu) > 50 * abs(lc), (lu, lc)
    # near truth, -2*centered-ll ~ chi2 ~ n_pix (very loose bound)
    assert abs(lc) < 5 * n_pix, (lc, n_pix)


def test_tiled_centered_matches_dense_centered():
    cs, sd, vec = _small_scene()
    stamp = sd.stamps[0]
    pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in sd.sources])
    ld_dense = make_crowded_logdensity(cs, [stamp], bands=[0], centered=True)
    ld_tiled, _ = make_tiled_crowded_logdensity(
        cs, stamp, band=0, positions_px=pos_px, radii_px=10.0,
        impl="jnp", centered=True)
    probes = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1),
                                                     (4, vec.shape[0]))
    lt = np.asarray(jax.vmap(ld_tiled)(probes))
    ld = np.asarray(jax.vmap(ld_dense)(probes))
    assert np.max(np.abs(lt - ld)) < 0.5, (lt, ld)
