"""Star/galaxy classification via Laplace evidence (SURVEY.md C11
type-switch equivalent) + viz smoke tests (C17)."""

import numpy as np
import pytest

import jax.numpy as jnp

from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
from celeste_tpu.inference.model_select import classify_source, laplace_evidence
from celeste_tpu.model.priors import FluxPrior, SourcePriors


def _inits(scene, src, n_bands=1):
    du = scene.wcs.equa2duas(src["u"])
    lf = [np.log(src["flux"][2])]
    x0_star = np.concatenate([du, lf]).astype(np.float32)
    x0_gal = np.concatenate([du, lf, [0.0, np.log(1.0), 0.0, 0.5]]).astype(np.float32)
    return jnp.asarray(x0_star), jnp.asarray(x0_gal)


PRIORS = SourcePriors(flux=FluxPrior(log_ref_mean=3.4, log_ref_std=2.0))


def test_laplace_evidence_gaussian_exact():
    """For an exact Gaussian the Laplace evidence is exact: a N(0, s^2)
    'posterior' with density weight 1 has evidence = its normalizer."""
    s = 0.7
    logd = lambda x: -0.5 * jnp.sum(x * x) / s**2
    lz = float(laplace_evidence(logd, jnp.zeros(2)))
    want = 2 * np.log(np.sqrt(2 * np.pi) * s)
    assert abs(lz - want) < 1e-4


@pytest.mark.slow
def test_star_classified_as_star():
    src = star_source(u=(30.0, 10.0), flux_r=40.0)
    scene = make_synthetic_stamp([src], shape=(23, 23), bands=(2,), seed=41)
    xs, xg = _inits(scene, src)
    out = classify_source([scene.stamps[0]], bands=[0], x0_star=xs, x0_galaxy=xg,
                          priors=PRIORS, n_bands=1)
    assert float(out["p_star"]) > 0.9, float(out["p_star"])


def test_galaxy_classified_as_galaxy():
    src = galaxy_source(u=(30.0, 10.0), flux_r=80.0, sigma=2.0, ab=0.5)
    scene = make_synthetic_stamp([src], shape=(27, 27), bands=(2,), seed=42)
    xs, xg = _inits(scene, src)
    out = classify_source([scene.stamps[0]], bands=[0], x0_star=xs, x0_galaxy=xg,
                          priors=PRIORS, n_bands=1)
    assert float(out["p_star"]) < 0.1, float(out["p_star"])


def test_viz_smoke(tmp_path):
    from celeste_tpu.model import expected_image
    from celeste_tpu.model.params import StarParams
    from celeste_tpu.viz import plot_marginals, plot_model_vs_data, plot_photo_z, plot_traces

    src = star_source(u=(30.0, 10.0), flux_r=40.0)
    scene = make_synthetic_stamp([src], shape=(21, 21), bands=(2,), seed=43)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    p = StarParams(u=jnp.asarray(du, jnp.float32), flux=jnp.asarray(src["flux"], jnp.float32))
    lam = expected_image([p], stamp, band=2)
    plot_model_vs_data(stamp, lam, path=str(tmp_path / "mvd.png"))
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4, 100, 3))
    plot_traces(s, path=str(tmp_path / "tr.png"))
    plot_marginals(s, truth=[0, 0, 0], path=str(tmp_path / "mg.png"))
    plot_photo_z(rng.uniform(0, 6, 500), z_true=2.5, path=str(tmp_path / "pz.png"))
    import os
    for f in ("mvd.png", "tr.png", "mg.png", "pz.png"):
        assert os.path.getsize(tmp_path / f) > 5000
