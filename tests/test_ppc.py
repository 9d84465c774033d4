"""Posterior-predictive checks (celeste_tpu.ppc — the quantitative form of
the reference's eyeball/photoObj validation workflow, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
from celeste_tpu.inference import mh_init, mh_kernel, run_chains_ensemble
from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity
from celeste_tpu.ppc import (
    catalog_vs_truth,
    ppc_chi2_pvalue,
    ppc_lambda_draws,
    ppc_pixel_zscores,
)


@pytest.fixture(scope="module")
def fitted_scene():
    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 2.0 / 3600 / cosd, 10.0), flux_r=40.0),
        star_source(u=(30.0 + 2.0 / 3600 / cosd, 10.0 + 1.0 / 3600), flux_r=28.0),
    ]
    sd = make_synthetic_stamp(srcs, shape=(25, 25), bands=(2,), seed=5)
    scene = CrowdedScene(kinds=("star", "star"), n_bands=1)
    logd = make_crowded_logdensity(scene, [sd.stamps[0]], bands=[0])
    vec = np.concatenate([
        np.concatenate([sd.wcs.equa2duas(s["u"]), [np.log(s["flux"][2])]])
        for s in srcs]).astype(np.float32)
    kern = mh_kernel(logd, step_scales=jnp.full(6, 0.01))
    x0 = jnp.asarray(vec)[None] + 0.01 * jax.random.normal(jax.random.key(0), (16, 6))
    init = jax.vmap(lambda x: mh_init(x, logd))(x0)
    samples, _, _ = run_chains_ensemble(jax.random.key(1), kern, init, n_steps=400)
    return scene, sd, np.asarray(samples[:, 100:])


def test_ppc_calibrated_model_passes(fitted_scene):
    scene, sd, samples = fitted_scene
    stamp = sd.stamps[0]
    lam = ppc_lambda_draws(scene, samples, stamp, band=0, n_draws=24)
    assert lam.shape == (24, 25, 25) and np.isfinite(lam).all()
    p, d_obs, d_rep = ppc_chi2_pvalue(lam, stamp.counts, mask=stamp.mask)
    assert 0.02 < p < 0.98, (p, d_obs.mean(), d_rep.mean())
    z = ppc_pixel_zscores(lam, stamp.counts)
    # a calibrated model's pixel z-scores are ~N(0,1): no gross outliers
    assert np.abs(z).max() < 6.0
    assert abs(z.mean()) < 0.3


def test_ppc_flags_missing_source(fitted_scene):
    """Rendering draws with one source deleted must fail the predictive
    check decisively (p -> 0) and light up its pixels in the z-map."""
    scene, sd, samples = fitted_scene
    stamp = sd.stamps[0]
    wrong = samples.copy()
    wrong[..., 5] = -8.0                    # second source's log-flux -> ~0
    lam = ppc_lambda_draws(scene, wrong, stamp, band=0, n_draws=24)
    p, _, _ = ppc_chi2_pvalue(lam, stamp.counts, mask=stamp.mask)
    assert p < 0.02, p
    z = ppc_pixel_zscores(lam, stamp.counts)
    assert np.abs(z).max() > 8.0            # the deleted star screams


def test_catalog_vs_truth_pulls(fitted_scene):
    scene, sd, samples = fitted_scene
    flat = samples.reshape(-1, 6)

    class _Entry:
        def __init__(self, block):
            self.kind = "star"
            self.du_mean = block[:, :2].mean(0)
            self.du_std = block[:, :2].std(0)
            self.flux_mean = np.exp(block[:, 2:3]).mean(0)
            self.flux_std = np.exp(block[:, 2:3]).std(0)

    catalog = [_Entry(flat[:, :3]), _Entry(flat[:, 3:])]
    rows = catalog_vs_truth(catalog, sd.sources, sd.wcs, bands=[2])
    assert len(rows) == 2
    assert sorted(r["match"] for r in rows) == [0, 1]
    for r in rows:
        assert np.all(np.abs(r["du_pull"]) < 5.0), r
        assert np.all(np.abs(r["flux_pull"]) < 5.0), r
