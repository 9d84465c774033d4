"""End-to-end catalog pipeline (SURVEY.md C17): pixels in, Bayesian catalog
out — detection, MAP, classification, joint NUTS, physical summaries."""

import numpy as np
import pytest

import jax.numpy as jnp

from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
from celeste_tpu.model.priors import FluxPrior, SourcePriors
from celeste_tpu.pipeline import PipelineConfig, run_pipeline

PRIORS = SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0))


@pytest.fixture(scope="module")
def mixed_field():
    """Two stars + one galaxy, separated by several arcsec."""
    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=35.0),
        star_source(u=(30.0 + 3.0 / 3600 / cosd, 10.0 + 2.5 / 3600), flux_r=25.0),
        galaxy_source(u=(30.0, 10.0), flux_r=70.0, sigma=1.8, ab=0.6),
    ]
    scene = make_synthetic_stamp(srcs, shape=(33, 33), bands=(2,), seed=101)
    return scene, srcs


@pytest.fixture(scope="module")
def pipeline_result(mixed_field):
    scene, srcs = mixed_field
    cfg = PipelineConfig(max_sources=5, n_chains=8, n_warmup=150, n_steps=250,
                         map_steps=250, seed=3, detection_min_separation=7)
    return run_pipeline(scene.stamps[0], band=0, n_bands=1, cfg=cfg, priors=PRIORS)


@pytest.mark.slow
def test_detects_all_sources(pipeline_result, mixed_field):
    catalog, artifacts = pipeline_result
    assert artifacts["n_sources"] == 3


def test_classification(pipeline_result):
    catalog, _ = pipeline_result
    kinds = sorted(e.kind for e in catalog)
    assert kinds == ["galaxy", "star", "star"], [(e.kind, e.p_star) for e in catalog]


def test_catalog_accuracy_report(pipeline_result, mixed_field):
    """The photoObj-style validation loop (celeste_tpu.catalog; SURVEY C17)
    over a real pipeline run: perfect completeness/purity/classification on
    the 3-source field, honest astrometry + photometry, calibrated-ish
    posterior widths, and the comparison plot renders."""
    from celeste_tpu.catalog import catalog_accuracy, reference_from_sources
    from celeste_tpu.viz import plot_catalog_match

    scene, srcs = mixed_field
    catalog, _ = pipeline_result
    ref = reference_from_sources(srcs, scene.wcs, band_slots=[2])
    rep = catalog_accuracy(catalog, ref, max_sep_arcsec=1.0)
    assert rep["completeness"] == 1.0 and rep["purity"] == 1.0
    assert rep["kind_accuracy"] == 1.0
    assert rep["pos_rms_arcsec"] < 0.2, rep["pos_rms_arcsec"]
    assert abs(rep["flux_rel_bias"]) < 0.2, rep["flux_rel_bias"]
    # z RMS: a strict ~1 needs many matches; 3 sources bound it loosely.
    # The point is posterior widths are neither 10x overconfident nor
    # degenerate (0 would mean std excluded / missing).
    assert rep["pos_z_rms"] is not None and 0.05 < rep["pos_z_rms"] < 6.0
    assert rep["flux_z_rms"] is not None and 0.05 < rep["flux_z_rms"] < 6.0
    fig = plot_catalog_match(catalog, ref, rep)
    assert fig is not None


def test_fluxes_recovered(pipeline_result, mixed_field):
    scene, srcs = mixed_field
    catalog, _ = pipeline_result
    truth = sorted(s["flux"][2] for s in srcs)
    est = sorted(float(e.flux_mean[0]) for e in catalog)
    for t, e in zip(truth, est):
        assert abs(e - t) / t < 0.25, (truth, est)


def test_positions_recovered(pipeline_result, mixed_field):
    scene, srcs = mixed_field
    catalog, _ = pipeline_result
    truth = sorted(tuple(np.round(scene.wcs.equa2duas(s["u"]), 1)) for s in srcs)
    est = sorted(tuple(np.round(e.du_mean, 1)) for e in catalog)
    for t, e in zip(truth, est):
        assert np.hypot(t[0] - e[0], t[1] - e[1]) < 0.4, (truth, est)


def test_galaxy_shape_in_catalog(pipeline_result):
    catalog, _ = pipeline_result
    gal = [e for e in catalog if e.kind == "galaxy"][0]
    assert 0.5 < gal.extras["sigma_mean"] < 4.0
    assert 0.1 < gal.extras["ab_mean"] < 1.0


def test_empty_field():
    """No sources above threshold -> empty catalog, no crash."""
    scene = make_synthetic_stamp([star_source(flux_r=0.01)], shape=(21, 21),
                                 bands=(2,), seed=7)
    catalog, artifacts = run_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=PipelineConfig(detection_snr_min=8.0),
                                      priors=PRIORS)
    assert catalog == [] and artifacts["n_sources"] == 0


@pytest.mark.slow
def test_multiband_pipeline():
    """ugriz joint pipeline: one star observed in 5 bands; the catalog's
    flux vector must recover the per-band SED."""
    src = star_source(u=(30.0, 10.0), flux_r=35.0)
    scene = make_synthetic_stamp([src], shape=(21, 21), bands=(0, 1, 2, 3, 4),
                                 seed=222)
    cfg = PipelineConfig(max_sources=2, n_chains=6, n_warmup=120, n_steps=200,
                         map_steps=250, seed=5)
    catalog, artifacts = run_pipeline(scene.stamps, band=[0, 1, 2, 3, 4],
                                      n_bands=5, cfg=cfg, priors=PRIORS,
                                      detect_band_index=2)
    assert artifacts["n_sources"] == 1
    e = catalog[0]
    assert e.kind == "star"
    assert e.flux_mean.shape == (5,)
    for b in range(5):
        truth = src["flux"][b]
        assert abs(float(e.flux_mean[b]) - truth) / truth < 0.25, (b, e.flux_mean, src["flux"])


@pytest.mark.slow
def test_pipeline_compile_count_is_o1(mixed_field, caplog):
    """VERDICT r1 #5 gate: the classify stage compiles ONE batched sweep
    function (and detection ONE fit function) regardless of candidate count
    and sweep count — no per-candidate jit calls."""
    import logging

    import jax

    scene, _ = mixed_field
    cfg = PipelineConfig(max_sources=5, n_chains=4, n_warmup=40, n_steps=60,
                         map_steps=60, classify_sweeps=3, seed=3,
                         detection_min_separation=7)
    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING, logger="jax"):
            run_pipeline(scene.stamps[0], band=0, n_bands=1, cfg=cfg,
                         priors=PRIORS)
    finally:
        jax.config.update("jax_log_compiles", False)
    msgs = [r.getMessage() for r in caplog.records
            if "Finished XLA compilation" in r.getMessage()]
    n_sweep = sum("classify_sweep_batch" in m for m in msgs)
    n_det = sum("det_fit" in m for m in msgs)
    assert n_sweep == 1, f"classify compiled {n_sweep}x: {msgs}"
    assert n_det == 1, f"detection fit compiled {n_det}x"


def _events(logger_buf):
    import json

    return [json.loads(line) for line in logger_buf.getvalue().splitlines()]


@pytest.mark.slow
def test_type_switch_overrides_heuristic_in_ambiguous_band():
    """VERDICT r2 Next #4: a compact faint galaxy whose Laplace margin is
    ~+3 nats sits in the ambiguous band — the margin+extendedness heuristic
    calls it a STAR (margin < galaxy_margin_nats), while the Carlin-Chib
    sampler's exact posterior P(star) says GALAXY.  The pipeline must
    follow the sampler.  One run: the classify-sweep events record the
    heuristic decision, the type_switch event records the override."""
    import io

    from celeste_tpu.utils.metrics import MetricsLogger

    src = galaxy_source(u=(30.0, 10.0), flux_r=2.5, sigma=0.5, ab=0.8)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=21)
    buf = io.StringIO()
    cfg = PipelineConfig(max_sources=2, n_chains=8, n_warmup=30, n_steps=60,
                         map_steps=250, seed=3, sampler="nuts", max_depth=5,
                         type_switch=True, type_switch_steps=200,
                         detection_snr_min=4.0)
    catalog, _ = run_pipeline(scene.stamps[0], band=0, n_bands=1, cfg=cfg,
                              priors=PRIORS, logger=MetricsLogger(stream=buf))
    evs = _events(buf)
    sweeps = [e for e in evs if e["event"] == "classify_sweep"]
    ts = [e for e in evs if e["event"] == "type_switch"]
    # the heuristic (final sweep, before override) called it a star
    assert sweeps[-1]["kinds"] == ["star"], sweeps[-1]
    # the ambiguous band triggered the exact sampler, which says galaxy...
    assert len(ts) == 1, evs
    assert ts[0]["p_star"][0] < 0.5, ts[0]
    # ...and the catalog follows the sampler, not the heuristic
    assert len(catalog) == 1
    assert catalog[0].kind == "galaxy"
    assert catalog[0].p_star < 0.5


@pytest.mark.slow
def test_classification_insensitive_to_margin_threshold():
    """VERDICT r2 Weak #7: `galaxy_margin_nats` is a tuning constant, and
    with exact type switching wired in it must only move candidates
    between the cheap heuristic and the Carlin-Chib sampler — final
    catalog KINDS for a clear star + clear galaxy are identical across a
    10x threshold sweep, while a wider band routes at least as many
    candidates through the sampler."""
    import io

    from celeste_tpu.utils.metrics import MetricsLogger

    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600),
                    flux_r=35.0),
        galaxy_source(u=(30.0 + 2.0 / 3600 / cosd, 10.0 + 1.5 / 3600),
                      flux_r=70.0, sigma=1.8, ab=0.6),
    ]
    scene = make_synthetic_stamp(srcs, shape=(33, 33), bands=(2,), seed=7)
    kinds_by_margin, n_sampled = {}, {}
    for margin in (3.0, 10.0, 30.0):
        buf = io.StringIO()
        cfg = PipelineConfig(max_sources=3, n_chains=8, n_warmup=40,
                             n_steps=80, map_steps=200, seed=3,
                             type_switch=True, type_switch_steps=200,
                             galaxy_margin_nats=margin,
                             detection_min_separation=5)
        catalog, _ = run_pipeline(scene.stamps[0], band=0, n_bands=1,
                                  cfg=cfg, priors=PRIORS,
                                  logger=MetricsLogger(stream=buf))
        kinds_by_margin[margin] = sorted(c.kind for c in catalog)
        ts = [e for e in _events(buf) if e["event"] == "type_switch"]
        n_sampled[margin] = len(ts[0]["candidates"]) if ts else 0
    assert kinds_by_margin[3.0] == ["galaxy", "star"], kinds_by_margin
    assert (kinds_by_margin[3.0] == kinds_by_margin[10.0]
            == kinds_by_margin[30.0]), kinds_by_margin
    # a wider ambiguous band can only send MORE candidates to the sampler
    assert n_sampled[3.0] <= n_sampled[10.0] <= n_sampled[30.0], n_sampled


@pytest.mark.slow
def test_ppc_pipeline_stage_calibrated_vs_missing_source():
    """VERDICT r2 Next #5: cfg.ppc=True scores the observed stamp against
    posterior replicates through the PIPELINE entry point.  A calibrated
    scene (model captures all sources) passes; capping max_sources below
    the true count leaves a source unmodeled and the p-value collapses."""
    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.0 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=40.0),
        star_source(u=(30.0 + 3.0 / 3600 / cosd, 10.0 + 2.0 / 3600), flux_r=30.0),
    ]
    scene = make_synthetic_stamp(srcs, shape=(29, 29), bands=(2,), seed=31)
    base = dict(n_chains=8, n_warmup=30, n_steps=60, map_steps=200, seed=3,
                sampler="nuts", max_depth=5, classify=False, ppc=True,
                ppc_draws=16, detection_min_separation=5)
    cfg_ok = PipelineConfig(max_sources=3, **base)
    _, art_ok = run_pipeline(scene.stamps[0], band=0, n_bands=1, cfg=cfg_ok,
                             priors=PRIORS)
    assert art_ok["n_sources"] == 2
    p_ok = art_ok["ppc"][0]["pvalue"]
    assert 0.01 < p_ok < 0.99, art_ok["ppc"]

    cfg_miss = PipelineConfig(max_sources=1, **base)
    _, art_miss = run_pipeline(scene.stamps[0], band=0, n_bands=1,
                               cfg=cfg_miss, priors=PRIORS)
    assert art_miss["n_sources"] == 1
    p_miss = art_miss["ppc"][0]["pvalue"]
    assert p_miss < 0.01, art_miss["ppc"]
    # the unmodeled source shows up as an extreme pixel z-score
    assert art_miss["ppc"][0]["worst_pixel_z"] > art_ok["ppc"][0]["worst_pixel_z"]
