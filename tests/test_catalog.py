"""Catalog cross-match + accuracy metrics (celeste_tpu.catalog; SURVEY C17
— the reference's photoObj-comparison role).  Pure-host unit tests on
fabricated catalogs; the end-to-end report over a real pipeline run lives
in tests/test_pipeline.py::test_catalog_accuracy_report."""

import numpy as np

from celeste_tpu.catalog import (
    catalog_accuracy,
    match_catalogs,
    reference_from_sources,
)
from celeste_tpu.pipeline import CatalogEntry


def _entry(du, flux, kind="star", du_std=0.05, flux_std_frac=0.05):
    flux = np.atleast_1d(np.asarray(flux, np.float64))
    return CatalogEntry(
        kind=kind, p_star=1.0 if kind == "star" else 0.0,
        du_mean=np.asarray(du, np.float64),
        du_std=np.full(2, du_std),
        flux_mean=flux, flux_std=flux_std_frac * flux)


def _ref(du, flux, kind="star"):
    return {"du": np.asarray(du, np.float64),
            "flux": np.atleast_1d(np.asarray(flux, np.float64)),
            "kind": kind}


def test_exact_match_is_perfect():
    ref = [_ref((0, 0), 30.0), _ref((3, -2), 12.0, kind="galaxy")]
    cat = [_entry((3, -2), 12.0, kind="galaxy"), _entry((0, 0), 30.0)]
    rep = catalog_accuracy(cat, ref)
    assert rep["completeness"] == 1.0 and rep["purity"] == 1.0
    assert rep["n_matched"] == 2
    assert rep["kind_accuracy"] == 1.0
    assert rep["pos_rms_arcsec"] == 0.0
    assert rep["flux_rel_bias"] == 0.0 and rep["flux_rel_scatter"] == 0.0


def test_spurious_and_missed_accounting():
    ref = [_ref((0, 0), 30.0), _ref((5, 5), 20.0)]
    cat = [_entry((0.1, 0.0), 28.0), _entry((40, 40), 9.0)]  # second spurious
    rep = catalog_accuracy(cat, ref, max_sep_arcsec=1.0)
    assert rep["n_matched"] == 1
    assert rep["completeness"] == 0.5   # (5,5) missed
    assert rep["purity"] == 0.5         # (40,40) spurious
    assert rep["spurious"] == [1] and rep["missed"] == [1]


def test_greedy_match_prefers_closest_pair():
    # two catalog rows compete for one reference row: the closer one wins,
    # the other is left for the farther reference row
    ref = [_ref((0, 0), 30.0), _ref((2.0, 0), 20.0)]
    cat = [_entry((0.3, 0), 30.0), _entry((0.05, 0), 30.0)]
    pairs, un_c, un_r = match_catalogs(
        [e.du_mean for e in cat], [r["du"] for r in ref], max_sep_arcsec=2.0)
    by_cat = {i: j for i, j, _ in pairs}
    assert by_cat[1] == 0          # closest pair claimed first
    assert by_cat[0] == 1          # the other falls through to ref row 1
    assert un_c == [] and un_r == []


def test_z_scores_calibrated_on_synthetic_noise():
    # posterior means drawn at exactly the reported std around truth: the
    # z RMS must sit near 1 (the calibration property the metric reports)
    rng = np.random.default_rng(7)
    n = 200
    ref, cat = [], []
    for i in range(n):
        du = np.array([10.0 * (i % 20), 10.0 * (i // 20)])
        flux = np.array([25.0, 40.0])
        ref.append(_ref(du, flux))
        du_std, f_std = 0.05, 0.04 * flux
        cat.append(CatalogEntry(
            kind="star", p_star=1.0,
            du_mean=du + rng.normal(size=2) * du_std,
            du_std=np.full(2, du_std),
            flux_mean=flux + rng.normal(size=2) * f_std,
            flux_std=f_std))
    rep = catalog_accuracy(cat, ref, max_sep_arcsec=1.0)
    assert rep["completeness"] == 1.0
    assert 0.8 < rep["pos_z_rms"] < 1.25
    assert 0.8 < rep["flux_z_rms"] < 1.25
    assert abs(rep["flux_rel_bias"]) < 0.02


def test_zero_std_rows_excluded_from_z_stats():
    ref = [_ref((0, 0), 30.0)]
    cat = [_entry((0.02, 0), 31.0, du_std=0.0, flux_std_frac=0.0)]
    rep = catalog_accuracy(cat, ref)
    assert rep["n_matched"] == 1
    assert rep["pos_z_rms"] is None and rep["flux_z_rms"] is None
    assert rep["flux_rel_bias"] is not None  # relative stats still reported


def test_empty_catalogs_degrade_gracefully():
    rep = catalog_accuracy([], [_ref((0, 0), 30.0)])
    assert rep["n_matched"] == 0 and rep["completeness"] == 0.0
    assert rep["purity"] is None
    rep2 = catalog_accuracy([_entry((0, 0), 30.0)], [])
    assert rep2["completeness"] is None and rep2["purity"] == 0.0


def test_reference_from_sources_band_slots():
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source

    srcs = [star_source(u=(30.0001, 10.0001), flux_r=25.0)]
    scene = make_synthetic_stamp(srcs, shape=(15, 15), bands=(2,), seed=0)
    rows = reference_from_sources(srcs, scene.wcs, band_slots=[2])
    assert rows[0]["flux"].shape == (1,)
    assert np.isclose(rows[0]["flux"][0], 25.0)
    # offsets round-trip through the WCS the synthetic scene itself used
    assert np.allclose(rows[0]["du"],
                       scene.wcs.equa2duas(srcs[0]["u"]), atol=1e-9)
