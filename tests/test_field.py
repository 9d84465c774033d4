"""Field-scale catalog pipeline (celeste_tpu/field.py; SURVEY.md C17/§3.2:
the reference ran frames as hand-cut per-stamp scripts — here the framework
does the cutting/grouping/scaling itself).

Suite-time note: the group sampler compiles one vmapped double-ChEES
program per (G, S_max, gcut) shape; configs here are sized so the whole
module stays within a few minutes cold and seconds warm (persistent cache).
"""

import numpy as np
import pytest

from celeste_tpu.data.synthetic import (galaxy_source, make_synthetic_stamp,
                                        star_source)
from celeste_tpu.field import FieldConfig, run_field_pipeline, union_groups
from celeste_tpu.model.priors import FluxPrior, SourcePriors

PRIORS = SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0))
ASU = 1.0 / 3600.0
COSD = np.cos(np.deg2rad(10.0))


def _mixed_frame():
    """96x96 frame: 3 isolated stars + a star/galaxy blend 2.4'' apart."""
    srcs = [
        star_source(u=(30.0 - 14 * ASU / COSD, 10.0 - 13 * ASU), flux_r=60.0),
        star_source(u=(30.0 + 15 * ASU / COSD, 10.0 - 11 * ASU), flux_r=30.0),
        star_source(u=(30.0 - 12 * ASU / COSD, 10.0 + 14 * ASU), flux_r=45.0),
        star_source(u=(30.0 + 10 * ASU / COSD, 10.0 + 12 * ASU), flux_r=40.0),
        galaxy_source(u=(30.0 + 10 * ASU / COSD, 10.0 + (12 + 2.4) * ASU),
                      flux_r=80.0, sigma=1.6, ab=0.7),
    ]
    scene = make_synthetic_stamp(srcs, shape=(96, 96), bands=(2,), seed=11)
    return scene, srcs


def test_union_groups():
    pos = np.array([[0.0, 0.0], [5.0, 0.0], [40.0, 40.0], [40.0, 44.0],
                    [9.0, 0.0]])
    labels = union_groups(pos, link_radius_px=6.0)
    # 0-1-4 chain through transitivity; 2-3 together
    assert labels.tolist() == [0, 0, 1, 1, 0]
    assert union_groups(pos, link_radius_px=1.0).tolist() == [0, 1, 2, 3, 4]


def _brute_labels(pos, r):
    """All-pairs reference partition, canonical first-member labeling."""
    n = pos.shape[0]
    d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    adj = d2 <= r * r
    labels = -np.ones(n, np.int32)
    nxt = 0
    for i in range(n):
        if labels[i] >= 0:
            continue
        stack, labels[i] = [i], nxt
        while stack:
            j = stack.pop()
            for m in np.nonzero(adj[j] & (labels < 0))[0]:
                labels[m] = nxt
                stack.append(int(m))
        nxt += 1
    return labels


def test_union_groups_grid_hash_matches_brute_force():
    """The grid-hash rewrite (VERDICT r3 Weak #7) must give the identical
    partition AND labeling as the all-pairs graph on a dense 2k-candidate
    synthetic frame, across radii spanning isolated -> one giant blob."""
    rng = np.random.default_rng(7)
    # clustered + uniform mix, with exact duplicates (coincident detections)
    centers = rng.uniform(0, 2048, size=(40, 2))
    pos = np.concatenate([
        centers[rng.integers(0, 40, 1500)] + rng.normal(0, 6.0, (1500, 2)),
        rng.uniform(0, 2048, size=(490, 2)),
        np.repeat(rng.uniform(0, 2048, size=(5, 2)), 2, axis=0),
    ])
    assert pos.shape[0] == 2000
    for r in (0.0, 3.0, 9.0, 40.0):
        got = union_groups(pos, link_radius_px=r)
        np.testing.assert_array_equal(got, _brute_labels(pos, r), err_msg=f"r={r}")


def test_segckpt_rejects_foreign_and_reconfigured_files(tmp_path):
    """The checkpoint gate must treat as foreign: files missing the
    fingerprint/phase (written by a different producer sharing the path),
    legacy scalar fingerprints, and same-shape runs whose stream-affecting
    knobs differ (ADVICE r3: a max_leapfrog change used to resume
    silently into a mixed-config run)."""
    from celeste_tpu.field import _SegCkpt
    from celeste_tpu.utils.checkpoint import save_checkpoint

    fp = {"x0_sum": 1.5, "n_steps": 20, "priors": "SourcePriors(...)"}
    p = str(tmp_path / "ck.npz")
    carry = {"a": np.zeros(3, np.float32)}
    ck = _SegCkpt(p, fp)
    ck.save("probe", carry, 4)
    ck2 = _SegCkpt(p, dict(fp))              # same run resumes
    assert ck2.at("probe") and ck2.off == 4
    with pytest.raises(ValueError, match="different run"):
        _SegCkpt(p, dict(fp, n_steps=30))    # knob changed
    with pytest.raises(ValueError, match="different run"):
        _SegCkpt(p, dict(fp, extra_knob=1))  # key sets differ
    save_checkpoint(p, carry, step=0, extra={})   # foreign producer
    with pytest.raises(ValueError, match="different run"):
        _SegCkpt(p, fp)
    save_checkpoint(p, carry, step=0,
                    extra={"fp": 1.5, "phase": "probe"})  # legacy scalar fp
    with pytest.raises(ValueError, match="different run"):
        _SegCkpt(p, fp)


def test_field_config_rejects_zero_segment():
    """sample_segment=0 used to slip past the `or None` coercion and die
    deep inside on a zero range step (ADVICE r3)."""
    scene, _ = _two_group_frame()
    for bad in (dict(sample_segment=0), dict(sample_segment=-3),
                dict(sample_segment=8, warmup_window=0)):
        with pytest.raises(ValueError, match="must be >= 1"):
            run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                               cfg=_small_cfg(**bad), priors=PRIORS)


@pytest.fixture(scope="module")
def map_only_result():
    scene, srcs = _mixed_frame()
    # map_steps=200 (default): at 150 the galaxy's conditional MAP
    # under-converges, its fitted sigma inflates, and the merge rule
    # swallows the blended star (measured on this exact scene)
    cfg = FieldConfig(sample=False, seed=2)
    catalog, art = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=cfg, priors=PRIORS)
    return scene, srcs, catalog, art


def test_field_detects_and_classifies(map_only_result):
    scene, srcs, catalog, art = map_only_result
    assert art["n_sources"] == 5
    kinds = sorted(e.kind for e in catalog)
    assert kinds == ["galaxy", "star", "star", "star", "star"], [
        (e.kind, e.p_star) for e in catalog]
    # CLEAN-ripple duplicates must not survive: every catalog entry matches
    # a distinct truth source within 0.5''
    truth = np.array([scene.wcs.equa2duas(s["u"]) for s in srcs])
    est = np.array([e.du_mean for e in catalog])
    d = np.hypot(truth[:, None, 0] - est[None, :, 0],
                 truth[:, None, 1] - est[None, :, 1])
    match = np.argmin(d, axis=1)
    assert len(set(match.tolist())) == 5
    assert float(d[np.arange(5), match].max()) < 0.5


def test_field_groups_blend_jointly(map_only_result):
    _, _, catalog, art = map_only_result
    # the blended pair shares a fit group; the isolated stars don't
    assert art["n_groups"] == 4 and art["s_max"] == 2
    groups = [e.extras["group"] for e in catalog]
    pair = [g for g in set(groups) if groups.count(g) == 2]
    assert len(pair) == 1
    pair_kinds = sorted(e.kind for e in catalog
                        if e.extras["group"] == pair[0])
    assert pair_kinds == ["galaxy", "star"]


def _two_group_frame():
    """64x64: a blended star pair (3'') + one isolated star -> 2 fit
    groups under default linking, 1 group when link_radius is huge."""
    srcs = [
        star_source(u=(30.0 - 8 * ASU / COSD, 10.0 - 8 * ASU), flux_r=55.0),
        star_source(u=(30.0 + 7 * ASU / COSD, 10.0 + 7 * ASU), flux_r=45.0),
        star_source(u=(30.0 + (7 + 3.0) * ASU / COSD, 10.0 + 7 * ASU),
                    flux_r=35.0),
    ]
    scene = make_synthetic_stamp(srcs, shape=(64, 64), bands=(2,), seed=23)
    return scene, srcs


def _small_cfg(**over):
    # n_steps sized for the recovery gates' MC error, not for ESS
    # (VERDICT r4 Next #3: the module cost 550 s warm / ~14 min cold at
    # n_steps=160; 96 steps x 12 chains leaves the 0.4''/15% bounds >5
    # sigma of slack on this scene, measured 2026-08-21)
    # probe sizes 32/16 = the survey-scale config's, which delivers
    # z-RMS 1.04 calibration at 53 groups (bench/field_scale.py) — ample
    # for pooling a whitening metric on these 2-3 source frames
    base = dict(sample=True, seed=4, n_chains=12, probe_warmup=32,
                probe_steps=16, n_warmup=48, n_steps=96, max_leapfrog=24,
                map_steps=150, type_switch=False, group_cut=32,
                group_margin_px=8)
    base.update(over)
    return FieldConfig(**base)


@pytest.fixture(scope="module")
def factorization_pair():
    scene, srcs = _two_group_frame()
    cat_f, art_f = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=_small_cfg(), priors=PRIORS)
    # link radius spanning the frame -> ONE group = the exact full joint
    cat_j, art_j = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=_small_cfg(link_radius_px=1e9),
                                      priors=PRIORS)
    return scene, srcs, (cat_f, art_f), (cat_j, art_j)


@pytest.mark.slow
def test_field_posterior_recovery(factorization_pair):
    scene, srcs, (cat_f, art_f), _ = factorization_pair
    assert art_f["n_groups"] == 2 and len(cat_f) == 3
    truth = sorted((tuple(np.round(scene.wcs.equa2duas(s["u"]), 1)),
                    s["flux"][2]) for s in srcs)
    est = sorted((tuple(np.round(e.du_mean, 1)), float(e.flux_mean[0]))
                 for e in cat_f)
    for (tu, tf), (eu, ef) in zip(truth, est):
        assert np.hypot(tu[0] - eu[0], tu[1] - eu[1]) < 0.4, (truth, est)
        assert abs(ef - tf) / tf < 0.15, (truth, est)
    for d in art_f["diagnostics"]:
        assert d["rhat_max"] < 1.1 and d["divergence_rate"] < 0.05, d


def test_group_factorization_matches_full_joint(factorization_pair):
    """The module's documented approximation: with disjoint pixel ownership
    and neighbor-MAP effective skies, the group-factorized posterior must
    match the full-field joint posterior within MC error."""
    _, _, (cat_f, _), (cat_j, art_j) = factorization_pair
    assert art_j["n_groups"] == 1
    f = sorted(cat_f, key=lambda e: float(e.du_mean[0]))
    j = sorted(cat_j, key=lambda e: float(e.du_mean[0]))
    assert len(f) == len(j) == 3
    for ef, ej in zip(f, j):
        sf, sj = float(ef.flux_std[0]), float(ej.flux_std[0])
        mf, mj = float(ef.flux_mean[0]), float(ej.flux_mean[0])
        # means within 4 posterior sds pooled-MC-error-ish; stds within 35%
        assert abs(mf - mj) < 4.0 * max(sf, sj), (mf, mj, sf, sj)
        assert 0.65 < sf / sj < 1.55, (sf, sj)
        du_f, du_j = np.asarray(ef.du_mean), np.asarray(ej.du_mean)
        tol = 4.0 * float(np.maximum(ef.du_std, ej.du_std).max())
        assert np.hypot(*(du_f - du_j)) < max(tol, 0.02), (du_f, du_j, tol)


def test_field_on_ingested_frame(tmp_path):
    """Production-path glue: real FITS bytes -> frame_to_stamp ingest ->
    field pipeline MAP scan.  A Poisson-noised SDSS-like frame (calibrated
    nmgy image + calib row + gridded sky, the data model of
    data/ingest/sdss.frame_to_stamp) with 4 known stars must come back as
    a 4-star catalog with sub-0.5'' positions and ~10% fluxes."""
    from celeste_tpu.data.ingest.fits_lite import (write_fits,
                                                   write_fits_image,
                                                   write_fits_table)
    from celeste_tpu.data.ingest.sdss import frame_to_stamp
    from celeste_tpu.mog import MoG2D

    rng = np.random.default_rng(3)
    h, w, gain = 120, 160, 4.6
    var_px = 2.2                      # injected single-Gaussian PSF (px^2)
    stars = [(40.0, 30.0, 30000.0), (100.0, 40.0, 18000.0),
             (50.0, 90.0, 45000.0), (90.0, 80.0, 24000.0)]  # (px, py, nelec)
    yy, xx = np.mgrid[0:h, 0:w]
    sky_nelec = 150.0 + 20.0 * np.linspace(0, 1, h)[:, None] * np.ones((1, w))
    nelec = sky_nelec.copy()
    for px, py, f in stars:
        nelec += f / (2 * np.pi * var_px) * np.exp(
            -0.5 * ((xx - px) ** 2 + (yy - py) ** 2) / var_px)
    nelec_obs = rng.poisson(nelec).astype(np.float64)

    calib = np.full(w, 0.005, np.float64) * (
        1 + 0.01 * np.linspace(0, 1, w))
    dn, sky_dn = nelec_obs / gain, sky_nelec / gain
    img = (dn - sky_dn) * calib[None, :]
    gy, gx = 6, 8
    ys_g, xs_g = np.linspace(0, h - 1, gy), np.linspace(0, w - 1, gx)
    allsky = sky_dn[np.ix_(ys_g.astype(int), xs_g.astype(int))]
    xinterp = np.interp(np.arange(w), xs_g, np.arange(gx))
    yinterp = np.interp(np.arange(h), ys_g, np.arange(gy))
    wcs_cards = {"CRVAL1": 30.0, "CRVAL2": 10.0,
                 "CRPIX1": w / 2 + 0.5, "CRPIX2": h / 2 + 0.5,
                 "CD1_1": 0.396 / 3600, "CD1_2": 0.0,
                 "CD2_1": 0.0, "CD2_2": 0.396 / 3600}
    path = str(tmp_path / "frame-r-000002-1-0001.fits")
    write_fits(path, [
        write_fits_image(img.astype(np.float32), extra_cards=wcs_cards),
        write_fits_image(calib.astype(np.float32), primary=False),
        write_fits_table({"ALLSKY": allsky.astype(np.float64)}),
        write_fits_table({"XINTERP": xinterp[None, :].astype(np.float64),
                          "YINTERP": yinterp[None, :].astype(np.float64)}),
    ])

    # the injected PSF, in the pixel-space MoG form the renderer consumes
    psf = MoG2D(w=np.array([1.0], np.float32),
                mu=np.zeros((1, 2), np.float32),
                cov=(var_px * np.eye(2, dtype=np.float32))[None])
    stamp, meta = frame_to_stamp(path, (30.0, 10.0), size=120, gain=gain,
                                 psf=psf)
    x0, y0 = meta["pixel_origin"]
    iota = float(np.asarray(stamp.iota))

    cfg = FieldConfig(sample=False, type_switch=False, seed=9)
    catalog, art = run_field_pipeline(stamp, band=0, n_bands=1, cfg=cfg,
                                      priors=PRIORS)
    assert art["n_sources"] == 4, [(e.kind, e.du_mean) for e in catalog]
    assert all(e.kind == "star" for e in catalog)

    # truth in the stamp's frame: pixel -> arcsec offsets via the stamp WCS
    a = np.asarray(stamp.wcs_A, np.float64)
    p0 = np.asarray(stamp.wcs_p0, np.float64)
    a_inv = np.linalg.inv(a)
    truth_du = np.array([a_inv @ (np.array([px - x0, py - y0]) - p0)
                         for px, py, _ in stars])
    truth_flux = np.array([f for _, _, f in stars]) / iota
    est_du = np.array([e.du_mean for e in catalog])
    d = np.hypot(truth_du[:, None, 0] - est_du[None, :, 0],
                 truth_du[:, None, 1] - est_du[None, :, 1])
    match = np.argmin(d, axis=1)
    assert len(set(match.tolist())) == 4
    assert float(d[np.arange(4), match].max()) < 0.5
    est_flux = np.array([float(catalog[m].flux_mean[0]) for m in match])
    np.testing.assert_allclose(est_flux, truth_flux, rtol=0.12)


@pytest.mark.slow
def test_field_sharded_groups():
    """Fit groups are data parallel: run the two-group frame with the group
    batch sharded over the 8-device mesh (padded 2 -> 8 with dead groups)
    and require the same catalog as the single-device path up to MC error.
    Bitwise parity is NOT expected: padding changes the batch shape, the
    partitioner compiles a different (equally valid) program, and chaotic
    HMC trajectories amplify any fp difference — the posterior is gated
    instead (same recovery bounds as test_field_posterior_recovery)."""
    from celeste_tpu.parallel.mesh import make_mesh

    scene, srcs = _two_group_frame()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    cat, art = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                  cfg=_small_cfg(), priors=PRIORS, mesh=mesh)
    assert art["n_groups"] == 2 and len(cat) == 3
    assert art["samples"].shape[0] == 2          # padding dropped
    truth = sorted((tuple(np.round(scene.wcs.equa2duas(s["u"]), 1)),
                    s["flux"][2]) for s in srcs)
    est = sorted((tuple(np.round(e.du_mean, 1)), float(e.flux_mean[0]))
                 for e in cat)
    for (tu, tf), (eu, ef) in zip(truth, est):
        assert np.hypot(tu[0] - eu[0], tu[1] - eu[1]) < 0.4, (truth, est)
        assert abs(ef - tf) / tf < 0.15, (truth, est)
    for d in art["diagnostics"]:
        assert d["rhat_max"] < 1.1 and d["divergence_rate"] < 0.05, d


@pytest.mark.slow
def test_field_multiband_joint():
    """Two-band frames through the field pipeline: the joint likelihood
    must recover per-band fluxes AND tighten the position posterior vs the
    single-band run (two bands of photons constrain u twice as hard —
    same physics as tests/test_e2e_multiband.py, here through the frame
    path)."""
    srcs = [
        star_source(u=(30.0 - 8 * ASU / COSD, 10.0 - 8 * ASU), flux_r=55.0),
        star_source(u=(30.0 + 8 * ASU / COSD, 10.0 + 8 * ASU), flux_r=45.0),
    ]
    scene = make_synthetic_stamp(srcs, shape=(64, 64), bands=(1, 2), seed=31)
    cfg = _small_cfg(type_switch=False)
    cat2, art2 = run_field_pipeline(scene.stamps, band=[0, 1], n_bands=2,
                                    cfg=cfg, priors=PRIORS)
    assert len(cat2) == 2 and all(e.kind == "star" for e in cat2)
    truth = sorted((tuple(np.round(scene.wcs.equa2duas(s["u"]), 1)),
                    s["flux"][1], s["flux"][2]) for s in srcs)
    est = sorted((tuple(np.round(e.du_mean, 1)), float(e.flux_mean[0]),
                  float(e.flux_mean[1])) for e in cat2)
    for (tu, tf1, tf2), (eu, ef1, ef2) in zip(truth, est):
        assert np.hypot(tu[0] - eu[0], tu[1] - eu[1]) < 0.4, (truth, est)
        assert abs(ef1 - tf1) / tf1 < 0.15, (truth, est)
        assert abs(ef2 - tf2) / tf2 < 0.15, (truth, est)
    for d in art2["diagnostics"]:
        assert d["rhat_max"] < 1.1 and d["divergence_rate"] < 0.05, d

    # single-band run on band 2 alone: du posterior must be LOOSER
    cat1, _ = run_field_pipeline(scene.stamps[1], band=0, n_bands=1,
                                 cfg=cfg, priors=PRIORS)
    assert len(cat1) == 2
    du_std2 = np.mean([np.mean(e.du_std) for e in cat2])
    du_std1 = np.mean([np.mean(e.du_std) for e in cat1])
    assert du_std2 < du_std1, (du_std2, du_std1)


@pytest.mark.slow
def test_field_segmented_sampling_matches_monolithic():
    """cfg.sample_segment turns the group-sampling stage into bounded
    device calls (axon kill-edge robustness at survey scale) with the
    SAME key/Halton streams as the monolithic jit: pre-split key slices
    reproduce the in-jit split(key, n) streams and start_iter offsets
    continue the jitter sequence (pinned bitwise at the kernel level by
    tests/test_chees.py::test_run_chees_presplit_keys_compose).  Whole-
    pipeline bitwise equality is NOT expected: each stage is its own XLA
    program and program-boundary fusion differs at the ulp level, which
    chaotic trajectories amplify through the dead-padding dims (measured:
    a group's real columns stay bitwise equal until whitening couples
    them to a padding dim).  The gate is therefore posterior-level and
    tight, plus identical diagnostics on the real columns.  Segment sizes
    deliberately do NOT divide the totals (remainder windows retrace at a
    new shape but must not change the streams)."""
    scene, _ = _two_group_frame()
    kw = dict(n_chains=8, probe_warmup=20, probe_steps=8, n_warmup=20,
              n_steps=20, map_steps=60)
    cat_m, art_m = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=_small_cfg(**kw), priors=PRIORS)
    cat_s, art_s = run_field_pipeline(
        scene.stamps[0], band=0, n_bands=1,
        cfg=_small_cfg(sample_segment=8, warmup_window=9, **kw),
        priors=PRIORS)
    assert art_m["samples"].shape == art_s["samples"].shape
    assert len(cat_m) == len(cat_s)
    for em, es in zip(cat_m, cat_s):
        assert em.kind == es.kind
        # same chains, same proposals, ulp-seeded divergence only: means
        # agree far inside MC error, spreads to ~25%
        sf = max(float(em.flux_std[0]), float(es.flux_std[0]))
        assert abs(float(em.flux_mean[0]) - float(es.flux_mean[0])) < sf, \
            (em.flux_mean, es.flux_mean, sf)
        du_tol = max(float(np.max(em.du_std)), float(np.max(es.du_std)),
                     0.005)
        assert np.hypot(*(np.asarray(em.du_mean) - es.du_mean)) < du_tol
        s_m, s_s = float(em.flux_std[0]), float(es.flux_std[0])
        assert 1 / 1.34 < s_m / max(s_s, 1e-9) < 1.34, (s_m, s_s)
    dm = {d["group"]: d for d in art_m["diagnostics"]}
    for d in art_s["diagnostics"]:
        assert d["rhat_max"] < 1.15 and d["divergence_rate"] < 0.05, d
        assert abs(d["ess_min"] - dm[d["group"]]["ess_min"]) \
            < 0.5 * dm[d["group"]]["ess_min"]


@pytest.mark.slow
def test_field_checkpoint_resume_bitwise(tmp_path):
    """cfg.checkpoint_path + sample_segment: kill the pipeline after the
    FIRST sampling segment (a logger that raises — stands in for an axon
    kill / preemption), re-run with the same path, and require the
    resumed catalog to be BITWISE the uninterrupted segmented run's.
    Bitwise is the right gate here (unlike monolithic-vs-segmented): the
    resumed run replays the identical jitted segment programs on carries
    that round-tripped losslessly through the .npz checkpoint."""
    from celeste_tpu.utils.metrics import MetricsLogger

    class _KillAfterFirstSegment(MetricsLogger):
        def log(self, event, **kw):
            super().log(event, **kw)
            if event == "field_sample_segment":
                raise KeyboardInterrupt("simulated preemption")

    scene, _ = _two_group_frame()
    kw = dict(n_chains=8, probe_warmup=20, probe_steps=8, n_warmup=20,
              n_steps=20, map_steps=60, sample_segment=8, warmup_window=9)
    ck = str(tmp_path / "field_ck.npz")

    cat_u, art_u = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=_small_cfg(**kw), priors=PRIORS)

    with pytest.raises(KeyboardInterrupt):
        run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                           cfg=_small_cfg(checkpoint_path=ck, **kw),
                           priors=PRIORS,
                           logger=_KillAfterFirstSegment())
    assert np.load(ck, allow_pickle=False) is not None
    cat_r, art_r = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=_small_cfg(checkpoint_path=ck,
                                                     **kw), priors=PRIORS)
    np.testing.assert_array_equal(art_u["samples"], art_r["samples"])
    for eu, er in zip(cat_u, cat_r):
        assert eu.kind == er.kind
        np.testing.assert_array_equal(eu.flux_mean, er.flux_mean)
        np.testing.assert_array_equal(eu.du_mean, er.du_mean)

    # a stale checkpoint for a DIFFERENT run must be rejected loudly
    with pytest.raises(ValueError, match="different run"):
        run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                           cfg=_small_cfg(seed=99, checkpoint_path=ck, **kw),
                           priors=PRIORS)

    # checkpointing without segmentation has no boundary to save at
    with pytest.raises(ValueError, match="requires cfg.sample_segment"):
        run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                           cfg=_small_cfg(checkpoint_path=ck, n_chains=8,
                                          probe_warmup=20, probe_steps=8,
                                          n_warmup=20, n_steps=20,
                                          map_steps=60), priors=PRIORS)


@pytest.mark.slow
def test_field_scale_accuracy():
    """Survey-realism accuracy at field scale (VERDICT r4 Next #5): the
    256x1024 frame with ~60 mixed sources incl. four sub-linking-radius
    blended pairs, through the full detect -> classify -> MAP scan.
    Detection-side gates run here (MAP catalog, ~15 s warm); the
    posterior-width gates (pos/flux z-RMS) need the sampled catalog,
    which costs ~25 min on this 1-core VM but seconds on TPU — they are
    gated on the committed TPU artifact below, so regenerating that
    artifact with a miscalibrated sampler fails THIS lane."""
    import json

    from celeste_tpu.bench.field_scale import (
        accuracy_report, make_survey_scene, survey_scene_cfg,
    )

    scene, srcs = make_survey_scene()
    assert len(srcs) >= 50
    assert tuple(np.asarray(scene.stamps[0].counts).shape) == (256, 1024)
    cat, art = run_field_pipeline(scene.stamps[0], band=0, n_bands=1,
                                  cfg=survey_scene_cfg(sample=False),
                                  priors=PRIORS)
    rep = accuracy_report(cat, scene, srcs)
    assert rep["completeness"] >= 0.9, rep
    assert rep["purity"] >= 0.9, rep
    assert rep["kind_accuracy"] >= 0.9, rep
    assert rep["pos_rms_arcsec"] < 0.1, rep
    assert abs(rep["flux_rel_bias"]) < 0.05, rep
    # every blended pair resolved: 2 matched entries within each pair's
    # neighborhood (completeness over the full truth set implies it, but
    # assert the mechanism explicitly)
    assert rep["n_matched"] == len(srcs)

    # posterior-calibration gates at this scale, from the committed TPU
    # run (scripts/tpu_field_scale.py; measured CPU reference 2026-08-21:
    # pos_z_rms 1.042, flux_z_rms 1.044 on this exact scene)
    import os
    art_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "tpu_field_scale_results.json")
    if os.path.exists(art_path):
        with open(art_path) as fh:
            tpu_rep = json.load(fh)["accuracy"]
        assert tpu_rep["completeness"] >= 0.9, tpu_rep
        assert tpu_rep["purity"] >= 0.9, tpu_rep
        assert 0.7 <= tpu_rep["pos_z_rms"] <= 1.4, tpu_rep
        assert 0.7 <= tpu_rep["flux_z_rms"] <= 1.4, tpu_rep
