"""End-to-end catalog inference pipeline (SURVEY.md C17/§3.2 — what the
reference's experiment scripts do as a whole: start from pixels, produce a
posterior catalog).

Stages (each independently usable):
  1. detect   — CLEAN-style iterative matched-filter detection with
                point-source subtraction on the residual image;
  2. classify — conditional classification sweeps (block coordinate ascent,
                the reference's celeste_em structure): each candidate
                re-decided star/galaxy/absent with the others folded into
                an effective sky, plus deblender merging and
                evidence pruning;
  3. sample   — joint NUTS over the full scene with adapted warmup;
  4. catalog  — posterior summaries per source in physical units.

Single-band or multi-band: pass one Stamp or a list of per-band Stamps
(detection runs on ``detect_band_index``; fits and sampling are joint over
all bands).  Works on synthetic scenes and ingested SDSS stamps alike;
every stage logs to the metrics stream.  This is the "switch from the
reference" entry point: one call from pixels to a Bayesian catalog.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.inference import hmc_warmup, nuts_kernel, run_chains_ensemble, summarize
from celeste_tpu.inference.map_fit import detect_peaks, map_fit
from celeste_tpu.model.priors import SourcePriors
from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity
from celeste_tpu.utils.metrics import MetricsLogger


@dataclass
class PipelineConfig:
    max_sources: int = 8
    detection_snr_min: float = 5.0
    # peak exclusion radius (px).  Extended galaxies shed secondary peaks in
    # their wings; phantom candidates are handled by pruning/merging below,
    # but a radius near the largest expected source extent keeps the
    # candidate list short.
    detection_min_separation: int = 5
    classify: bool = True
    # minimum Laplace-evidence gain (nats) over the source-free conditional
    # scene for a candidate to survive pruning
    prune_min_evidence: float = 5.0
    classify_sweeps: int = 3
    # star/galaxy decision: call galaxy only when the galaxy model BOTH
    # wins the Laplace evidence by a margin AND fits a genuinely extended
    # profile.  Bare evidence comparison is not robust in blended scenes:
    # ~100-count neighbor-model residuals reward a quasi-point "galaxy"
    # (fitted sigma << PSF) by tens of nats, swamping the ~10-nat Occam
    # factor.  Extendedness is the standard astronomical discriminator.
    galaxy_margin_nats: float = 10.0
    galaxy_sigma_min_arcsec: float = 0.4
    merge_sigma_factor: float = 1.5
    # exact star/galaxy decision for AMBIGUOUS candidates (VERDICT r2 Next
    # #4): when the final classify sweep's |Laplace margin| is inside
    # galaxy_margin_nats, the margin+extendedness heuristic is a coin-toss
    # zone — run the Carlin-Chib composite type sampler
    # (inference/type_switch) on the candidate's CONDITIONAL posterior
    # (other sources folded into the effective sky) and follow ITS
    # asymptotically exact P(star).  Clear-cut candidates keep the cheap
    # rule.
    type_switch: bool = True
    type_switch_chains: int = 8
    type_switch_steps: int = 300
    # posterior-predictive check stage (VERDICT r2 Next #5): score the
    # observed stamp against replicates from the posterior (celeste_tpu.ppc)
    ppc: bool = False
    ppc_draws: int = 32
    n_chains: int = 32
    n_warmup: int = 250
    n_steps: int = 500
    n_leapfrog: int = 10
    max_depth: int = 6
    map_steps: int = 300
    seed: int = 0
    # joint-sampling kernel: chees (whitened ensemble-adaptive jittered
    # HMC; 13-25x NUTS's min-ESS/sec measured on v5e) or nuts
    sampler: str = "chees"


@dataclass
class CatalogEntry:
    kind: str
    p_star: float
    du_mean: np.ndarray     # arcsec offsets (east, north)
    du_std: np.ndarray
    flux_mean: np.ndarray   # per band, nanomaggies
    flux_std: np.ndarray
    extras: dict = field(default_factory=dict)


def run_pipeline(stamps, band=0, n_bands: int | None = None,
                 cfg: PipelineConfig = PipelineConfig(),
                 priors: Optional[SourcePriors] = None,
                 logger: Optional[MetricsLogger] = None,
                 detect_band_index: int = 0):
    """Pixels -> posterior catalog.

    ``stamps``: one Stamp or a list of per-band Stamps; ``band``: the flux
    slot per stamp (int for one stamp, list for several).  ``n_bands``
    defaults to the number of stamps.  ``detect_band_index`` selects which
    stamp drives detection (use the deepest band).
    """
    from celeste_tpu.inference.model_select import laplace_evidence
    from celeste_tpu.kernels.mog_field import (
        _field_planes,
        _loglik_jnp,
        mixed_field_planes,
        stamp_pixel_data,
    )
    from celeste_tpu.model.params import GalaxyParams, StarParams
    from celeste_tpu.model.stamp import Stamp
    from celeste_tpu.mog import eval_grid

    if not isinstance(stamps, (list, tuple)):
        stamps = [stamps]
    bands = list(band) if isinstance(band, (list, tuple)) else [band] * len(stamps)
    n_bands = n_bands if n_bands is not None else max(len(stamps), max(bands) + 1)
    logger = logger or MetricsLogger()
    priors = priors or SourcePriors()
    key = jax.random.key(cfg.seed)
    det = stamps[detect_band_index]
    ds, dg = 2 + n_bands, 6 + n_bands
    pds = [stamp_pixel_data(st) for st in stamps]      # (px,py,counts,sky,mask)
    shapes = [np.asarray(st.counts).shape for st in stamps]
    gal_shape_init = np.array([0.0, 0.0, 0.0, 0.5], np.float32)

    # ---- jitted batch machinery (each compiled ONCE per pipeline run; the
    # host loops below only make decisions — SURVEY.md §3.2/§3.3, VERDICT r1
    # #5: no per-candidate compiles on a remote-compile TPU) ---------------

    def _lam_from_planes(planes, px, py):
        """[C] planes -> sky-free lambda [PIX]."""
        amp, mx, my, pa, pb, pc = planes
        dx = px[0][None, :] - mx[:, None]
        dy = py[0][None, :] - my[:, None]
        quad = (pa[:, None] * dx * dx + 2.0 * pb[:, None] * dx * dy
                + pc[:, None] * dy * dy)
        return jnp.sum(amp[:, None] * jnp.exp(-0.5 * quad), axis=0)

    def _cond_logd(kind):
        """Conditional log density of one candidate given per-stamp
        effective skies (other sources folded in) as TRACED data."""
        def logd(x, effs):
            ll = 0.0
            for pd, st, b, eff in zip(pds, stamps, bands, effs):
                px, py, counts, _, mask = pd
                planes = _field_planes(x, st, b, kind, n_bands)
                planes_b = tuple(p[None] for p in planes)
                ll = ll + _loglik_jnp(*planes_b, px, py, counts, eff[None],
                                      mask)[0]
            if kind == "star":
                p = StarParams.from_vector(x, n_bands)
                lp = priors.star_logpdf(p) + StarParams.log_det_jacobian(x, n_bands)
            else:
                p = GalaxyParams.from_vector(x, n_bands)
                lp = priors.galaxy_logpdf(p) + GalaxyParams.log_det_jacobian(x, n_bands)
            return ll + lp
        return logd

    _logd_s, _logd_g = _cond_logd("star"), _cond_logd("galaxy")

    @jax.jit
    def det_fit(x0, counts_list):
        """Detection-stage star MAP on residual counts (traced data) ->
        (x_map, per-stamp sky-free lambda of the fit)."""
        def logd(x):
            ll = 0.0
            for pd, st, b, cts in zip(pds, stamps, bands, counts_list):
                px, py, _, sky, mask = pd
                planes = _field_planes(x, st, b, "star", n_bands)
                planes_b = tuple(p[None] for p in planes)
                ll = ll + _loglik_jnp(*planes_b, px, py, cts[None], sky,
                                      mask)[0]
            p = StarParams.from_vector(x, n_bands)
            return (ll + priors.star_logpdf(p)
                    + StarParams.log_det_jacobian(x, n_bands))

        x_map, _ = map_fit(logd, x0, n_steps=cfg.map_steps)
        lams = []
        for pd, st, b in zip(pds, stamps, bands):
            planes = _field_planes(x_map, st, b, "star", n_bands)
            lams.append(_lam_from_planes(planes, pd[0], pd[1]))
        return x_map, lams

    def _scene_effs(rects, flags, alive):
        """Leave-one-out effective skies: per stamp, [N, PIX] arrays where
        row i folds every OTHER alive candidate's lambda into the sky."""
        effs_per_stamp = []
        for pd, st, b in zip(pds, stamps, bands):
            lam_all = jax.vmap(lambda r, f: _lam_from_planes(
                mixed_field_planes(r, st, b, n_bands, f), pd[0], pd[1])
            )(rects, flags)                                   # [N, PIX]
            lam_alive = jnp.where(alive[:, None], lam_all, 0.0)
            total = jnp.sum(lam_alive, axis=0)                # [PIX]
            effs_per_stamp.append(pd[3][0][None, :] + total[None, :] - lam_alive)
        return effs_per_stamp

    @jax.jit
    def classify_sweep_batch(rects, flags, alive):
        """One Jacobi classification sweep over ALL candidates at once.

        rects [N, Dg] rectangular candidate states (stars padded),
        flags/alive [N] bool.  Returns per-candidate star fit + evidence,
        galaxy fit + evidence, and the source-free conditional evidence.
        """
        effs_per_stamp = _scene_effs(rects, flags, alive)

        def per_cand(rect, *effs):
            xs, _ = map_fit(lambda x: _logd_s(x, effs), rect[:ds],
                            n_steps=cfg.map_steps)
            lz_s = laplace_evidence(lambda x: _logd_s(x, effs), xs)
            if cfg.classify:
                xg, _ = map_fit(lambda x: _logd_g(x, effs), rect,
                                n_steps=cfg.map_steps)
                lz_g = laplace_evidence(lambda x: _logd_g(x, effs), xg)
            else:
                xg, lz_g = jnp.zeros(dg, rect.dtype), -jnp.inf
            lz_0 = 0.0
            for pd, eff in zip(pds, effs):
                _, _, counts, _, mask = pd
                lz_0 = lz_0 + jnp.sum(
                    (counts[0] * jnp.log(eff) - eff) * mask[0])
            return xs, lz_s, xg, lz_g, lz_0

        return jax.vmap(per_cand)(rects, *effs_per_stamp)

    # -- 1. iterative detect -> star-MAP -> subtract (CLEAN-style) --------
    psf_peak = float(eval_grid(det.psf, jnp.zeros(()), jnp.zeros(())))
    iota_det = float(np.asarray(det.iota))
    a_inv = np.linalg.inv(np.asarray(det.wcs_A, np.float64))
    p0 = np.asarray(det.wcs_p0, np.float64)

    def with_counts(st, counts):
        return Stamp(jnp.asarray(counts, jnp.float32), st.sky, st.iota, st.mask,
                     st.psf, st.wcs_A, st.wcs_p0, st.band)

    work = [np.array(np.asarray(st.counts), np.float64) for st in stamps]
    skies = [np.asarray(st.sky, np.float64) for st in stamps]
    star_maps, snr_log = [], []
    for _ in range(cfg.max_sources):
        rs_det = with_counts(det, work[detect_band_index])
        peaks, snrs = detect_peaks(rs_det, n_peaks=1,
                                   min_separation=cfg.detection_min_separation)
        if len(peaks) == 0 or snrs[0] < cfg.detection_snr_min:
            break
        px, py = peaks[0]
        du = a_inv @ (np.array([px, py]) - p0)
        peak_val = max(float(work[detect_band_index][int(py), int(px)]
                             - skies[detect_band_index][int(py), int(px)]), 1.0)
        flux0 = peak_val / (iota_det * psf_peak)
        x0 = jnp.asarray(np.concatenate(
            [du, np.full(n_bands, np.log(flux0))]), jnp.float32)
        counts_list = tuple(
            jnp.asarray(np.pad(w.ravel(), (0, pd[0].shape[1] - w.size)),
                        jnp.float32)
            for w, pd in zip(work, pds))
        x_map, lams = det_fit(x0, counts_list)
        for k, (shape, lam) in enumerate(zip(shapes, lams)):
            h, w_ = shape
            work[k] = work[k] - np.asarray(lam[: h * w_], np.float64).reshape(h, w_)
        star_maps.append(np.asarray(x_map))
        snr_log.append(float(snrs[0]))
    n_cand = len(star_maps)
    logger.log("detect", n_candidates=n_cand, snrs=np.round(snr_log, 1).tolist())
    if n_cand == 0:
        return [], {"n_sources": 0}

    # -- 2. conditional classification sweeps + merging + pruning ----------
    # Jacobi block-coordinate ascent: every sweep re-decides ALL candidates
    # against the PREVIOUS sweep's scene in ONE vmapped device call (the
    # reference's celeste_em sweeps were Gauss-Seidel; Jacobi trades a
    # little per-sweep progress for O(1) compiles and full batching).
    cand = [{"kind": "star", "x": np.asarray(m), "p": 1.0, "alive": True}
            for m in star_maps]

    def _rect_of(c):
        r = np.zeros(dg, np.float32)
        if c["kind"] == "star":
            r[:ds] = c["x"][:ds]
            r[ds:] = gal_shape_init      # galaxy-fit init for star candidates
        else:
            r[:] = c["x"]
        return r

    for sweep in range(cfg.classify_sweeps):
        rects = jnp.asarray(np.stack([_rect_of(c) for c in cand]))
        flags = jnp.asarray([c["kind"] == "star" for c in cand])
        alive_m = jnp.asarray([c["alive"] for c in cand])
        xs_b, lz_s_b, xg_b, lz_g_b, lz_0_b = jax.tree_util.tree_map(
            np.asarray, classify_sweep_batch(rects, flags, alive_m))
        for i, ci in enumerate(cand):
            if not ci["alive"]:
                continue
            lz_s, lz_g, lz_0 = float(lz_s_b[i]), float(lz_g_b[i]), float(lz_0_b[i])
            if not cfg.classify:
                lz_g = -np.inf
            if max(lz_s, lz_g) < lz_0 + cfg.prune_min_evidence:
                ci["alive"] = False
                continue
            # p_star is reported for the catalog; the DECISION uses the
            # margin + extendedness rule below (galaxy_margin_nats is the
            # probability threshold expressed in nats: margin m <=> only
            # call galaxy when p_star < sigmoid(-m))
            p = float(jax.nn.sigmoid(lz_s - lz_g)) if cfg.classify else 1.0
            ci["p"] = p
            sigma_fit = (float(np.exp(xg_b[i][3 + n_bands]))
                         if cfg.classify else 0.0)
            is_galaxy = (cfg.classify
                         and lz_g > lz_s + cfg.galaxy_margin_nats
                         and sigma_fit > cfg.galaxy_sigma_min_arcsec)
            if is_galaxy:
                ci["kind"], ci["x"] = "galaxy", np.asarray(xg_b[i])
            else:
                ci["kind"], ci["x"] = "star", np.asarray(xs_b[i])
        # merge pass: a fitted galaxy owns its interior — candidates whose
        # centers fall within merge_sigma_factor x sigma of a brighter
        # galaxy are halo fragments, not sources.
        alive_now = [c for c in cand if c["alive"]]
        for g in sorted((c for c in alive_now if c["kind"] == "galaxy"),
                        key=lambda c: -float(np.exp(c["x"][2]))):
            if not g["alive"]:
                continue
            sig_g = float(np.exp(g["x"][3 + n_bands]))
            r_merge = cfg.merge_sigma_factor * np.clip(sig_g, 0.5, 4.0)
            flux_g = float(np.exp(g["x"][2]))
            for c in cand:
                if c is g or not c["alive"]:
                    continue
                dist = float(np.hypot(c["x"][0] - g["x"][0], c["x"][1] - g["x"][1]))
                if dist < r_merge and float(np.exp(c["x"][2])) < flux_g:
                    c["alive"] = False
        logger.log("classify_sweep", sweep=sweep,
                   kinds=[c["kind"] for c in cand if c["alive"]],
                   p_star=[round(c["p"], 3) for c in cand if c["alive"]],
                   pruned=sum(not c["alive"] for c in cand))

    # -- 2b. exact type decision for the ambiguous band --------------------
    # |Laplace margin| < galaxy_margin_nats is exactly where the heuristic
    # is unreliable; there the catalog follows the Carlin-Chib sampler's
    # posterior P(star) (full parameter uncertainty, Occam factor included
    # through the pseudo-prior construction) computed on the candidate's
    # conditional posterior.  One jitted vmapped device call for all
    # ambiguous candidates (no per-candidate compiles).
    if cfg.classify and cfg.type_switch and cfg.classify_sweeps > 0:
        from celeste_tpu.inference.type_switch import sample_source_type_core

        amb_idx = [i for i, c in enumerate(cand)
                   if c["alive"]
                   and abs(float(lz_g_b[i]) - float(lz_s_b[i]))
                   < cfg.galaxy_margin_nats]
        if amb_idx:
            rects = jnp.asarray(np.stack([_rect_of(c) for c in cand]))
            flags = jnp.asarray([c["kind"] == "star" for c in cand])
            alive_m = jnp.asarray([c["alive"] for c in cand])

            @jax.jit
            def type_switch_batch(keys, rects, flags, alive_m, idxj):
                # effective skies computed IN-program (was a separate jit +
                # dispatch; fused to cut the fresh-process executable count
                # — scripts/tpu_pipeline_profile_results.json)
                effs_all = _scene_effs(rects, flags, alive_m)
                rects_amb = rects[idxj]
                effs_amb = [e[idxj] for e in effs_all]

                def per_cand(k, rect, *effs):
                    ls = lambda x: _logd_s(x, effs)
                    lg = lambda x: _logd_g(x, effs)
                    out = sample_source_type_core(
                        k, ls, lg, rect[:ds], rect,
                        n_chains=cfg.type_switch_chains,
                        n_steps=cfg.type_switch_steps,
                        n_map_steps=cfg.map_steps)
                    return (out["p_star"], out["switch_rate"],
                            out["x_star_mean"], out["x_gal_mean"])
                return jax.vmap(per_cand)(keys, rects_amb, *effs_amb)

            idxj = jnp.asarray(amb_idx)
            keys_amb = jax.random.split(jax.random.fold_in(key, 77),
                                        len(amb_idx))
            p_star_b, sw_b, xs_mean, xg_mean = jax.tree_util.tree_map(
                np.asarray, type_switch_batch(keys_amb, rects, flags,
                                              alive_m, idxj))
            for j, i in enumerate(amb_idx):
                ps = float(p_star_b[j])
                ci = cand[i]
                ci["p"] = ps
                # the sampler's P(star) replaces the sigmoid-of-Laplace, but
                # the EXTENDEDNESS discriminator stays: the two-model
                # evidence comparison cannot see that a "galaxy" whose
                # posterior sigma is far below the PSF is a point source
                # absorbing blend residuals (same failure the heuristic
                # guards against — dropping the guard here flipped true
                # stars to quasi-point galaxies at p_star < 0.01).
                sigma_mean = float(np.exp(xg_mean[j][3 + n_bands]))
                if ps < 0.5 and sigma_mean > cfg.galaxy_sigma_min_arcsec:
                    ci["kind"], ci["x"] = "galaxy", np.asarray(xg_mean[j])
                else:
                    ci["kind"], ci["x"] = "star", np.asarray(xs_mean[j])
            logger.log("type_switch", candidates=amb_idx,
                       p_star=np.round(p_star_b, 3).tolist(),
                       switch_rate=np.round(sw_b, 3).tolist(),
                       sigma_mean=[round(float(np.exp(x[3 + n_bands])), 3)
                                   for x in xg_mean],
                       kinds=[cand[i]["kind"] for i in amb_idx])

    alive = [c for c in cand if c["alive"]]
    kinds = [c["kind"] for c in alive]
    p_stars = [c["p"] for c in alive]
    maps = [c["x"] for c in alive]
    n_src = len(alive)
    if n_src == 0:
        return [], {"n_sources": 0}

    # -- 3. joint sampling -------------------------------------------------
    scene = CrowdedScene(kinds=tuple(kinds), n_bands=n_bands)
    logd = make_crowded_logdensity(scene, stamps, bands=bands, priors=priors)
    blocks, d_total = scene.block_slices()
    joint0 = np.zeros(d_total, np.float32)
    for (off, d, kind), i in zip(blocks, range(n_src)):
        joint0[off:off + d] = np.asarray(maps[i])  # width matches kind

    k_w, k_s, k_i = jax.random.split(key, 3)
    x0b = jnp.asarray(joint0)[None, :] + 0.005 * jax.random.normal(
        k_i, (cfg.n_chains, d_total))
    if cfg.sampler == "chees":
        # The dense-metric ChEES recipe (DESIGN.md §5) fused into ONE
        # jitted program: diagonal warmup -> fixed-leapfrog HMC probe at
        # the adapted metric -> pooled ensemble covariance -> whitened
        # ChEES warmup -> frozen-(eps,T) run -> on-device summaries.
        # Measured motivation (scripts/tpu_pipeline_profile_results.json):
        # the phase as 4-5 separate programs (incl. a NUTS probe, the
        # largest executable in the repo) cost ~233 s fresh-process on the
        # axon tunnel vs ~30 s in-process — per-program executable
        # load/upload dominated, so the fix is fewer, smaller programs,
        # not faster math.  The HMC probe replaces NUTS: its only job is
        # feeding 32x16 pooled samples to the covariance estimate.
        from celeste_tpu.inference import hmc_kernel
        from celeste_tpu.inference.chees import (
            chees_warmup, run_chees_ensemble,
        )
        from celeste_tpu.inference.whiten import (
            ensemble_covariance, whiten_logdensity,
        )

        @jax.jit
        def sample_phase(k_w, k_s, x0b):
            states, ss, im = jax.vmap(
                lambda k, x: hmc_warmup(k, logd, x, n_warmup=cfg.n_warmup,
                                        n_leapfrog=cfg.n_leapfrog)
            )(jax.random.split(k_w, cfg.n_chains), x0b)
            kern = hmc_kernel(logd, jnp.median(ss), jnp.mean(im, axis=0),
                              n_leapfrog=cfg.n_leapfrog)
            s_probe, _, _ = run_chains_ensemble(jax.random.fold_in(k_s, 1),
                                                kern, states, n_steps=16)
            m_hat, cov_hat = ensemble_covariance(s_probe, ridge=1e-4)
            logd_z, to_x, to_z = whiten_logdensity(logd, m_hat, cov_hat)
            st, eps, traj = chees_warmup(
                jax.random.fold_in(k_s, 2), logd_z, to_z(states.x),
                n_warmup=100, init_step_size=0.3, max_leapfrog=64)
            samples_z, _, info_c = run_chees_ensemble(
                jax.random.fold_in(k_s, 3), logd_z, st, n_steps=cfg.n_steps,
                step_size=eps, trajectory_length=traj, max_leapfrog=64)
            samples = to_x(samples_z)
            kept = samples[:, cfg.n_steps // 4:]
            return (samples, kept, summarize(kept),
                    jnp.mean(info_c.divergence_rate),
                    jnp.mean(info_c.accept_rate))

        samples, kept, summ, div_t, acc_t = sample_phase(k_w, k_s, x0b)
        div, accept = float(div_t), float(acc_t)
    else:
        states, ss, im = jax.vmap(
            lambda k, x: hmc_warmup(k, logd, x, n_warmup=cfg.n_warmup,
                                    n_leapfrog=cfg.n_leapfrog)
        )(jax.random.split(k_w, cfg.n_chains), x0b)
        kern = nuts_kernel(logd, step_size=float(jnp.median(ss)),
                           inv_mass=jnp.mean(im, axis=0),
                           max_depth=cfg.max_depth)
        samples, _, info = run_chains_ensemble(k_s, kern, states,
                                               n_steps=cfg.n_steps)
        div = float(jnp.mean(info.diverged.astype(jnp.float32)))
        accept = None
        kept = samples[:, cfg.n_steps // 4:]
        summ = summarize(kept)
    logger.log("sample", rhat_max=float(jnp.max(summ["rhat"])),
               ess_min=float(jnp.min(summ["ess"])),
               divergence_frac=div, accept_rate=accept)

    # -- 4. catalog --------------------------------------------------------
    flat = np.asarray(kept).reshape(-1, d_total)
    catalog: List[CatalogEntry] = []
    for (off, d, kind), p_star in zip(blocks, p_stars):
        block = flat[:, off:off + d]
        du = block[:, :2]
        flux = np.exp(block[:, 2:2 + n_bands])
        extras = {}
        if kind == "galaxy":
            theta = 1 / (1 + np.exp(-block[:, 2 + n_bands]))
            sigma = np.exp(block[:, 3 + n_bands])
            ab = 1 / (1 + np.exp(-block[:, 4 + n_bands]))
            extras = {
                "theta_dev_mean": float(theta.mean()), "sigma_mean": float(sigma.mean()),
                "sigma_std": float(sigma.std()), "ab_mean": float(ab.mean()),
                "phi_mean": float(block[:, 5 + n_bands].mean()),
            }
        catalog.append(CatalogEntry(
            kind=kind, p_star=p_star,
            du_mean=du.mean(0), du_std=du.std(0),
            flux_mean=flux.mean(0), flux_std=flux.std(0),
            extras=extras,
        ))
    artifacts = {"samples": np.asarray(samples), "summary": summ,
                 "scene": scene, "n_sources": n_src}

    # -- 5. posterior-predictive check (optional) --------------------------
    # the reference validated by eyeballing model images against stamps;
    # this is that check made quantitative (celeste_tpu.ppc): replicate
    # counts from posterior draws, score the observed deviance against the
    # replicate distribution per band.
    if cfg.ppc:
        from celeste_tpu.ppc import (
            ppc_chi2_pvalue, ppc_lambda_draws, ppc_pixel_zscores,
        )

        ppc_out = []
        for st, b in zip(stamps, bands):
            lam = ppc_lambda_draws(scene, kept, st, band=b,
                                   n_draws=cfg.ppc_draws, seed=cfg.seed)
            counts = np.asarray(st.counts)
            mask = np.asarray(st.mask, bool)
            pv, _, _ = ppc_chi2_pvalue(lam, counts, mask=mask, seed=cfg.seed)
            z = ppc_pixel_zscores(lam, counts)
            worst = float(np.max(np.abs(np.where(mask, z, 0.0))))
            ppc_out.append({"band": int(b), "pvalue": pv,
                            "worst_pixel_z": worst})
            logger.log("ppc", band=int(b), pvalue=pv, worst_pixel_z=worst)
        artifacts["ppc"] = ppc_out
    return catalog, artifacts
