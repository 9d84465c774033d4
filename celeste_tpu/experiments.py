"""Experiment configs + runners (SURVEY.md C17/§5.6; the reference's
ad-hoc experiment scripts become a config registry + one CLI).

Every BASELINE.json eval config is a named entry here:

  star_single    — config 1: r-band point source, MH over (pos, flux)
  star_ugriz     — config 2: ugriz + color priors, slice AND HMC (parity)
  galaxy         — config 3: exp/deV galaxy with shape params (NUTS)
  quasar_photoz  — config 4: photometric-redshift posterior (tempered)
  crowded_field  — config 5: joint multi-source field, chain ensemble

Run:  python -m celeste_tpu.run config=star_single n_chains=64 n_steps=2000
Flat ``key=value`` overrides are parsed onto the dataclass (ints, floats,
strings, bools auto-coerced).  Results go to ``--out`` as .npz + JSONL
metrics.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class ExperimentConfig:
    name: str = "star_single"
    sampler: str = "nuts"          # mh | slice | hmc | nuts | chees | tempered_slice
    n_chains: int = 64
    n_steps: int = 1000
    n_warmup: int = 300
    thin: int = 1
    seed: int = 0
    # scene
    shape: tuple = (25, 25)
    flux_r: float = 30.0
    n_sources: int = 1
    bands: tuple = (2,)
    # sampler knobs
    step_size: float = 0.0         # 0 = auto (warmup adaptation)
    max_depth: int = 6
    n_leapfrog: int = 16
    metric: str = "diag"           # diag | dense (pooled ensemble whitening)
    color_prior: str = "gaussian"  # gaussian | gmm (empirical stellar-locus GMM)
    tiled: bool = False            # crowded_field: block-sparse tiled loglik
    n_galaxies: int = 0            # crowded_field: mixed star/galaxy scenes
    # pipeline knobs
    ppc: bool = False              # posterior-predictive check stage
    type_switch: bool = True       # exact Carlin-Chib for ambiguous kinds
    # field: sampling steps per device call (0 = one monolithic jit); with
    # ``resume=<path>`` the segmented stage checkpoints there every
    # boundary and a rerun resumes bitwise (celeste_tpu/field.py)
    sample_segment: int = 0
    # field_survey: False -> MAP-only catalog scan (detection/photometry
    # accuracy in seconds; posteriors need sample=True)
    sample: bool = True
    # quasar
    n_temps: int = 8
    z_max: float = 6.0
    # io
    out: str = ""
    checkpoint_every: int = 0
    resume: str = ""


def _coerce(val: str, target_type):
    if target_type is bool:
        return val.lower() in ("1", "true", "yes")
    if target_type is tuple:
        return tuple(int(x) for x in val.strip("()").split(",") if x)
    try:
        return target_type(val)
    except (TypeError, ValueError):
        return val


def parse_overrides(cfg: ExperimentConfig, argv):
    fields = {f.name: f.type for f in dataclasses.fields(cfg)}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"override must be key=value, got {arg!r}")
        k, v = arg.split("=", 1)
        if k == "config":
            continue
        if k not in fields:
            raise SystemExit(f"unknown config key {k!r}; known: {sorted(fields)}")
        current = getattr(cfg, k)
        t = type(current) if current is not None else str
        setattr(cfg, k, _coerce(v, t))
    return cfg


CONFIGS = {
    "star_single": ExperimentConfig(name="star_single", sampler="mh", n_chains=64,
                                    n_steps=3000, bands=(2,)),
    "star_ugriz": ExperimentConfig(name="star_ugriz", sampler="hmc", n_chains=32,
                                   n_steps=1000, bands=(0, 1, 2, 3, 4)),
    "galaxy": ExperimentConfig(name="galaxy", sampler="nuts", n_chains=32,
                               n_steps=800, shape=(31, 31), flux_r=60.0,
                               bands=(2,)),
    "quasar_photoz": ExperimentConfig(name="quasar_photoz", sampler="tempered_slice",
                                      n_chains=8, n_steps=1500, n_warmup=500),
    # chees + dense metric: the measured-best crowded sampler (25.8x NUTS
    # min-ESS/sec on v5e; BASELINE.md); sampler=nuts metric=diag restores
    # the reference-style configuration
    "crowded_field": ExperimentConfig(name="crowded_field", sampler="chees",
                                      metric="dense",
                                      n_chains=256, n_steps=500, shape=(41, 41),
                                      n_sources=10, bands=(2,)),
    "pipeline": ExperimentConfig(name="pipeline", sampler="nuts", n_chains=16,
                                 n_steps=400, n_warmup=200, shape=(33, 33),
                                 n_sources=3, bands=(2,)),
    # field-scale catalog pipeline (celeste_tpu/field.py): a synthetic frame
    # with isolated sources + a blend; detection/grouping/classification are
    # the frame's own, sampling is one vmapped device program over groups
    "field": ExperimentConfig(name="field", sampler="chees", n_chains=32,
                              n_steps=300, n_warmup=100, shape=(96, 96),
                              n_sources=5, bands=(2,)),
    # survey-realism frame (celeste_tpu.bench.field_scale): 256x1024,
    # ~60 mixed sources incl. blended pairs, full pipeline + photoObj-style
    # accuracy report against the synthetic truth (SURVEY C17)
    "field_survey": ExperimentConfig(name="field_survey", sampler="chees",
                                     n_chains=8, n_steps=96, n_warmup=48,
                                     shape=(256, 1024), n_sources=60,
                                     bands=(2,)),
}


# ---------------------------------------------------------------------------
# runners
# ---------------------------------------------------------------------------

def _star_problem(cfg: ExperimentConfig):
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.inference.problems import make_star_logdensity
    from celeste_tpu.model.priors import FluxPrior, SourcePriors

    src = star_source(u=(30.00005, 10.00008), flux_r=cfg.flux_r)
    scene = make_synthetic_stamp([src], shape=cfg.shape, bands=cfg.bands, seed=cfg.seed)
    nb = len(cfg.bands)
    color_gmm = None
    if cfg.color_prior == "gmm":
        from celeste_tpu.model.color_prior import default_star_gmm

        color_gmm = default_star_gmm()
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=float(np.log(cfg.flux_r)),
                                         log_ref_std=2.0,
                                         color_gmm=color_gmm))
    if nb == 1:
        logd = make_star_logdensity(scene.stamps, bands=[0], priors=priors, n_bands=1)
        flux = [src["flux"][cfg.bands[0]]]
    else:
        logd = make_star_logdensity(scene.stamps, bands=list(cfg.bands), priors=priors,
                                    n_bands=nb)
        flux = [src["flux"][b] for b in cfg.bands]
    du = scene.wcs.equa2duas(src["u"])
    x0 = np.concatenate([du, np.log(flux)]).astype(np.float32)
    return scene, logd, x0


def _galaxy_problem(cfg: ExperimentConfig):
    from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp
    from celeste_tpu.inference.problems import make_galaxy_logdensity
    from celeste_tpu.model.priors import FluxPrior, SourcePriors

    src = galaxy_source(u=(30.0, 10.0), flux_r=cfg.flux_r)
    scene = make_synthetic_stamp([src], shape=cfg.shape, bands=cfg.bands, seed=cfg.seed)
    nb = len(cfg.bands)
    color_gmm = None
    if cfg.color_prior == "gmm":
        from celeste_tpu.model.color_prior import default_galaxy_gmm

        color_gmm = default_galaxy_gmm()
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=float(np.log(cfg.flux_r)),
                                         log_ref_std=2.0,
                                         color_gmm=color_gmm))
    bands = [0] if nb == 1 else list(cfg.bands)
    logd = make_galaxy_logdensity(scene.stamps, bands=bands, priors=priors, n_bands=nb)
    du = scene.wcs.equa2duas(src["u"])
    flux = [src["flux"][b] for b in cfg.bands]
    t = src["theta_dev"]
    x0 = np.concatenate([
        du, np.log(flux),
        [np.log(t / (1 - t)), np.log(src["sigma"]),
         np.log(src["ab"] / (1 - src["ab"])), src["phi"]],
    ]).astype(np.float32)
    return scene, logd, x0


def _crowded_problem(cfg: ExperimentConfig):
    from celeste_tpu.data.synthetic import (
        galaxy_source, make_synthetic_stamp, star_source,
    )
    from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity

    if cfg.color_prior != "gaussian":
        raise SystemExit(
            "color_prior=gmm is wired for the star/galaxy problems only; "
            "the crowded-field priors would need per-kind flux priors — "
            "rerun with color_prior=gaussian")
    rng = np.random.default_rng(cfg.seed)
    half = cfg.shape[0] * 0.396 / 2.0 - 2.0
    n_gal = min(cfg.n_galaxies, cfg.n_sources)
    kinds = tuple("galaxy" if i < n_gal else "star"
                  for i in range(cfg.n_sources))
    srcs = []
    for i in range(cfg.n_sources):
        de, dn = rng.uniform(-half, half, 2)
        u = (30 + de / 3600 / np.cos(np.deg2rad(10)), 10 + dn / 3600)
        if kinds[i] == "galaxy":
            srcs.append(galaxy_source(u=u, flux_r=2.0 * cfg.flux_r,
                                      sigma=0.8, ab=0.6))
        else:
            srcs.append(star_source(u=u, flux_r=cfg.flux_r * rng.uniform(0.5, 2.0)))
    scene = make_synthetic_stamp(srcs, shape=cfg.shape, bands=cfg.bands, seed=cfg.seed)
    cs = CrowdedScene(kinds=kinds, n_bands=1)
    stamp = scene.stamps[0]
    if cfg.tiled:
        # BASELINE config-5 production path: block-sparse tiles with
        # per-block amplitude-aware support radii
        from celeste_tpu.model.galaxy import block_support_radii
        from celeste_tpu.parallel.crowded import make_tiled_crowded_logdensity

        pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
            scene.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
        psf_sig = float(np.sqrt(np.max(np.linalg.eigvalsh(
            np.asarray(stamp.psf.cov)))))
        radii = block_support_radii(kinds, psf_sigma_px=psf_sig,
                                    gal_sigma_px=1.5 * 0.8 / 0.396)
        logd, _ = make_tiled_crowded_logdensity(
            cs, stamp, band=0, positions_px=pos_px, radii_px=radii,
            impl="jnp")
    else:
        logd = make_crowded_logdensity(cs, [stamp], bands=[0])
    parts = []
    for s_, kind in zip(srcs, kinds):
        du = scene.wcs.equa2duas(s_["u"])
        if kind == "star":
            parts.append(np.concatenate([du, [np.log(s_["flux"][cfg.bands[0]])]]))
        else:
            th, ab = s_["theta_dev"], s_["ab"]
            parts.append(np.concatenate(
                [du, [np.log(s_["flux"][cfg.bands[0]]),
                      np.log(th / (1 - th)), np.log(s_["sigma"]),
                      np.log(ab / (1 - ab)), s_["phi"]]]))
    x0 = np.concatenate(parts).astype(np.float32)
    return scene, logd, x0


def run_experiment(cfg: ExperimentConfig):
    """Execute one experiment; returns a results dict (also written to
    cfg.out if set)."""
    from celeste_tpu.inference import (
        hmc_kernel, hmc_warmup, hmc_warmup_finish, hmc_warmup_init,
        hmc_warmup_window, mh_init, mh_kernel, nuts_kernel,
        run_chains_ensemble, slice_init, slice_kernel, summarize,
    )
    from celeste_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(cfg.out + ".metrics.jsonl" if cfg.out else None)
    logger.log("start", config=dataclasses.asdict(cfg) | {"backend": jax.default_backend()})

    if cfg.name == "quasar_photoz":
        from celeste_tpu.quasar import (PhotoZConfig, project_to_bands, run_photo_z,
                                        sdss_like_filterbank, synthetic_template_basis)
        basis = synthetic_template_basis()
        filters = sdss_like_filterbank()
        rng = np.random.default_rng(cfg.seed)
        z_true = rng.uniform(0.5, 4.0)
        w_true = jnp.asarray(rng.dirichlet(np.full(basis.n_basis, 0.7)), jnp.float32)
        flux = project_to_bands(basis, filters, w_true, 2.0, z_true)
        err = 0.04 * np.abs(np.asarray(flux)) + 1e-5
        obs = np.asarray(flux) + rng.normal(size=5) * err
        pz = PhotoZConfig(n_temps=cfg.n_temps, n_steps=cfg.n_steps,
                          n_warmup=cfg.n_warmup, n_systems=cfg.n_chains,
                          z_max=cfg.z_max)
        out = run_photo_z(jax.random.key(cfg.seed), basis, filters, obs, err, pz)
        result = {"z": np.asarray(out["z"]), "z_true": z_true,
                  "swap_rate": float(out["swap_rate"])}
        logger.log("done", z_true=z_true, z_median=float(np.median(result["z"])),
                   swap_rate=result["swap_rate"])
        if cfg.out:
            np.savez(cfg.out, **result)
        return result

    if cfg.name == "pipeline":
        from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
        from celeste_tpu.pipeline import PipelineConfig, run_pipeline

        cosd = np.cos(np.deg2rad(10.0))
        srcs = [
            star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=35.0),
            star_source(u=(30.0 + 3.0 / 3600 / cosd, 10.0 + 2.5 / 3600), flux_r=25.0),
            galaxy_source(u=(30.0, 10.0), flux_r=70.0, sigma=1.8, ab=0.6),
        ]
        scene = make_synthetic_stamp(srcs, shape=cfg.shape, bands=cfg.bands,
                                     seed=cfg.seed + 101)
        pcfg = PipelineConfig(n_chains=cfg.n_chains, n_warmup=cfg.n_warmup,
                              n_steps=cfg.n_steps, seed=cfg.seed,
                              detection_min_separation=7, ppc=cfg.ppc,
                              type_switch=cfg.type_switch)
        from celeste_tpu.model.priors import FluxPrior, SourcePriors
        catalog, artifacts = run_pipeline(
            scene.stamps[0], band=0, n_bands=1, cfg=pcfg,
            priors=SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0)),
            logger=logger)
        logger.log("done", n_sources=len(catalog),
                   kinds=[e.kind for e in catalog])
        result = {
            "kinds": np.asarray([e.kind for e in catalog]),
            "p_star": np.asarray([e.p_star for e in catalog]),
            "du_mean": np.stack([e.du_mean for e in catalog]) if catalog else np.zeros((0, 2)),
            "flux_mean": np.stack([e.flux_mean for e in catalog]) if catalog else np.zeros((0, 1)),
        }
        if "ppc" in artifacts:
            result["ppc_pvalue"] = np.asarray(
                [p["pvalue"] for p in artifacts["ppc"]])
        if cfg.out:
            np.savez(cfg.out, **result)
        return result

    if cfg.name == "field_survey":
        from celeste_tpu.bench.field_scale import (
            accuracy_report, make_survey_scene, survey_scene_cfg,
        )
        from celeste_tpu.field import run_field_pipeline
        from celeste_tpu.model.priors import FluxPrior, SourcePriors

        scene, srcs = make_survey_scene(shape=cfg.shape)
        fcfg = survey_scene_cfg(
            sample=cfg.sample, n_chains=cfg.n_chains, n_warmup=cfg.n_warmup,
            n_steps=cfg.n_steps, seed=cfg.seed,
            sample_segment=cfg.sample_segment or None,
            checkpoint_path=cfg.resume or None)
        catalog, artifacts = run_field_pipeline(
            scene.stamps[0], band=0, n_bands=1, cfg=fcfg,
            priors=SourcePriors(flux=FluxPrior(log_ref_mean=3.2,
                                               log_ref_std=2.0)),
            logger=logger)
        rep = accuracy_report(catalog, scene, srcs)
        logger.log("done", n_sources=len(catalog),
                   n_groups=artifacts["n_groups"],
                   completeness=rep["completeness"], purity=rep["purity"],
                   pos_z_rms=rep["pos_z_rms"], flux_z_rms=rep["flux_z_rms"])
        result = {
            "kinds": np.asarray([e.kind for e in catalog]),
            "du_mean": (np.stack([e.du_mean for e in catalog])
                        if catalog else np.zeros((0, 2))),
            "accuracy": rep,
        }
        if cfg.out:
            np.savez(cfg.out, **{k: v for k, v in result.items()
                                 if k != "accuracy"})
        return result

    if cfg.name == "field":
        from celeste_tpu.data.synthetic import (galaxy_source,
                                                make_synthetic_stamp,
                                                star_source)
        from celeste_tpu.field import FieldConfig, run_field_pipeline
        from celeste_tpu.model.priors import FluxPrior, SourcePriors

        cosd = np.cos(np.deg2rad(10.0))
        asu = 1.0 / 3600.0
        srcs = [
            star_source(u=(30.0 - 14 * asu / cosd, 10.0 - 13 * asu), flux_r=60.0),
            star_source(u=(30.0 + 15 * asu / cosd, 10.0 - 11 * asu), flux_r=30.0),
            star_source(u=(30.0 - 12 * asu / cosd, 10.0 + 14 * asu), flux_r=45.0),
            star_source(u=(30.0 + 10 * asu / cosd, 10.0 + 12 * asu), flux_r=40.0),
            galaxy_source(u=(30.0 + 10 * asu / cosd, 10.0 + 14.4 * asu),
                          flux_r=80.0, sigma=1.6, ab=0.7),
        ][:max(cfg.n_sources, 1)]
        scene = make_synthetic_stamp(srcs, shape=cfg.shape, bands=cfg.bands,
                                     seed=cfg.seed + 11)
        fcfg = FieldConfig(n_chains=cfg.n_chains, n_warmup=cfg.n_warmup,
                           n_steps=cfg.n_steps, seed=cfg.seed,
                           type_switch=cfg.type_switch,
                           sample_segment=cfg.sample_segment or None,
                           checkpoint_path=cfg.resume or None)
        catalog, artifacts = run_field_pipeline(
            scene.stamps[0], band=0, n_bands=1, cfg=fcfg,
            priors=SourcePriors(flux=FluxPrior(log_ref_mean=3.2,
                                               log_ref_std=2.0)),
            logger=logger)
        logger.log("done", n_sources=len(catalog),
                   n_groups=artifacts["n_groups"],
                   kinds=[e.kind for e in catalog])
        result = {
            "kinds": np.asarray([e.kind for e in catalog]),
            "group": np.asarray([e.extras["group"] for e in catalog]),
            "du_mean": (np.stack([e.du_mean for e in catalog])
                        if catalog else np.zeros((0, 2))),
            "flux_mean": (np.stack([e.flux_mean for e in catalog])
                          if catalog else np.zeros((0, 1))),
        }
        if cfg.out:
            np.savez(cfg.out, **result)
        return result

    problem = {
        "star_single": _star_problem, "star_ugriz": _star_problem,
        "galaxy": _galaxy_problem, "crowded_field": _crowded_problem,
    }[cfg.name]
    scene, logd, x0 = problem(cfg)
    d = x0.shape[0]
    key = jax.random.key(cfg.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    x0b = jnp.asarray(x0)[None, :] + 0.01 * jax.random.normal(k1, (cfg.n_chains, d))

    to_x = None
    if cfg.sampler == "mh":
        kern = mh_kernel(logd, step_scales=jnp.full(d, 0.01))
        init = jax.vmap(lambda x: mh_init(x, logd))(x0b)
    elif cfg.sampler == "slice":
        kern = slice_kernel(logd, widths=jnp.full(d, 0.05))
        init = jax.vmap(lambda x: slice_init(x, logd))(x0b)
    else:
        states, ss, im = jax.vmap(
            lambda k, x: hmc_warmup(k, logd, x, n_warmup=cfg.n_warmup,
                                    n_leapfrog=cfg.n_leapfrog)
        )(jax.random.split(k2, cfg.n_chains), x0b)
        step_size = cfg.step_size or float(jnp.median(ss))
        inv_mass = jnp.mean(im, axis=0)
        logger.log("warmup", step_size=step_size)
        if cfg.metric == "dense":
            # pooled dense metric (inference/whiten.py): probe with the
            # diagonal kernel, estimate the ensemble covariance, then
            # sample in the whitened space and map samples back
            from celeste_tpu.inference import (
                ensemble_covariance, whiten_logdensity,
            )

            probe_kern = nuts_kernel(logd, step_size, inv_mass,
                                     max_depth=cfg.max_depth)
            s_probe, _, _ = run_chains_ensemble(
                jax.random.fold_in(k2, 101), probe_kern, states,
                n_steps=min(16, max(4, cfg.n_warmup // 8)))
            m_hat, cov_hat = ensemble_covariance(s_probe, ridge=1e-4)
            logd, to_x, to_z = whiten_logdensity(logd, m_hat, cov_hat)
            zcar = jax.vmap(lambda z: hmc_warmup_init(z, logd,
                                                      init_step_size=0.3))(
                to_z(states.x))
            n_zw = max(20, cfg.n_warmup // 5)
            zkeys = jax.vmap(lambda k: jax.random.split(k, n_zw))(
                jax.random.split(jax.random.fold_in(k2, 102), cfg.n_chains))
            zcar = jax.vmap(
                lambda k, c: hmc_warmup_window(k, logd, c, n_warmup=n_zw,
                                               n_leapfrog=cfg.n_leapfrog))(
                zkeys, zcar)
            states, ss_z, _ = jax.vmap(hmc_warmup_finish)(zcar)
            step_size = float(jnp.median(ss_z))
            inv_mass = jnp.ones_like(inv_mass)
            logger.log("dense_metric", step_size=step_size)
        if cfg.sampler == "hmc":
            kern = hmc_kernel(logd, step_size, inv_mass, n_leapfrog=cfg.n_leapfrog)
            init = states
        elif cfg.sampler == "chees":
            # ensemble-adaptive jittered HMC (inference/chees.py): joint
            # (eps, T) adaptation pooled across the chain ensemble; pairs
            # naturally with metric=dense (ChEES assumes unit mass — the
            # whitening supplies it)
            from celeste_tpu.inference import chees_warmup

            kern = None
            init, chees_eps, chees_traj = chees_warmup(
                jax.random.fold_in(k2, 103), logd, states.x,
                n_warmup=max(100, cfg.n_warmup // 2),
                init_step_size=step_size,
                max_leapfrog=4 * cfg.n_leapfrog)
            chees_eps = float(chees_eps)
            chees_traj = float(chees_traj)
            logger.log("chees_warmup", step_size=chees_eps,
                       trajectory_length=chees_traj)
        else:
            kern = nuts_kernel(logd, step_size, inv_mass, max_depth=cfg.max_depth)
            init = states

    # sampling loop, optionally segmented with checkpoints (SURVEY.md §5.4:
    # exact resume via pytree state + per-segment PRNG keys)
    from celeste_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    if cfg.resume:
        init, start_seg, _ = load_checkpoint(cfg.resume, init)
        logger.log("resume", path=cfg.resume, segment=start_seg)
        # reload the pre-resume segments so the saved artifact and the
        # summary cover the FULL chain, not just the post-resume tail
        seg_path = cfg.resume + ".segments.npz"
        if os.path.exists(seg_path):
            with np.load(seg_path) as f:
                chunks = [jnp.asarray(f[f"seg_{i}"]) for i in range(start_seg)]
        else:
            chunks = []
            logger.log("resume_without_segments", path=seg_path,
                       note="statistics will cover post-resume samples only")
    else:
        start_seg = 0
        chunks = []

    seg = cfg.checkpoint_every if cfg.checkpoint_every > 0 else cfg.n_steps
    assert cfg.n_steps % seg == 0, "checkpoint_every must divide n_steps"
    n_segments = cfg.n_steps // seg

    def _run_segment(k_seg, st, s_i):
        if cfg.sampler == "chees":
            assert cfg.thin == 1, "chees sampler does not support thinning"
            from celeste_tpu.inference import run_chees_ensemble

            return run_chees_ensemble(k_seg, logd, st, n_steps=seg,
                                      step_size=chees_eps,
                                      trajectory_length=chees_traj,
                                      max_leapfrog=4 * cfg.n_leapfrog,
                                      start_iter=s_i * seg)
        return run_chains_ensemble(k_seg, kern, st, n_steps=seg, thin=cfg.thin)

    state = init
    for s_i in range(start_seg, n_segments):
        k_seg = jax.random.fold_in(k3, s_i)
        samples_seg, state, info = _run_segment(k_seg, state, s_i)
        if cfg.metric == "dense" and to_x is not None:
            samples_seg = to_x(samples_seg)
        chunks.append(samples_seg)
        if cfg.checkpoint_every > 0 and cfg.out:
            ckpt = cfg.out + ".ckpt.npz"
            save_checkpoint(ckpt, state, step=s_i + 1)
            # per-segment samples ride next to the checkpoint (atomic)
            seg_arrays = {f"seg_{i}": np.asarray(c) for i, c in enumerate(chunks)}
            tmp = ckpt + ".segments.tmp.npz"
            np.savez(tmp, **seg_arrays)
            os.replace(tmp, ckpt + ".segments.npz")
            logger.log("checkpoint", segment=s_i + 1)
    if not chunks:
        raise SystemExit(
            f"nothing to run: checkpoint is at segment {start_seg} of "
            f"{n_segments} and no per-segment samples were found next to it; "
            f"raise n_steps to continue the chain")
    if start_seg >= n_segments:
        logger.log("already_complete", segments=n_segments,
                   note="no new sampling; re-summarizing the stored chain")
    samples = jnp.concatenate(chunks, axis=1)
    kept_from = samples.shape[1] // 4
    kept = samples[:, kept_from:]
    summ = summarize(kept)
    logger.log("done", rhat_max=float(jnp.max(summ["rhat"])),
               ess_min=float(jnp.min(summ["ess"])),
               mean=summ["mean"], std=summ["std"])
    result = {"samples": np.asarray(samples), "x0": x0,
              "mean": np.asarray(summ["mean"]), "std": np.asarray(summ["std"]),
              "rhat": np.asarray(summ["rhat"]), "ess": np.asarray(summ["ess"])}
    if cfg.out:
        np.savez(cfg.out, **result)
    return result
