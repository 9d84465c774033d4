"""Round benchmark — prints ONE JSON line (driver contract).

Headline metric (BASELINE.json): single-stamp likelihood evals/sec/chip on
the fused path, measured at B=65536 chains on one SDSS-like 25x25 r-band
stamp.  ``vs_baseline`` is the speedup over the measured NumPy-oracle rate
standing in for the unreadable reference (BASELINE.md: 1.06e4 evals/s on
this VM's CPU, measured 2026-08-16 via the commands recorded there).

Secondary fields in the same JSON object: ESS/sec of the NUTS chain
ensemble on a 6-star crowded field (D=18) and its ratio to the measured
oracle slice-sampler ESS/sec on the same posterior (the >=100x north-star).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ORACLE_EVAL_RATE = 1.06e4        # evals/s, NumPy oracle, this VM (BASELINE.md)
ORACLE_CROWDED_ESS_RATE = None   # filled from BASELINE.md measurement below


def _bench_evals_per_sec():
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels import batched_stamp_loglik

    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)
    rng = np.random.default_rng(0)
    n = 65536
    vecs = jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)

    rates = {}
    for impl in ("pallas", "jnp"):
        f = jax.jit(lambda v, impl=impl: batched_stamp_loglik(
            v, stamp, band=2, kind="star", impl=impl))
        f(vecs).block_until_ready()
        iters = 30
        t = time.time()
        for _ in range(iters):
            out = f(vecs)
        out.block_until_ready()
        rate = n * iters / (time.time() - t)
        print(f"# evals/sec impl={impl}: {rate:.3e}", file=sys.stderr)
        rates[impl] = rate
    return rates


def _bench_ess_per_sec():
    """NUTS ensemble ESS/sec on the 6-star crowded field (n_bands=1 ->
    D=18, matching the oracle measurement in BASELINE.md)."""
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.inference import nuts_kernel, run_chains_ensemble
    from celeste_tpu.inference.diagnostics import ess
    from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity

    offs = [(-3, -2), (2.5, 1.5), (0, 2.5), (-2, 2), (3, -2.5), (0.5, -1)]
    srcs = [star_source(u=(30 + de / 3600 / np.cos(np.deg2rad(10)), 10 + dn / 3600),
                        flux_r=15 + 6 * i)
            for i, (de, dn) in enumerate(offs)]
    scene = make_synthetic_stamp(srcs, shape=(41, 41), bands=(2,), seed=31)
    cs = CrowdedScene(kinds=("star",) * 6, n_bands=1)
    logd = make_crowded_logdensity(cs, [scene.stamps[0]], bands=[0])
    vec = jnp.asarray(np.concatenate(
        [np.concatenate([scene.wcs.equa2duas(s["u"]), [np.log(s["flux"][2])]])
         for s in srcs]), jnp.float32)

    n_chains = 256
    n_steps = 200
    key = jax.random.key(0)
    x0 = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1), (n_chains, 18))

    # adapt step size + diagonal mass (vmapped dual-averaging warmup);
    # with the mass preconditioner the dimensionless step lands ~0.5
    from celeste_tpu.inference import hmc_warmup
    states, ss, im = jax.jit(jax.vmap(
        lambda k, x: hmc_warmup(k, logd, x, n_warmup=200, n_leapfrog=8)
    ))(jax.random.split(jax.random.key(3), n_chains), x0)
    jax.block_until_ready(states)
    step_size = float(jnp.median(ss))
    inv_mass = jnp.mean(im, axis=0)
    print(f"# crowded warmup: step_size={step_size:.4f}", file=sys.stderr)
    kern = nuts_kernel(logd, step_size=step_size, inv_mass=inv_mass, max_depth=6)
    init = states

    # compile once (untimed), then time the run
    run = jax.jit(lambda k, s: run_chains_ensemble(k, kern, s, n_steps=n_steps))
    samples, _, _ = run(key, init)
    samples.block_until_ready()
    t = time.time()
    samples, _, info = run(jax.random.key(2), init)
    samples.block_until_ready()
    dt = time.time() - t
    kept = samples[:, n_steps // 4:]
    e = np.asarray(ess(kept))
    rate_min = float(e.min() / dt)
    rate_med = float(np.median(e) / dt)
    print(f"# crowded NUTS: {dt:.2f}s, min ESS/sec {rate_min:.1f}, "
          f"median {rate_med:.1f}, divergence frac "
          f"{float(jnp.mean(info.diverged.astype(jnp.float32))):.4f}", file=sys.stderr)

    # ChEES arm from the same warmed ensemble: pool the NUTS samples into a
    # dense metric, adapt (eps, T) on the whitened target, run 4x the steps
    # (each is ~2 leapfrogs, not 2^depth)
    try:
        from celeste_tpu.inference.diagnostics import split_rhat
        from celeste_tpu.inference.whiten import whitened_chees_run

        n_steps_c = 4 * n_steps
        # whiten + adapt + compile via the SAME recipe the pipeline uses
        # (inference/whiten.whitened_chees_run), then time ONLY the
        # frozen-parameter sampling (warmup excluded, like the NUTS arm)
        from celeste_tpu.inference import run_chees_ensemble

        samples_c, info_c, aux = whitened_chees_run(
            jax.random.key(8), logd, kept[:, ::4], states.x,
            n_steps=n_steps_c)
        jax.block_until_ready(samples_c)
        run_only = jax.jit(lambda k, s: run_chees_ensemble(
            k, aux["logd_z"], s, n_steps=n_steps_c, step_size=aux["eps"],
            trajectory_length=aux["traj"], max_leapfrog=64))
        out = run_only(jax.random.key(9), aux["final_state"])  # compile
        jax.block_until_ready(out)
        t = time.time()
        samples_z, _, info_c = run_only(jax.random.key(10),
                                        aux["final_state"])
        jax.block_until_ready(samples_z)
        dt_c = time.time() - t
        kept_c = aux["to_x"](samples_z[:, n_steps_c // 4:])
        ec = np.asarray(ess(kept_c))
        rate_min_c = float(ec.min() / dt_c)
        rh = float(np.max(np.asarray(split_rhat(kept_c))))
        print(f"# crowded ChEES: {dt_c:.2f}s, min ESS/sec {rate_min_c:.1f}, "
              f"median {float(np.median(ec) / dt_c):.1f}, accept "
              f"{float(jnp.mean(info_c.accept_rate)):.3f}, eps "
              f"{aux['eps']:.3f}, traj {aux['traj']:.3f}, divergence "
              f"{float(jnp.mean(info_c.divergence_rate)):.4f}, max rhat "
              f"{rh:.4f}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"# crowded chees arm failed: {str(exc)[:200]}", file=sys.stderr)
        rate_min_c = None
    return rate_min, rate_min_c


def _bench_tiled_field():
    """Occupancy-bucketed tiled likelihood on a 64-source 128x512 field."""
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels.tiled_field import (
        TiledStampData, scene_planes_padded, tiled_field_loglik,
    )
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.tiles import build_tile_map

    rng = np.random.default_rng(3)
    cosd = np.cos(np.deg2rad(10.0))
    h, w, n_src, b = 128, 512, 64, 1024
    srcs = []
    for _ in range(n_src):
        px, py = rng.uniform(10, w - 10), rng.uniform(6, h - 6)
        de, dn = (px - (w - 1) / 2) * 0.396, (py - (h - 1) / 2) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=15 + 10 * rng.random()))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=77)
    scene = CrowdedScene(kinds=("star",) * n_src, n_bands=5)
    stamp = sd.stamps[0]
    pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    tm = build_tile_map(pos_px, radii_px=12.0, shape=(h, w))
    data = TiledStampData(tm, stamp, n_buckets=3)
    vec = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs]),
        jnp.float32)
    vecs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(0), (b, vec.shape[0]))
    planes = jax.jit(lambda v: scene_planes_padded(scene, v, stamp, 2))(vecs)
    jax.block_until_ready(planes)
    f = jax.jit(lambda p: tiled_field_loglik(p, data, n_comp=3))
    f(planes).block_until_ready()
    t = time.time()
    for _ in range(20):
        out = f(planes)
    out.block_until_ready()
    rate = b * 20 / (time.time() - t)
    print(f"# tiled field (64 src, 128x512, bucketed): {rate:.3e} field-evals/s",
          file=sys.stderr)
    return rate


def _bench_config5_tiled(n_chains=1024, n_steps=96, n_warmup=150,
                         warmup_window=50, run_segment=16):
    """BASELINE config 5 AS WRITTEN (VERDICT r1 #3): 12 overlapping sources
    (10 stars + 2 galaxies - production fields are mixed-kind), 1024
    chains, block-sparse TILED likelihood, single chip.  Returns
    (nuts min ESS/sec, divergence fraction, max |tiled - dense| parity gap,
    chees min ESS/sec).

    Two sampler arms from the IDENTICAL warmed+whitened ensemble
    (celeste_tpu/bench/config5.py): whitened NUTS (depth 5) and whitened
    ChEES-HMC (ensemble-adapted jittered trajectories).  Execution is
    SEGMENTED: the axon tunnel kills device calls somewhere in the
    60-120 s band (measured, scripts/tpu_session4/5) - numerically
    identical to the monolithic program (tests pin warmup windows and
    Halton continuation).  Gradients route through the batch-aware vg
    (7x; inference/vg.py)."""
    from celeste_tpu.bench.config5 import (
        build_config5, config5_warmup_and_whiten, measure_chees_z,
        measure_nuts_z,
    )

    logd, logd_dense, vec, _info = build_config5()
    d = int(vec.shape[0])

    # parity gate: tiled vs dense on perturbed states
    probe = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(9), (8, d))
    lt = np.asarray(jax.vmap(logd)(probe))
    ld = np.asarray(jax.vmap(logd_dense)(probe))
    parity = float(np.max(np.abs(lt - ld)))
    print(f"# config5 tiled-dense parity {parity:.3f}", file=sys.stderr)

    prep = config5_warmup_and_whiten(logd, vec, n_chains=n_chains,
                                     n_warmup=n_warmup,
                                     warmup_window=warmup_window)
    rate_min, div, _depth = measure_nuts_z(prep, n_steps=n_steps,
                                           run_segment=run_segment)
    try:
        rate_chees, _acc, _nl = measure_chees_z(prep)
    except Exception as e:  # noqa: BLE001
        print(f"# config5 chees arm failed: {str(e)[:200]}", file=sys.stderr)
        rate_chees = None
    return rate_min, div, parity, rate_chees


def _bench_photoz_batch(n_targets=32):
    """BASELINE config 4 throughput: N independent quasar photo-z tempered
    posteriors batched on one chip.  Returns (targets/sec, z-recovery
    fraction |z_med - z_true| < 0.25)."""
    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photo_z import PhotoZConfig, run_photo_z_batch
    from celeste_tpu.quasar.photometry import project_to_bands

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    rng = np.random.default_rng(17)
    z_true = rng.uniform(0.5, 4.0, n_targets)
    flux, err = [], []
    for i in range(n_targets):
        w = rng.dirichlet(np.ones(basis.n_basis))
        f = np.asarray(project_to_bands(basis, filters,
                                        jnp.asarray(w, jnp.float32),
                                        2.0, float(z_true[i])))
        e = 0.03 * np.abs(f) + 1e-5
        flux.append(f + rng.normal(size=f.shape) * e)
        err.append(e)
    flux = np.stack(flux).astype(np.float32)
    err = np.stack(err).astype(np.float32)

    # sizes fit the axon device-call budget (measured: 64 targets x 400
    # steps ~45 s cached — the kill edge; 32 stays comfortably inside)
    cfg = PhotoZConfig(n_temps=6, n_steps=400, n_warmup=150, n_systems=1,
                       inner="hmc_adaptive")
    # NO outer jit: the fused warmup+sampling program (nested scans +
    # while_loops under a double vmap) exceeds the axon tunnel's compile
    # budget; uncoalesced, each lax.scan compiles as its own program
    run = lambda k: run_photo_z_batch(k, basis, filters, flux, err, cfg)
    out = run(jax.random.key(4))           # compile (untimed)
    jax.block_until_ready(out["z"])
    t = time.time()
    out = run(jax.random.key(5))
    jax.block_until_ready(out["z"])
    dt = time.time() - t
    z_med = np.median(np.asarray(out["z"]).reshape(n_targets, -1), axis=1)
    recov = float(np.mean(np.abs(z_med - z_true) < 0.25))
    rate = n_targets / dt
    print(f"# photo-z batch ({n_targets} targets, 6-temp ladder, "
          f"hmc_adaptive): {dt:.2f}s, {rate:.1f} targets/s, z-recovery "
          f"{recov:.2f}", file=sys.stderr)
    return rate, recov


def _bench_pipeline_walltime():
    """End-to-end catalog pipeline wall time (VERDICT r1 #5: the classify
    stage is now ONE vmapped device call per sweep; this records what the
    whole pixels->catalog flow costs on the chip, compiles included)."""
    from celeste_tpu.data.synthetic import (
        galaxy_source, make_synthetic_stamp, star_source,
    )
    from celeste_tpu.model.priors import FluxPrior, SourcePriors
    from celeste_tpu.pipeline import PipelineConfig, run_pipeline

    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=35.0),
        star_source(u=(30.0 + 3.0 / 3600 / cosd, 10.0 + 2.5 / 3600), flux_r=25.0),
        galaxy_source(u=(30.0, 10.0), flux_r=70.0, sigma=1.8, ab=0.6),
    ]
    scene = make_synthetic_stamp(srcs, shape=(33, 33), bands=(2,), seed=101)
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0))
    cfg = PipelineConfig(max_sources=5, n_chains=32, n_warmup=150, n_steps=250,
                         map_steps=250, seed=3, detection_min_separation=7)
    t = time.time()
    catalog, artifacts = run_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=cfg, priors=priors)
    dt = time.time() - t
    print(f"# pipeline (3-src mixed field, detect+classify+NUTS): {dt:.1f}s "
          f"wall, {artifacts['n_sources']} sources", file=sys.stderr)
    return dt


def _stage(name, fn, default):
    """One benchmark stage; a device fault in one stage must not cost the
    round its whole JSON record (a wedged axon device can take later stages
    with it, but whatever already ran is preserved)."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        print(f"# STAGE FAILED {name}: {str(e)[:300]}", file=sys.stderr)
        return default


def main():
    rates = _stage("evals", _bench_evals_per_sec, {"pallas": 0.0, "jnp": 0.0})
    evals_rate = max(rates.values())
    ess_rate, ess_rate_chees = _stage("crowded_ess", _bench_ess_per_sec,
                                      (None, None))
    tiled_rate = _stage("tiled_field", _bench_tiled_field, None)
    photoz_rate, photoz_recov = _stage("photoz_batch", _bench_photoz_batch,
                                       (None, None))
    pipeline_s = _stage("pipeline", _bench_pipeline_walltime, None)
    # config5 runs LAST: the biggest single device program; if it wedges the
    # chip (DESIGN.md §3) everything above is already recorded
    ess_tiled, div_tiled, parity_tiled, ess_chees = _stage(
        "config5_tiled", _bench_config5_tiled, (None, None, None, None))
    oracle_crowded = 6.0  # min ESS/sec, oracle slice, 6-star field (BASELINE.md)
    print(json.dumps({
        "metric": "single-stamp likelihood evals/sec/chip",
        "value": evals_rate,
        "unit": "evals/s",
        "vs_baseline": evals_rate / ORACLE_EVAL_RATE,
        "evals_per_sec_pallas": rates["pallas"],
        "evals_per_sec_jnp": rates["jnp"],
        "ess_per_sec_crowded": ess_rate,
        "ess_per_sec_crowded_chees": ess_rate_chees,
        "ess_vs_oracle": None if ess_rate is None else ess_rate / oracle_crowded,
        "ess_vs_oracle_chees": None if ess_rate_chees is None
        else ess_rate_chees / oracle_crowded,
        "tiled_field_evals_per_sec": tiled_rate,
        "photoz_targets_per_sec": photoz_rate,
        "photoz_z_recovery_frac": photoz_recov,
        "ess_per_sec_tiled": ess_tiled,
        "ess_per_sec_tiled_chees": ess_chees,
        "tiled_divergence_frac": div_tiled,
        "tiled_dense_parity": parity_tiled,
        "pipeline_wall_time_s": pipeline_s,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
