"""Round-2 TPU session, part 4: bisect the config5-tiled failure.

Previous sessions are confounded by wedged-device cascades (a failed
compile/kill poisons subsequent work in the SAME and sometimes the next
process).  This session runs in a fresh process and escalates in small
steps, logging after each, so the first genuinely-faulting stage is
unambiguous.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "tpu_session3f_results.json")
RESULTS = []


def log(name, **kw):
    rec = {"name": name, **kw}
    RESULTS.append(rec)
    print(json.dumps(rec)[:500], flush=True)
    with open(OUT, "w") as fh:
        for r in RESULTS:
            fh.write(json.dumps(r) + "\n")


def guard(name, fn, **kw):
    try:
        out = fn()
        log(name, ok=True, **(out or {}), **kw)
        return True
    except Exception as e:  # noqa: BLE001
        log(name, ok=False, error=str(e)[-1500:], **kw)
        return False


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    assert jax.default_backend() == "tpu"
    # sanity op first: is the device healthy at all?
    v = float(jnp.sum(jnp.ones((128, 128))))
    log("device_sanity", value=v)

    from celeste_tpu.data.synthetic import (
        galaxy_source, make_synthetic_stamp, star_source,
    )
    from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity
    from celeste_tpu.parallel.crowded import make_tiled_crowded_logdensity

    # the exact config5 scene from bench.py
    rng = np.random.default_rng(11)
    cosd = np.cos(np.deg2rad(10.0))
    h, w = 48, 128
    n_src = 12
    kinds = tuple("galaxy" if i in (3, 8) else "star" for i in range(n_src))
    srcs = []
    for i in range(n_src):
        px_, py_ = rng.uniform(34, 94), rng.uniform(12, 36)
        de, dn = (px_ - (w - 1) / 2) * 0.396, (py_ - (h - 1) / 2) * 0.396
        u = (30 + de / 3600 / cosd, 10 + dn / 3600)
        if kinds[i] == "star":
            srcs.append(star_source(u=u, flux_r=20 + 10 * rng.random()))
        else:
            srcs.append(galaxy_source(u=u, flux_r=60.0, sigma=0.8, ab=0.6))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=55)
    cs = CrowdedScene(kinds=kinds, n_bands=1)
    stamp = sd.stamps[0]
    pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    logd, data = make_tiled_crowded_logdensity(cs, stamp, band=0,
                                               positions_px=pos_px,
                                               radii_px=14.0, n_buckets=2)
    logd_dense = make_crowded_logdensity(cs, [stamp], bands=[0])

    parts = []
    for s, kind in zip(srcs, kinds):
        du = sd.wcs.equa2duas(s["u"])
        if kind == "star":
            parts.append(np.concatenate([du, [np.log(s["flux"][2])]]))
        else:
            th, ab = s["theta_dev"], s["ab"]
            parts.append(np.concatenate(
                [du, [np.log(s["flux"][2]), np.log(th / (1 - th)),
                      np.log(s["sigma"]), np.log(ab / (1 - ab)), s["phi"]]]))
    vec = jnp.asarray(np.concatenate(parts), jnp.float32)
    d = cs.dim
    log("scene_built", d=d, s_max_blocks=int(data.tile_map.s_max),
        n_tiles=int(data.tile_map.n_tiles),
        buckets=[(int(len(np.asarray(s))), int(c)) for s, c in data.buckets])

    # stages 1-3 proven in session 3d; quick re-probe only
    if not guard("fwd_single", lambda: {"logp": float(logd(vec))}):
        return
    # stage 4: vmapped batch of 64 forward+grad
    probe = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(9), (64, d))

    def stage4():
        lps = jax.jit(jax.vmap(logd))(probe)
        gs = jax.jit(jax.vmap(jax.grad(logd)))(probe)
        jax.block_until_ready((lps, gs))
        return {"finite": bool(jnp.all(jnp.isfinite(lps))
                               & jnp.all(jnp.isfinite(gs)))}
    if not guard("vmap64", stage4):
        return

    # stage 5: short warmup + NUTS at 64 chains
    from celeste_tpu.inference import hmc_warmup, nuts_kernel, run_chains_ensemble

    def stage5():
        x0 = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1), (64, d))
        states, ss, im = jax.jit(jax.vmap(
            lambda k, x: hmc_warmup(k, logd, x, n_warmup=20, n_leapfrog=4)
        ))(jax.random.split(jax.random.key(3), 64), x0)
        jax.block_until_ready(states)
        kern = nuts_kernel(logd, step_size=float(jnp.median(ss)),
                           inv_mass=jnp.mean(im, axis=0), max_depth=4)
        samples, _, info = jax.jit(
            lambda k, s: run_chains_ensemble(k, kern, s, n_steps=8))(
                jax.random.key(0), states)
        jax.block_until_ready(samples)
        return {"finite": bool(jnp.all(jnp.isfinite(samples)))}
    if not guard("nuts64", stage5):
        return

    # stage 6: the full config5 bench
    import bench as bench_mod

    def stage6():
        rate, div, parity = bench_mod._bench_config5_tiled(
            n_chains=1024, n_steps=128, n_warmup=150)
        return {"min_ess_per_sec": rate, "divergence_frac": div,
                "tiled_dense_parity": parity}
    if not guard("config5_full", stage6):
        return

    # stage 7: sharded-tiled at small B (separate failure domain)
    from jax.sharding import Mesh
    from celeste_tpu.parallel.crowded import sharded_tiled_crowded_loglik

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                axis_names=("chains", "sources"))
    cs_star = CrowdedScene(kinds=("star",) * 16, n_bands=5)
    rng = np.random.default_rng(8)
    srcs2 = []
    for i in range(16):
        px_, py_ = rng.uniform(10, 118), rng.uniform(6, 42)
        de, dn = (px_ - (w - 1) / 2) * 0.396, (py_ - 24) * 0.396
        srcs2.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                 flux_r=20.0))
    sd2 = make_synthetic_stamp(srcs2, shape=(48, 128), bands=(2,), seed=77)
    st2 = sd2.stamps[0]
    pos2 = np.stack([np.asarray(st2.duas2pixel(jnp.asarray(
        sd2.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs2])
    rows = np.stack([np.concatenate(
        [sd2.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs2])
    vv = jnp.asarray(np.tile(rows[None], (32, 1, 1)), jnp.float32)
    for nb in (1, 3):
        def stage7(nb=nb):
            f = sharded_tiled_crowded_loglik(cs_star, st2, band=2, mesh=mesh,
                                             positions_px=pos2, radii_px=10.0,
                                             n_buckets=nb)
            with mesh:
                out = jax.jit(f)(vv)
                jax.block_until_ready(out)
            return {"finite": bool(jnp.all(jnp.isfinite(out)))}
        if not guard("sharded_tiled_small", stage7, n_buckets=nb):
            return

    # stage 8: bucket win measurement at production-ish scale (VERDICT #6)
    import time as _time
    rng = np.random.default_rng(8)
    srcs3 = []
    h3, w3 = 64, 256
    for i in range(64):
        if i < 48:
            px_, py_ = rng.uniform(10, 80), rng.uniform(6, 30)
        else:
            px_, py_ = rng.uniform(90, w3 - 10), rng.uniform(6, h3 - 6)
        de, dn = (px_ - (w3 - 1) / 2) * 0.396, (py_ - (h3 - 1) / 2) * 0.396
        srcs3.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                 flux_r=15 + 5 * rng.random()))
    sd3 = make_synthetic_stamp(srcs3, shape=(h3, w3), bands=(2,), seed=88)
    cs3 = CrowdedScene(kinds=("star",) * 64, n_bands=5)
    st3 = sd3.stamps[0]
    pos3 = np.stack([np.asarray(st3.duas2pixel(jnp.asarray(
        sd3.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs3])
    rows3 = np.stack([np.concatenate(
        [sd3.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs3])
    vv3 = jnp.asarray(np.tile(rows3[None], (256, 1, 1)), jnp.float32)
    for nb in (1, 3):
        def stage8(nb=nb):
            f = sharded_tiled_crowded_loglik(cs3, st3, band=2, mesh=mesh,
                                             positions_px=pos3, radii_px=10.0,
                                             n_buckets=nb)
            with mesh:
                fj = jax.jit(f)
                out = fj(vv3)
                jax.block_until_ready(out)
                t = _time.time()
                for _ in range(20):
                    out = fj(vv3)
                jax.block_until_ready(out)
                dt = (_time.time() - t) / 20
            return {"field_evals_per_sec": 256 / dt}
        if not guard("sharded_tiled_bucket_timing", stage8, n_buckets=nb):
            return

    print("SESSION_DONE", flush=True)


if __name__ == "__main__":
    main()
