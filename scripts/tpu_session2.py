"""One-shot TPU session #2: general-kernel b_tile sweep, bench refresh,
pipeline smoke on hardware."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(f, x, iters=30):
    out = f(x)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    return (time.time() - t) / iters


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels.mog_field import (
        _field_planes, mog_field_loglik, stamp_pixel_data,
    )

    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)
    rng = np.random.default_rng(0)
    n = 65536
    vecs = jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)
    planes = jax.jit(jax.vmap(lambda v: _field_planes(v, stamp, 2, "star", 5)))(vecs)
    jax.block_until_ready(planes)
    pd = stamp_pixel_data(stamp)

    print("[sweep] general kernel b_tile, B=65536 star", flush=True)
    for bt in (128, 256, 512, 1024):
        try:
            f = jax.jit(lambda p, bt=bt: mog_field_loglik(*p, pd, b_tile=bt))
            dt = bench(f, planes)
            print(f"  b_tile={bt:5d}: {n/dt:.3e} evals/s", flush=True)
        except Exception as e:  # VMEM limits etc.
            print(f"  b_tile={bt:5d}: FAILED {type(e).__name__}", flush=True)

    f_jnp = jax.jit(lambda p: mog_field_loglik(*p, pd, impl="jnp"))
    print(f"  jnp            : {n/bench(f_jnp, planes):.3e} evals/s", flush=True)

    # pipeline smoke on hardware (small settings; mixes host + device)
    from celeste_tpu.data.synthetic import galaxy_source
    from celeste_tpu.model.priors import FluxPrior, SourcePriors
    from celeste_tpu.pipeline import PipelineConfig, run_pipeline

    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=35.0),
        galaxy_source(u=(30.0, 10.0), flux_r=70.0, sigma=1.8, ab=0.6),
    ]
    sdata = make_synthetic_stamp(srcs, shape=(33, 33), bands=(2,), seed=101)
    t0 = time.time()
    cat, art = run_pipeline(
        sdata.stamps[0], band=0, n_bands=1,
        cfg=PipelineConfig(max_sources=4, n_chains=8, n_warmup=60, n_steps=100,
                           map_steps=250, detection_min_separation=7, seed=3),
        priors=SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0)))
    print(f"[pipeline on TPU] {time.time()-t0:.1f}s  kinds="
          f"{[e.kind for e in cat]}  fluxes="
          f"{[round(float(e.flux_mean[0]),1) for e in cat]}", flush=True)


if __name__ == "__main__":
    main()
