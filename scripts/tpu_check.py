"""One-shot TPU session: compiled-kernel parity vs jnp + throughput sweep.

Run with the environment's default (axon TPU) platform:
    python scripts/tpu_check.py
Batches everything into one process because TPU runtime init costs ~5 min
in this environment (see .claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    t0 = time.time()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)

    from celeste_tpu.data.synthetic import galaxy_source, make_synthetic_stamp, star_source
    from celeste_tpu.kernels import batched_stamp_loglik, stamp_pixel_data
    from celeste_tpu.likelihood import stamp_loglik
    from celeste_tpu.model.params import StarParams

    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)

    rng = np.random.default_rng(0)

    def vecs(n):
        return jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)

    # ---- parity: compiled pallas vs compiled jnp on TPU -------------------
    v = vecs(256)
    f_pallas = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2, kind="star",
                                                      impl="pallas"))
    f_jnp = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2, kind="star",
                                                   impl="jnp"))
    a = np.asarray(f_pallas(v))
    b = np.asarray(f_jnp(v))
    err = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))
    print(f"[parity star] max rel err pallas-vs-jnp (TPU): {err:.3e}", flush=True)
    assert err < 1e-5, "TPU kernel parity failure"

    # grad parity on TPU
    g_pallas = jax.jit(jax.grad(lambda v: jnp.sum(f_pallas(v))))(v[:32])
    g_jnp = jax.jit(jax.grad(lambda v: jnp.sum(f_jnp(v))))(v[:32])
    gerr = np.max(np.abs(np.asarray(g_pallas) - np.asarray(g_jnp))
                  / np.maximum(np.abs(np.asarray(g_jnp)), 1e-2))
    print(f"[parity star grad] max rel err: {gerr:.3e}", flush=True)

    # galaxy parity
    gsrc = galaxy_source(u=(30.0, 10.0), flux_r=60.0)
    gscene = make_synthetic_stamp([gsrc], shape=(25, 25), bands=(2,), seed=5)
    gstamp = gscene.stamps[0]
    gdu = gscene.wcs.equa2duas(gsrc["u"])
    gbase = np.concatenate([gdu, np.log(gsrc["flux"]),
                            [np.log(gsrc["theta_dev"] / (1 - gsrc["theta_dev"])),
                             np.log(gsrc["sigma"]),
                             np.log(gsrc["ab"] / (1 - gsrc["ab"])), gsrc["phi"]]])
    gv = jnp.asarray(gbase[None, :] + 0.02 * rng.normal(size=(64, 11)), jnp.float32)
    fg_pallas = jax.jit(lambda v: batched_stamp_loglik(v, gstamp, band=2, kind="galaxy"))
    fg_jnp = jax.jit(lambda v: batched_stamp_loglik(v, gstamp, band=2, kind="galaxy",
                                                    impl="jnp"))
    ga = np.asarray(fg_pallas(gv)); gb = np.asarray(fg_jnp(gv))
    gerr2 = np.max(np.abs(ga - gb) / np.maximum(np.abs(gb), 1.0))
    print(f"[parity galaxy] max rel err: {gerr2:.3e}", flush=True)

    # ---- throughput sweep -------------------------------------------------
    def bench(f, x, iters=30):
        f(x).block_until_ready()
        t = time.time()
        for _ in range(iters):
            out = f(x)
        out.block_until_ready()
        return (time.time() - t) / iters

    print("\n[throughput] single-stamp star likelihood evals/sec/chip", flush=True)
    for n in (1024, 4096, 16384, 65536):
        v = vecs(n)
        for name, f in (("pallas", f_pallas), ("jnp", f_jnp)):
            dt = bench(f, v)
            print(f"  B={n:6d} {name:6s}: {dt*1e3:8.3f} ms  -> {n/dt:12.3e} evals/s",
                  flush=True)

    print("\n[throughput] galaxy (C=48) likelihood", flush=True)
    for n in (1024, 8192):
        gvn = jnp.asarray(gbase[None, :] + 0.02 * rng.normal(size=(n, 11)), jnp.float32)
        for name, f in (("pallas", fg_pallas), ("jnp", fg_jnp)):
            dt = bench(f, gvn)
            print(f"  B={n:6d} {name:6s}: {dt*1e3:8.3f} ms  -> {n/dt:12.3e} evals/s",
                  flush=True)

    # grad throughput (HMC cost model)
    gf = jax.jit(jax.value_and_grad(lambda v: jnp.sum(f_pallas(v))))
    v = vecs(16384)
    gf(v)[0].block_until_ready()
    t = time.time()
    for _ in range(10):
        out = gf(v)
    out[0].block_until_ready()
    dt = (time.time() - t) / 10
    print(f"\n[throughput] value_and_grad star B=16384: {dt*1e3:.3f} ms -> "
          f"{16384/dt:.3e} grads/s", flush=True)

    print(f"\ntotal wall time: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
