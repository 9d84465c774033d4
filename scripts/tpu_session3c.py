"""Round-2 TPU session, part 3.

Order matters: the axon tunnel can wedge after failed compiles, so the
wanted measurements run FIRST and the failing-path repro runs LAST.

1. true-throughput exp peak (fully independent exps, no chains);
2. config5-tiled sampler bench (single-chip block-tiled mixed scene);
3. sharded-tiled repro with FULL error capture (tail, not head).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "tpu_session3c_results.json")
RESULTS = []


def log(name, **kw):
    rec = {"name": name, **kw}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "w") as fh:
        for r in RESULTS:
            fh.write(json.dumps(r) + "\n")


def timeit(f, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / iters


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    assert jax.default_backend() == "tpu"

    # ---- 1. independent-exp peak -----------------------------------------
    x = jnp.abs(jax.random.normal(jax.random.key(0), (2048, 2048))) + 0.1

    @jax.jit
    def exp_peak(x):
        acc = jnp.zeros_like(x)
        for i in range(16):
            acc = acc + jnp.exp(-(x * (0.9 + 0.003 * i)))
        return acc

    dt = timeit(exp_peak, x, iters=30)
    log("exp_peak_independent", exps_per_sec=16 * x.size / dt)

    # ---- 2. config5-tiled bench -------------------------------------------
    import bench as bench_mod
    try:
        rate, div, parity = bench_mod._bench_config5_tiled(
            n_chains=1024, n_steps=128, n_warmup=150)
        log("config5_tiled", min_ess_per_sec=rate, divergence_frac=div,
            tiled_dense_parity=parity)
    except Exception as e:  # noqa: BLE001
        log("config5_tiled", error=str(e)[-1500:])

    # ---- 3. sharded-tiled repro (LAST; may wedge) --------------------------
    from jax.sharding import Mesh
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.crowded import sharded_tiled_crowded_loglik

    rng = np.random.default_rng(8)
    cosd = np.cos(np.deg2rad(10.0))
    h, w, n_src, b = 64, 256, 16, 32
    srcs = []
    for i in range(n_src):
        px_, py_ = rng.uniform(10, w - 10), rng.uniform(6, h - 6)
        de, dn = (px_ - (w - 1) / 2) * 0.396, (py_ - (h - 1) / 2) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=15 + 5 * rng.random()))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=88)
    cs = CrowdedScene(kinds=("star",) * n_src, n_bands=5)
    fstamp = sd.stamps[0]
    pos = np.stack([np.asarray(fstamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                axis_names=("chains", "sources"))
    vec_rows = np.stack([np.concatenate(
        [sd.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs])
    vv = jnp.asarray(np.tile(vec_rows[None], (b, 1, 1)), jnp.float32)
    for nb in (1, 3):
        try:
            fb = sharded_tiled_crowded_loglik(cs, fstamp, band=2, mesh=mesh,
                                              positions_px=pos, radii_px=10.0,
                                              n_buckets=nb)
            with mesh:
                fj = jax.jit(fb)
                dt = timeit(fj, vv, iters=20)
            log("sharded_tiled_buckets", n_buckets=nb,
                field_evals_per_sec=b / dt)
        except Exception as e:  # noqa: BLE001
            log("sharded_tiled_buckets", n_buckets=nb, error=str(e)[-2500:])

    print("SESSION_DONE", flush=True)


if __name__ == "__main__":
    main()
