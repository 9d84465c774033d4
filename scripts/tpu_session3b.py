"""Round-2 TPU session, part 2: redo the pieces session 3 got wrong.

1. proper ILP-exposed transcendental peak (session 3's chained microbench
   was latency-bound -> nonsense utilization > 1);
2. one more kernel variant: explicit parallel dimension_semantics;
3. sharded-tiled bucketing on HW with the new chain-chunked path
   (session 3 OOM'd VMEM at B=256 unchunked);
4. config5-tiled sampler bench (crashed before running in session 3).
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "tpu_session3b_results.json")
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
    print(f"backend: {jax.default_backend()}", flush=True)
    assert jax.default_backend() == "tpu"

    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels import batched_stamp_loglik
    from celeste_tpu.kernels.mog_field import (
        _field_planes, _loglik_kernel, stamp_pixel_data,
    )

    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)
    rng = np.random.default_rng(0)
    n = 65536
    vecs = jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)
    f_jnp = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2,
                                                   kind="star", impl="jnp"))
    f_pal = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2,
                                                   kind="star", impl="pallas"))
    r_jnp = n / timeit(f_jnp, vecs)
    r_pal = n / timeit(f_pal, vecs)
    log("stamp_kernel", jnp=r_jnp, pallas=r_pal, ratio=r_pal / r_jnp)

    # ---- 1. ILP-exposed transcendental peak ------------------------------
    big = jnp.abs(jax.random.normal(jax.random.key(0), (2048, 2048), jnp.float32)) + 0.1

    @jax.jit
    def exp_peak(x):
        ys = [x * (0.9 + 0.01 * i) for i in range(8)]    # 8 independent streams
        for _ in range(4):
            ys = [jnp.exp(-y) for y in ys]
        return sum(ys)

    @jax.jit
    def mul_peak(x):
        ys = [x * (0.9 + 0.01 * i) for i in range(8)]
        for _ in range(4):
            ys = [y * 1.000001 + 0.000001 for y in ys]   # fma chain
        return sum(ys)

    dt_e = timeit(exp_peak, big, iters=30)
    exps = 32 * big.size / dt_e
    dt_m = timeit(mul_peak, big, iters=30)
    fmas = 32 * big.size / dt_m
    log("vpu_peak", exps_per_sec=exps, fmas_per_sec=fmas)

    pix_pad = stamp_pixel_data(stamp)[0].shape[1]
    best = max(r_jnp, r_pal)
    # per eval per padded pixel: 3 exp + 1 log (count log as one exp-class
    # EUP op) and ~12 VPU flops
    trans_rate = best * pix_pad * 4
    log("stamp_utilization_v2", transcendentals_per_sec=trans_rate,
        exp_peak_per_sec=exps, utilization_vs_exp_peak=trans_rate / exps,
        note="peak from 8-way ILP exp chains; log counted as exp-class")

    # ---- 2. parallel dimension semantics variant --------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes = jax.jit(jax.vmap(
        lambda v: _field_planes(v, stamp, band=2, kind="star", n_bands=5)))(vecs)
    jax.block_until_ready(planes)
    pd = stamp_pixel_data(stamp)

    def pallas_ds(amp, mx, my, pa, pb, pc, b_tile=256):
        px, py, counts, sky, mask = pd
        b, c = amp.shape
        pixp = px.shape[1]
        b_pad = ((b + b_tile - 1) // b_tile) * b_tile
        pad = lambda a: jnp.pad(a, ((0, b_pad - b), (0, 0)))
        args = [pad(a) for a in (amp, mx, my, pa, pb, pc)]
        grid = (b_pad // b_tile,)
        param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        pixel_spec = pl.BlockSpec((1, pixp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_loglik_kernel, n_comp=c, centered=False),
            out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            grid=grid,
            in_specs=[param_spec] * 6 + [pixel_spec] * 5,
            out_specs=pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(*args, px, py, counts, sky, mask)
        return out[:b, 0]

    for bt in (128, 256):
        try:
            f = jax.jit(functools.partial(pallas_ds, b_tile=bt))
            got = f(*planes)
            err = float(jnp.max(jnp.abs(got - f_jnp(vecs))))
            dt = timeit(f, *planes)
            log("variant_parallel_ds", b_tile=bt, evals_per_sec=n / dt,
                max_abs_err=err)
        except Exception as e:  # noqa: BLE001
            log("variant_parallel_ds", b_tile=bt, error=str(e)[:300])

    # ---- 3. sharded-tiled bucketing (chain-chunked) -----------------------
    from jax.sharding import Mesh
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.crowded import sharded_tiled_crowded_loglik

    rng = np.random.default_rng(8)
    cosd = np.cos(np.deg2rad(10.0))
    h, w, n_src, b = 64, 256, 64, 256
    srcs = []
    for i in range(n_src):
        if i < 48:
            px_, py_ = rng.uniform(10, 80), rng.uniform(6, 30)
        else:
            px_, py_ = rng.uniform(90, w - 10), rng.uniform(6, h - 6)
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
            log("sharded_tiled_buckets", n_buckets=nb, error=str(e)[:400])

    # ---- 4. config5-tiled sampler bench ------------------------------------
    import bench as bench_mod
    try:
        rate, div, parity = bench_mod._bench_config5_tiled(
            n_chains=1024, n_steps=128, n_warmup=150)
        log("config5_tiled", min_ess_per_sec=rate, divergence_frac=div,
            tiled_dense_parity=parity)
    except Exception as e:  # noqa: BLE001
        log("config5_tiled", error=str(e)[:400])

    print("SESSION_DONE", flush=True)


if __name__ == "__main__":
    main()
