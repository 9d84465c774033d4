"""Round-2 TPU measurement session (VERDICT r1 #4/#6): one long-lived
process, everything batched (axon init costs 5-25 min per process).

1. stamp-kernel pallas vs jnp timing, 3 reps each (session noise);
2. exp/log VPU throughput microbenchmarks -> an honest utilization number
   for the stamp kernel (measured peak, not asserted roofline);
3. kernel variants: b_tile sweep, lane-aligned output, 2-D pixel blocks;
4. sharded-tiled occupancy bucketing on the real chip (1-device mesh);
5. config5-tiled sampler bench (validates the new bench.py section on HW).

Writes results as JSON lines to scripts/tpu_session3_results.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "tpu_session3_results.json")
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
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    assert jax.default_backend() == "tpu", "this script needs the TPU"

    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels import batched_stamp_loglik
    from celeste_tpu.kernels.mog_field import (
        _field_planes, mog_field_loglik, stamp_pixel_data,
    )

    # ---- 1. stamp kernel pallas vs jnp, 3 reps ---------------------------
    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)
    rng = np.random.default_rng(0)
    n = 65536
    vecs = jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)

    fns = {}
    for impl in ("pallas", "jnp"):
        fns[impl] = jax.jit(lambda v, impl=impl: batched_stamp_loglik(
            v, stamp, band=2, kind="star", impl=impl))
    for rep in range(3):
        for impl, f in fns.items():
            dt = timeit(f, vecs)
            log("stamp_kernel", impl=impl, rep=rep, evals_per_sec=n / dt)

    # ---- 2. transcendental peak microbench -> utilization ---------------
    # the stamp eval does (C+1)=4 transcendentals per (chain, padded pixel):
    # 3 exp on [B, P] + 1 log on [B, P], plus ~12 flops each.  Measure the
    # chip's actual exp and log throughput at the same array scale.
    big = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.float32)

    @jax.jit
    def exp_chain(x):
        for _ in range(8):
            x = jnp.exp(-jnp.abs(x) * 0.5)   # keep values bounded
        return x

    @jax.jit
    def log_chain(x):
        for _ in range(8):
            x = jnp.log(jnp.abs(x) + 1.0)
        return x

    dt_e = timeit(exp_chain, big, iters=20)
    # each exp iteration also does abs+mul (VPU, overlapped); report raw
    exps_per_sec = 8 * big.size / dt_e
    dt_l = timeit(log_chain, big, iters=20)
    logs_per_sec = 8 * big.size / dt_l
    log("transcendental_peak", exps_per_sec=exps_per_sec,
        logs_per_sec=logs_per_sec)

    pix_pad = stamp_pixel_data(stamp)[0].shape[1]
    best = max(r["evals_per_sec"] for r in RESULTS if r["name"] == "stamp_kernel")
    # per eval: 3 exp + 1 log per padded pixel
    trans_rate = best * pix_pad * 4
    # weighted peak: 3/4 exp + 1/4 log
    peak = 4.0 / (3.0 / exps_per_sec + 1.0 / logs_per_sec)
    log("stamp_utilization", transcendentals_per_sec=trans_rate,
        measured_peak_per_sec=peak, utilization=trans_rate / peak)

    # ---- 3. kernel variants ----------------------------------------------
    planes = jax.jit(jax.vmap(
        lambda v: _field_planes(v, stamp, band=2, kind="star", n_bands=5)))(vecs)
    jax.block_until_ready(planes)
    pd = stamp_pixel_data(stamp)

    for b_tile in (128, 256, 512, 1024, 2048):
        f = jax.jit(functools.partial(mog_field_loglik, impl="pallas",
                                      b_tile=b_tile))
        try:
            dt = timeit(f, *planes, pd)
            log("variant_b_tile", b_tile=b_tile, evals_per_sec=n / dt)
        except Exception as e:  # noqa: BLE001
            log("variant_b_tile", b_tile=b_tile, error=str(e)[:200])

    # lane-aligned output variant: write [b_tile, 128] then slice column 0
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from celeste_tpu.likelihood.poisson import LAMBDA_MIN

    def _kernel_wide_out(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                         px_ref, py_ref, counts_ref, sky_ref, mask_ref,
                         out_ref, *, n_comp):
        px = px_ref[0:1, :]
        py = py_ref[0:1, :]
        b_t = amp_ref.shape[0]
        lam = jnp.broadcast_to(sky_ref[0:1, :], (b_t, px.shape[1])).astype(jnp.float32)
        for c in range(n_comp):
            log_amp = jnp.log(amp_ref[:, c:c + 1])
            dx = px - mx_ref[:, c:c + 1]
            dy = py - my_ref[:, c:c + 1]
            arg = (log_amp - 0.5 * pa_ref[:, c:c + 1] * dx * dx
                   - pb_ref[:, c:c + 1] * dx * dy
                   - 0.5 * pc_ref[:, c:c + 1] * dy * dy)
            lam = lam + jnp.exp(arg)
        lam = jnp.maximum(lam, LAMBDA_MIN)
        ll = (counts_ref[0:1, :] * jnp.log(lam) - lam) * mask_ref[0:1, :]
        s = jnp.sum(ll.reshape(b_t, -1, 128), axis=1)       # [b_t, 128]
        out_ref[:, :] = s

    def wide_out_loglik(amp, mx, my, pa, pb, pc, pixel_data, b_tile=256):
        px, py, counts, sky, mask = pixel_data
        b, c = amp.shape
        pix_pad_ = px.shape[1]
        b_pad = ((b + b_tile - 1) // b_tile) * b_tile
        pad = lambda a: jnp.pad(a, ((0, b_pad - b), (0, 0)))
        args = [pad(a) for a in (amp, mx, my, pa, pb, pc)]
        grid = (b_pad // b_tile,)
        param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        pixel_spec = pl.BlockSpec((1, pix_pad_), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_wide_out, n_comp=c),
            out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
            grid=grid,
            in_specs=[param_spec] * 6 + [pixel_spec] * 5,
            out_specs=pl.BlockSpec((b_tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(*args, px, py, counts, sky, mask)
        return jnp.sum(out[:b], axis=1)

    try:
        f = jax.jit(lambda *a: wide_out_loglik(*a, pd))
        got = f(*planes)
        want = fns["jnp"](vecs)
        err = float(jnp.max(jnp.abs(got - want)))
        dt = timeit(f, *planes)
        log("variant_wide_out", evals_per_sec=n / dt, max_abs_err=err)
    except Exception as e:  # noqa: BLE001
        log("variant_wide_out", error=str(e)[:300])

    # 2-D pixel blocks: pixels as [8, 128] tiles, chains still on sublanes
    # of the param planes -> layout [b_t, 5, 128]?  Simplest honest retry:
    # pixels reshaped [5, 128] (625 -> pad 640), broadcast over chains.
    def _kernel_px2d(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                     px_ref, py_ref, counts_ref, sky_ref, mask_ref,
                     out_ref, *, n_comp):
        b_t = amp_ref.shape[0]
        pxf = px_ref[:, :].reshape(1, -1)
        pyf = py_ref[:, :].reshape(1, -1)
        lam = jnp.broadcast_to(sky_ref[:, :].reshape(1, -1),
                               (b_t, pxf.shape[1])).astype(jnp.float32)
        for c in range(n_comp):
            log_amp = jnp.log(amp_ref[:, c:c + 1])
            dx = pxf - mx_ref[:, c:c + 1]
            dy = pyf - my_ref[:, c:c + 1]
            arg = (log_amp - 0.5 * pa_ref[:, c:c + 1] * dx * dx
                   - pb_ref[:, c:c + 1] * dx * dy
                   - 0.5 * pc_ref[:, c:c + 1] * dy * dy)
            lam = lam + jnp.exp(arg)
        lam = jnp.maximum(lam, LAMBDA_MIN)
        ll = (counts_ref[:, :].reshape(1, -1) * jnp.log(lam) - lam) \
            * mask_ref[:, :].reshape(1, -1)
        out_ref[:, 0] = jnp.sum(ll, axis=1)

    try:
        px2 = [p.reshape(-1, 128) for p in pd]              # [5, 128]
        rows = px2[0].shape[0]

        def px2d_loglik(amp, mx, my, pa, pb, pc, b_tile=256):
            b, c = amp.shape
            b_pad = ((b + b_tile - 1) // b_tile) * b_tile
            pad = lambda a: jnp.pad(a, ((0, b_pad - b), (0, 0)))
            args = [pad(a) for a in (amp, mx, my, pa, pb, pc)]
            grid = (b_pad // b_tile,)
            param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
            pixel_spec = pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(_kernel_px2d, n_comp=c),
                out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
                grid=grid,
                in_specs=[param_spec] * 6 + [pixel_spec] * 5,
                out_specs=pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(*args, *px2)
            return out[:b, 0]

        f = jax.jit(px2d_loglik)
        got = f(*planes)
        want = fns["jnp"](vecs)
        err = float(jnp.max(jnp.abs(got - want)))
        dt = timeit(f, *planes)
        log("variant_px2d", evals_per_sec=n / dt, max_abs_err=err)
    except Exception as e:  # noqa: BLE001
        log("variant_px2d", error=str(e)[:300])

    # ---- 4. sharded-tiled bucketing on the real chip ---------------------
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
        fb = sharded_tiled_crowded_loglik(cs, fstamp, band=2, mesh=mesh,
                                          positions_px=pos, radii_px=10.0,
                                          n_buckets=nb)
        with mesh:
            fj = jax.jit(fb)
            dt = timeit(fj, vv, iters=20)
        log("sharded_tiled_buckets", n_buckets=nb, field_evals_per_sec=b / dt)

    # ---- 5. config5-tiled sampler bench on HW -----------------------------
    import bench as bench_mod
    rate, div, parity = bench_mod._bench_config5_tiled(
        n_chains=1024, n_steps=128, n_warmup=150)
    log("config5_tiled", min_ess_per_sec=rate, divergence_frac=div,
        tiled_dense_parity=parity)

    print("SESSION_DONE", flush=True)


if __name__ == "__main__":
    main()
