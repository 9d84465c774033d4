"""One-shot TPU session: tiled crowded-field kernel vs dense paths."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels.mog_field import mog_field_loglik, stamp_pixel_data
    from celeste_tpu.kernels.tiled_field import (
        TiledStampData, scene_planes_padded, tiled_field_loglik,
    )
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.crowded import scene_field_planes
    from celeste_tpu.parallel.tiles import build_tile_map

    # 128 x 512 field, 64 stars
    rng = np.random.default_rng(3)
    cosd = np.cos(np.deg2rad(10.0))
    h, w = 128, 512
    n_src = 64
    srcs = []
    for i in range(n_src):
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
    occ = np.mean(np.sum(tm.tile_src < n_src, axis=1))
    print(f"tiles={tm.n_tiles} s_max={tm.s_max} mean_occupancy={occ:.2f} "
          f"dropped={tm.n_dropped}", flush=True)
    data = TiledStampData(tm, stamp)
    data_b = TiledStampData(tm, stamp, n_buckets=3)
    print("buckets:", [(len(np.asarray(s)), c) for s, c in data_b.buckets], flush=True)

    vec = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs]),
        jnp.float32)
    b = 1024
    vecs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(0), (b, vec.shape[0]))

    planes_t = jax.jit(lambda v: scene_planes_padded(scene, v, stamp, 2))(vecs)
    jax.block_until_ready(planes_t)

    def bench(f, x, iters=20):
        f(x).block_until_ready()
        t = time.time()
        for _ in range(iters):
            out = f(x)
        out.block_until_ready()
        return (time.time() - t) / iters

    f_tiled = jax.jit(lambda p: tiled_field_loglik(p, data, n_comp=3))
    f_tiled_jnp = jax.jit(lambda p: tiled_field_loglik(p, data, n_comp=3, impl="jnp"))

    pd = stamp_pixel_data(stamp)

    def dense(vecs):
        def one(v):
            p = scene_field_planes(scene, v, stamp, 2)
            return mog_field_loglik(*tuple(x[None] for x in p), pd, impl="jnp")[0]
        return jax.vmap(one)(vecs)

    f_dense = jax.jit(dense)

    # parity first
    a = np.asarray(f_tiled(planes_t)[:8])
    c = np.asarray(f_dense(vecs[:8]))
    print(f"parity tiled-vs-dense rel: {np.max(np.abs(a - c) / np.abs(c)):.2e}",
          flush=True)

    f_bucket = jax.jit(lambda p: tiled_field_loglik(p, data_b, n_comp=3))
    for name, f, x in (("tiled-pallas", f_tiled, planes_t),
                       ("tiled-bucket", f_bucket, planes_t),
                       ("tiled-jnp", f_tiled_jnp, planes_t),
                       ("dense-jnp", f_dense, vecs)):
        dt = bench(f, x)
        print(f"  {name:12s}: {dt*1e3:9.3f} ms -> {b/dt:.3e} field-evals/s", flush=True)

    # grad through the tiled path (NUTS cost model)
    gf = jax.jit(jax.value_and_grad(
        lambda v: jnp.sum(tiled_field_loglik(
            scene_planes_padded(scene, v, stamp, 2), data, n_comp=3))))
    gf(vecs[:256])[0].block_until_ready()
    t = time.time()
    for _ in range(10):
        out = gf(vecs[:256])
    out[0].block_until_ready()
    print(f"  tiled grad (B=256): {256*10/(time.time()-t):.3e} grads/s", flush=True)


if __name__ == "__main__":
    main()
