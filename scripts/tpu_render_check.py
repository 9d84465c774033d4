"""One-shot TPU session: tiled RENDER kernel compiled parity + throughput."""

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
    from celeste_tpu.kernels.tiled_field import (
        TiledStampData, scene_planes_padded, tiled_field_render,
    )
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.tiles import build_tile_map

    rng = np.random.default_rng(3)
    cosd = np.cos(np.deg2rad(10.0))
    h, w, n_src, b = 64, 256, 16, 256
    srcs = []
    for _ in range(n_src):
        px, py = rng.uniform(10, w - 10), rng.uniform(6, h - 6)
        de, dn = (px - (w - 1) / 2) * 0.396, (py - (h - 1) / 2) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=20.0))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=7)
    scene = CrowdedScene(kinds=("star",) * n_src, n_bands=5)
    stamp = sd.stamps[0]
    pos = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    tm = build_tile_map(pos, radii_px=12.0, shape=(h, w))
    data = TiledStampData(tm, stamp)
    vec = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs]),
        jnp.float32)
    vecs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(0), (b, vec.shape[0]))
    planes = jax.jit(lambda v: scene_planes_padded(scene, v, stamp, 2))(vecs)
    jax.block_until_ready(planes)

    f_pallas = jax.jit(lambda p: tiled_field_render(p, data, n_comp=3))
    f_jnp = jax.jit(lambda p: tiled_field_render(p, data, n_comp=3, impl="jnp"))
    a = np.asarray(f_pallas(planes))
    c = np.asarray(f_jnp(planes))
    print(f"render parity: max abs {np.max(np.abs(a - c)):.2e} on max {c.max():.1f}",
          flush=True)

    t = time.time()
    for _ in range(20):
        out = f_pallas(planes)
    out.block_until_ready()
    print(f"tiled render: {b * 20 / (time.time() - t):.3e} field-renders/s", flush=True)


if __name__ == "__main__":
    main()
