"""TPU session 6: does the Pallas backward kernel beat the jnp scan-VJP?

Session-5 baseline on the config-5 scene at B=1024 (batch-major):
fwd jnp 16.1 ms / pallas 16.6 ms; grad jnp 51.2 ms / pallas(old chunked-jnp
bwd) 147.6 ms.  This session measures the NEW pallas backward
(_tiled_bwd_kernel: lambda residual saved by the forward, one exp per
slot-pixel, gathered-cotangent stores + one segment-sum scatter).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_session6_results.json")
_f = open(RESULTS, "w")


def emit(**kw):
    _f.write(json.dumps(kw) + "\n")
    _f.flush()
    print(kw, file=sys.stderr)


import numpy as np
import jax
import jax.numpy as jnp

emit(name="device_sanity",
     value=float(jnp.sum(jnp.ones((128, 128))).block_until_ready()))

from celeste_tpu.bench.config5 import build_config5
from celeste_tpu.kernels.tiled_field import scene_planes_blocked, tiled_field_loglik

logd, _, vec, info = build_config5()
cs, stamp, data = info["scene"], info["stamp"], info["tiled_data"]
d = int(vec.shape[0])
B = 1024
vecs = jnp.asarray(vec[None, :] + 0.01 * jax.random.normal(
    jax.random.key(1), (B, d)), jnp.float32)
emit(name="scene_built", d=d, B=B,
     buckets=[(int(np.asarray(s).shape[0]), int(c)) for s, c in data.buckets])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / iters


def batch_logd(V, impl):
    planes = scene_planes_blocked(cs, V, stamp, 0)
    return tiled_field_loglik(planes, data, n_comp=stamp.psf.n_components,
                              impl=impl)


for impl in ("jnp", "pallas"):
    try:
        dt_f = timeit(jax.jit(lambda V, i=impl: batch_logd(V, i)), vecs)
        g = jax.jit(jax.grad(lambda V, i=impl: jnp.sum(batch_logd(V, i))))
        dt_g = timeit(g, vecs)
        emit(name=f"cfg5_{impl}", fwd_ms=round(dt_f * 1e3, 2),
             grad_ms=round(dt_g * 1e3, 2))
    except Exception as e:  # noqa: BLE001
        emit(name=f"cfg5_{impl}", ok=False, error=str(e)[:400])

# numerical cross-check on device: grads agree jnp vs pallas
try:
    g_j = jax.jit(jax.grad(lambda V: jnp.sum(batch_logd(V, "jnp"))))(vecs[:8])
    g_p = jax.jit(jax.grad(lambda V: jnp.sum(batch_logd(V, "pallas"))))(vecs[:8])
    rel = float(jnp.max(jnp.abs(g_j - g_p)) / (jnp.max(jnp.abs(g_j)) + 1e-9))
    emit(name="grad_parity_rel", value=rel)
except Exception as e:  # noqa: BLE001
    emit(name="grad_parity_rel", ok=False, error=str(e)[:400])

# the 64-source production field (bench stage shape), batch-major grads
try:
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.kernels.tiled_field import TiledStampData, scene_planes_padded
    from celeste_tpu.parallel import CrowdedScene
    from celeste_tpu.parallel.tiles import build_tile_map

    rng = np.random.default_rng(3)
    cosd = np.cos(np.deg2rad(10.0))
    h, w, n_src, b2 = 128, 512, 64, 1024
    srcs = []
    for _ in range(n_src):
        px_, py_ = rng.uniform(10, w - 10), rng.uniform(6, h - 6)
        de, dn = (px_ - (w - 1) / 2) * 0.396, (py_ - (h - 1) / 2) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=15 + 10 * rng.random()))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=77)
    sc64 = CrowdedScene(kinds=("star",) * n_src, n_bands=5)
    st64 = sd.stamps[0]
    pos = np.stack([np.asarray(st64.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    tm = build_tile_map(pos, radii_px=12.0, shape=(h, w))
    data64 = TiledStampData(tm, st64, n_buckets=3)
    vec64 = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]), np.log(s["flux"])])
         for s in srcs]), jnp.float32)
    vecs64 = vec64[None, :] + 0.01 * jax.random.normal(jax.random.key(0),
                                                       (b2, vec64.shape[0]))

    def batch64(V, impl):
        planes = scene_planes_padded(sc64, V, st64, 2)
        return tiled_field_loglik(planes, data64, n_comp=3, impl=impl)

    for impl in ("jnp", "pallas"):
        dt_f = timeit(jax.jit(lambda V, i=impl: batch64(V, i)), vecs64, iters=3)
        g = jax.jit(jax.grad(lambda V, i=impl: jnp.sum(batch64(V, i))))
        dt_g = timeit(g, vecs64, iters=3)
        emit(name=f"field64_{impl}", fwd_ms=round(dt_f * 1e3, 2),
             grad_ms=round(dt_g * 1e3, 2))
except Exception as e:  # noqa: BLE001
    emit(name="field64", ok=False, error=str(e)[:400])

emit(name="done")
_f.close()
