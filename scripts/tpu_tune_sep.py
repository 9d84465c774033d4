"""One-shot TPU session: separable-kernel parity + B_TILE tuning sweep."""

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
    from celeste_tpu.kernels import batched_stamp_loglik
    from celeste_tpu.kernels.mog_field_sep import (
        mog_field_loglik_isotropic, stamp_pixel_data_2d, star_planes_isotropic,
    )

    src = star_source(u=(30.0001, 9.9999), flux_r=25.0)
    scene = make_synthetic_stamp([src], shape=(25, 25), bands=(2,), seed=3)
    stamp = scene.stamps[0]
    du = scene.wcs.equa2duas(src["u"])
    base = np.concatenate([du, np.log(src["flux"])]).astype(np.float32)
    rng = np.random.default_rng(0)
    n = 65536
    vecs = jnp.asarray(base[None, :] + 0.05 * rng.normal(size=(n, 7)), jnp.float32)

    pd2 = stamp_pixel_data_2d(stamp)
    planes = jax.jit(jax.vmap(lambda v: star_planes_isotropic(v, stamp, 2, 5)))(vecs)

    # parity on TPU
    f_jnp = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2, kind="star",
                                                   impl="jnp"))
    want = np.asarray(f_jnp(vecs[:256]))
    f_sep = jax.jit(lambda v: batched_stamp_loglik(v, stamp, band=2, kind="star"))
    got = np.asarray(f_sep(vecs[:256]))
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    print(f"[parity sep-vs-jnp TPU] {err:.3e}", flush=True)

    def bench(f, x, iters=30):
        f(x).block_until_ready()
        t = time.time()
        for _ in range(iters):
            out = f(x)
        out.block_until_ready()
        return n / ((time.time() - t) / iters)

    print("[sweep] separable kernel, B=65536", flush=True)
    for bt in (128, 256, 512, 1024):
        f = jax.jit(lambda p, bt=bt: mog_field_loglik_isotropic(*p, pd2, b_tile=bt))
        rate = bench(f, planes)
        print(f"  b_tile={bt:5d}: {rate:.3e} evals/s", flush=True)

    f_sepjnp = jax.jit(lambda p: mog_field_loglik_isotropic(*p, pd2, impl="jnp"))
    print(f"  sep-jnp (XLA einsum): {bench(f_sepjnp, planes):.3e} evals/s", flush=True)
    print(f"  dispatch default    : {bench(f_sep, vecs):.3e} evals/s", flush=True)
    print(f"  general jnp         : {bench(f_jnp, vecs):.3e} evals/s", flush=True)

    # grads
    gf = jax.jit(jax.value_and_grad(lambda v: jnp.sum(f_sep(v))))
    gf(vecs[:16384])[0].block_until_ready()
    t = time.time()
    for _ in range(10):
        out = gf(vecs[:16384])
    out[0].block_until_ready()
    print(f"  grad (sep fwd+jnp bwd): {16384 * 10 / (time.time() - t):.3e} grads/s",
          flush=True)


if __name__ == "__main__":
    main()
