"""Isolate the config-5 gradient-path cost (round 3): the x-space warmup
and NUTS probe measured ~136 ms per leapfrog-batch (B=1024) while the
z-space NUTS measured ~36 ms — same tiled likelihood underneath.  Times
each layer of the stack on the real TPU:

  1. logd.value_and_grad under vmap (the sampler path, x-space)
  2. the raw batched _ll_batch vjp (the 19.5 ms bench number's program)
  3. whitened logd_z.value_and_grad under vmap (z-space sampler path)
  4. one hmc_warmup_window iteration (DA/Welford overhead on top of 8
     leapfrogs)

Writes scripts/tpu_vg_probe_results.json.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from celeste_tpu.bench.config5 import build_config5  # noqa: E402


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / iters


def main():
    res = {}
    logd, _, vec, _ = build_config5()
    d = int(vec.shape[0])
    b = 1024
    xs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(0), (b, d))

    # 1. sampler-path vg under vmap
    from celeste_tpu.inference.vg import value_and_grad_of
    vg = value_and_grad_of(logd)
    f1 = jax.jit(lambda x: jax.vmap(vg)(x))
    res["vmap_vg_ms"] = 1e3 * timed(f1, xs)

    # 2. direct batched value+grad through the attached batch program
    f2 = jax.jit(lambda x: jax.value_and_grad(
        lambda xx: jnp.sum(logd.batched(xx)))(x))
    res["batched_vjp_ms"] = 1e3 * timed(f2, xs)

    # 3. whitened-space vg under vmap (identity-ish whitening)
    from celeste_tpu.inference import whiten_logdensity
    m = jnp.zeros((d,), jnp.float32)
    cov = jnp.eye(d, dtype=jnp.float32)
    logd_z, _, _ = whiten_logdensity(logd, m, cov)
    vgz = value_and_grad_of(logd_z)
    f3 = jax.jit(lambda x: jax.vmap(vgz)(x))
    res["vmap_vg_whitened_ms"] = 1e3 * timed(f3, xs)

    # 4. one warmup-window iteration (8 leapfrogs + DA + Welford)
    from celeste_tpu.inference import hmc_warmup_init, hmc_warmup_window
    carry = jax.jit(jax.vmap(lambda x: hmc_warmup_init(x, logd)))(xs)
    keys = jax.vmap(lambda k: jax.random.split(k, 1))(
        jax.random.split(jax.random.key(3), b))
    f4 = jax.jit(lambda ks, c: jax.vmap(
        lambda k, ci: hmc_warmup_window(k, logd, ci, n_warmup=150,
                                        n_leapfrog=8))(ks, c))
    res["warmup_iter_ms"] = 1e3 * timed(f4, keys, carry)
    res["warmup_per_leapfrog_ms"] = res["warmup_iter_ms"] / 8.0

    res["backend"] = jax.default_backend()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_vg_probe_results.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
