"""TPU session 5: config-5 grad-path cost decomposition + tunnel-timeout
pinning.

Session-4 facts: 1024-chain warmup temp memory is 57 MB (memory is NOT the
problem); warmup at B=128 executes in 58 s, B=256 device-faults -> a
per-device-call execution limit in the 60-120 s range is the prime
suspect, AND the per-grad cost (~0.38 ms/chain) is ~16x the exp-roofline
estimate, so the program is also just slow.

Probes (safest first, flushed incrementally):
  1. batched FORWARD logd (planes+tiled jnp, true [B]-major) at B=1024
  2. batched GRAD via grad(sum(logd_batch)) — per-chain grads in one pass
  3. vmapped per-chain FORWARD (what the samplers build today)
  4. vmapped per-chain GRAD (the measured-slow path)
  5. pallas bucketed forward at B=1024 (batched)
  6. warmup segmented into 15-step jit calls at B=1024 (must each be <45 s
     if the batched-grad restructure works; abort if segment 1 > 70 s)
  7. LAST (will fault if H2 holds): a single ~90 s synthetic device loop
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_session5_results.json")
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
from celeste_tpu.parallel.crowded import crowded_rect_logprior  # noqa: F401

logd, logd_dense, vec, info = build_config5()
cs, stamp, data = info["scene"], info["stamp"], info["tiled_data"]
d = int(vec.shape[0])
B = 1024
vecs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1), (B, d))
vecs = jnp.asarray(vecs, jnp.float32)
emit(name="scene_built", d=d, B=B)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / iters


def batch_logd(V, impl="jnp"):
    planes = scene_planes_blocked(cs, V, stamp, 0)
    return tiled_field_loglik(planes, data, n_comp=stamp.psf.n_components,
                              impl=impl)


def probe(name, fn):
    try:
        dt = fn()
        emit(name=name, ok=True, ms=round(dt * 1e3, 2))
        return dt
    except Exception as e:  # noqa: BLE001
        emit(name=name, ok=False, error=str(e)[:300])
        return None


# 1. batched forward (jnp tiled)
probe("fwd_batch_jnp", lambda: timeit(jax.jit(batch_logd), vecs))
# 2. batched grad-of-sum
g_batch = jax.jit(jax.grad(lambda V: jnp.sum(batch_logd(V))))
probe("grad_batch_jnp", lambda: timeit(g_batch, vecs))
# 3. vmapped per-chain forward (sampler's view)
f_vmap = jax.jit(jax.vmap(logd))
probe("fwd_vmap", lambda: timeit(f_vmap, vecs))
# 4. vmapped per-chain grad
g_vmap = jax.jit(jax.vmap(jax.grad(logd)))
probe("grad_vmap", lambda: timeit(g_vmap, vecs))
# 5. pallas bucketed batched forward
probe("fwd_batch_pallas",
      lambda: timeit(jax.jit(lambda V: batch_logd(V, impl="pallas")), vecs))
# 5b. pallas fwd + its custom-VJP backward (chunked dense jnp)
g_pallas = jax.jit(jax.grad(lambda V: jnp.sum(batch_logd(V, impl="pallas"))))
probe("grad_batch_pallas", lambda: timeit(g_pallas, vecs))

# 6. segmented warmup feasibility: one 15-step HMC window at B=1024
#    through the vmapped path (what a chunked bench would run per call)
from celeste_tpu.inference import hmc_warmup

seg = jax.jit(lambda keys, x0: jax.vmap(
    lambda k, x: hmc_warmup(k, logd, x, n_warmup=15, n_leapfrog=8))(keys, x0))
keys = jax.random.split(jax.random.key(3), B)
try:
    t = time.time()
    out = seg(keys, vecs)
    jax.block_until_ready(out)
    first = time.time() - t
    t = time.time()
    out = seg(keys, vecs)
    jax.block_until_ready(out)
    emit(name="warmup_segment15_B1024", ok=True, first_call_s=round(first, 1),
         exec_s=round(time.time() - t, 1))
except Exception as e:  # noqa: BLE001
    emit(name="warmup_segment15_B1024", ok=False, error=str(e)[:300])

# 7. LAST: synthetic long-running call to pin the execution limit.
#    ~0.3 ms per 1024x1024 matmul step; n chained matmuls ~ n*0.15ms... use
#    a fori_loop count calibrated by a short run, then attempt ~90 s.
def spin(n):
    def body(i, x):
        return jnp.tanh(x @ x) + 1e-6 * i
    return jax.lax.fori_loop(0, n, body, jnp.eye(1024) * 0.5)

spin_j = jax.jit(spin, static_argnums=0)
dt_small = timeit(lambda: spin_j(2000), iters=1)
emit(name="spin_calib", s_per_2000=round(dt_small, 2))
for target_s in (30.0, 90.0):
    n = max(2000, int(2000 * target_s / max(dt_small, 1e-3)))
    try:
        t = time.time()
        jax.block_until_ready(spin_j(n))
        emit(name=f"spin_{int(target_s)}s", ok=True,
             actual_s=round(time.time() - t, 1), n=n)
    except Exception as e:  # noqa: BLE001
        emit(name=f"spin_{int(target_s)}s", ok=False, n=n, error=str(e)[:300])
        break

emit(name="done")
_f.close()
