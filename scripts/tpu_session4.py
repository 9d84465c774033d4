"""TPU bisect session 4: why does the config-5 tiled warmup device-fault
at 1024 chains when 64 chains passes (sessions 3e/3f, bench 2026-08-16)?

Probes run safest-first in ONE process, each result flushed to
``tpu_session4_results.json`` BEFORE the next probe starts, so a device
fault pins the culprit exactly (DESIGN.md §3: failed executions wedge the
axon device for the rest of the process — everything after the first
failure is suspect).

Hypotheses this session discriminates:
  H1 memory: the vmapped scan-VJP backward's [B, C, PIX] intermediates
     scale with chains; AOT ``memory_analysis()`` shows the cliff without
     executing anything.
  H2 tunnel execution timeout: warmup wall time scales linearly in chains
     (serial VPU work); the ~5x jump 256->1024 crosses a per-call limit.
     Timings at 128/256/512 extrapolate the 1024 cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_session4_results.json")
_f = open(RESULTS, "w")


def emit(**kw):
    _f.write(json.dumps(kw) + "\n")
    _f.flush()
    print(kw, file=sys.stderr)


import numpy as np
import jax
import jax.numpy as jnp

emit(name="device_sanity",
     value=float(jnp.sum(jnp.ones((128, 128))).block_until_ready()),
     backend=jax.default_backend())

from celeste_tpu.bench.config5 import build_config5
from celeste_tpu.inference import hmc_warmup

logd, logd_dense, vec, info = build_config5()
d = int(vec.shape[0])
emit(name="scene_built", d=d)


def warmup_fn(n_chains, n_warmup=150):
    def f(keys, x0):
        return jax.vmap(
            lambda k, x: hmc_warmup(k, logd, x, n_warmup=n_warmup,
                                    n_leapfrog=8))(keys, x0)
    keys = jax.random.split(jax.random.key(3), n_chains)
    x0 = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1),
                                                 (n_chains, d))
    return f, keys, x0


# ---- probe 1 (H1): AOT memory analysis at 1024 chains, no execution ----
try:
    f, keys, x0 = warmup_fn(1024)
    t = time.time()
    compiled = jax.jit(f).lower(keys, x0).compile()
    ma = compiled.memory_analysis()
    emit(name="memory_analysis_1024",
         compile_s=round(time.time() - t, 1),
         temp_bytes=getattr(ma, "temp_size_in_bytes", None),
         argument_bytes=getattr(ma, "argument_size_in_bytes", None),
         output_bytes=getattr(ma, "output_size_in_bytes", None),
         generated_code_bytes=getattr(ma, "generated_code_size_in_bytes", None))
except Exception as e:  # noqa: BLE001
    emit(name="memory_analysis_1024", ok=False, error=str(e)[:500])

# ---- probes 2-5 (H2): execute at rising chain counts, time each ----
for n in (128, 256, 512, 1024):
    try:
        f, keys, x0 = warmup_fn(n)
        jf = jax.jit(f)
        t = time.time()
        out = jf(keys, x0)
        jax.block_until_ready(out)
        dt = time.time() - t
        # second call = pure execution (compile cached)
        t = time.time()
        out = jf(keys, x0)
        jax.block_until_ready(out)
        emit(name=f"warmup_{n}", ok=True, first_call_s=round(dt, 1),
             exec_s=round(time.time() - t, 1),
             step_size=float(jnp.median(out[1])))
    except Exception as e:  # noqa: BLE001
        emit(name=f"warmup_{n}", ok=False, error=str(e)[:500])
        break

emit(name="done")
_f.close()
