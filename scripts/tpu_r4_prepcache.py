"""Round-4 TPU session: generate the committed config-5 warm-start
artifacts (celeste_tpu/bench/artifacts/*_prep.npz) and measure the
warm-cache stage walls the bench caps are sized from (VERDICT r3 Next #1).

Run on the real TPU (plain ``python``; axon tunnel).  Results ->
scripts/tpu_r4_prepcache_results.json.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

RES = {"backend": None, "walls_s": {}, "rates": {}}
OUT = os.path.join(_REPO, "scripts", "tpu_r4_prepcache_results.json")


def _save():
    with open(OUT + ".tmp", "w") as fh:
        json.dump(RES, fh, indent=1)
    os.replace(OUT + ".tmp", OUT)


def timed(name, fn):
    t = time.time()
    out = fn()
    dt = time.time() - t
    RES["walls_s"][name] = round(dt, 1)
    print(f"## {name}: {dt:.1f}s", file=sys.stderr, flush=True)
    _save()
    return out


def main():
    t0 = time.time()
    x = jax.random.normal(jax.random.key(0), (512, 512), jnp.float32)
    jnp.sum(x @ x).block_until_ready()
    RES["backend"] = jax.default_backend()
    RES["walls_s"]["init"] = round(time.time() - t0, 1)
    print(f"## init {RES['walls_s']['init']}s backend={RES['backend']}",
          file=sys.stderr, flush=True)

    from celeste_tpu.bench.config5 import (
        build_config5, build_config5_multiband, config5_parity_gap,
        config5_warmup_and_whiten_cached, measure_chees_z, measure_nuts_z,
        prep_cache_path,
    )

    # ---- config 5 single band -------------------------------------------
    logd, logd_dense, vec, _ = timed("build_config5", build_config5)
    gap_abs, gap_rel = timed("config5_parity", lambda: config5_parity_gap(
        logd, logd_dense, vec))
    RES["rates"]["config5_parity_abs"] = gap_abs
    path = prep_cache_path("config5")
    prep = timed("config5_prep_fresh_or_hit",
                 lambda: config5_warmup_and_whiten_cached(logd, vec, path))
    prep = timed("config5_prep_hit",
                 lambda: config5_warmup_and_whiten_cached(logd, vec, path))
    r_nuts, div, depth = timed("config5_nuts", lambda: measure_nuts_z(prep))
    RES["rates"]["config5_nuts_min_ess_s"] = r_nuts
    RES["rates"]["config5_nuts_div"] = div
    r_ch, acc, nl = timed("config5_chees", lambda: measure_chees_z(prep))
    RES["rates"]["config5_chees_min_ess_s"] = r_ch
    RES["rates"]["config5_chees_accept"] = acc
    _save()

    # ---- config 5 multiband ---------------------------------------------
    logd_m, logd_dense_m, vec_m, _ = timed("build_config5_multiband",
                                           build_config5_multiband)
    _, gap_rel_m = timed("multiband_parity", lambda: config5_parity_gap(
        logd_m, logd_dense_m, vec_m))
    RES["rates"]["multiband_parity_rel"] = gap_rel_m
    path_m = prep_cache_path("config5_multiband")
    prep_m = timed("multiband_prep_fresh_or_hit",
                   lambda: config5_warmup_and_whiten_cached(
                       logd_m, vec_m, path_m, init_step_size=0.03))
    prep_m = timed("multiband_prep_hit",
                   lambda: config5_warmup_and_whiten_cached(
                       logd_m, vec_m, path_m, init_step_size=0.03))
    r_mb, acc_mb, _ = timed("multiband_chees", lambda: measure_chees_z(
        prep_m, n_steps=192, run_segment=48, warmup_iters=60,
        warmup_window=20))
    RES["rates"]["multiband_chees_min_ess_s"] = r_mb
    _save()
    print(json.dumps(RES))


if __name__ == "__main__":
    main()
