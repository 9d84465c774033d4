"""Round-4 TPU session: photo-z batch-throughput scaling (BASELINE config
4 at production batch sizes).  The bench pins N=256 for history
comparability; this measures how far one chip actually goes — N in
{256, 512, 1024} independent 6-temp tempered ladders, full-wall AND
steady-state (compile-amortized) throughput, with the z-recovery gate.

Run on the real TPU.  Results -> scripts/tpu_photoz_scaling_results.json.
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

OUT = os.path.join(_REPO, "scripts", "tpu_photoz_scaling_results.json")
RES = {"backend": None, "init_s": None, "batches": []}


def _save():
    with open(OUT + ".tmp", "w") as fh:
        json.dump(RES, fh, indent=1)
    os.replace(OUT + ".tmp", OUT)


def make_targets(basis, filters, n, seed=17):
    from celeste_tpu.quasar.photometry import project_to_bands

    rng = np.random.default_rng(seed)
    z_true = rng.uniform(0.5, 4.0, n)
    ws = rng.dirichlet(np.ones(basis.n_basis), size=n)
    f_clean = np.asarray(jax.jit(jax.vmap(
        lambda w, z: project_to_bands(basis, filters, w, 2.0, z)
    ))(jnp.asarray(ws, jnp.float32), jnp.asarray(z_true, jnp.float32)))
    err = 0.03 * np.abs(f_clean) + 1e-5
    flux = f_clean + rng.normal(size=err.shape) * err
    return (flux.astype(np.float32), err.astype(np.float32), z_true)


def main():
    t0 = time.time()
    x = jax.random.normal(jax.random.key(0), (512, 512), jnp.float32)
    jnp.sum(x @ x).block_until_ready()
    RES["backend"] = jax.default_backend()
    RES["init_s"] = round(time.time() - t0, 1)
    print(f"## init {RES['init_s']}s", file=sys.stderr, flush=True)

    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, run_photo_z_batch_segmented,
    )

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    cfg = PhotoZConfig(n_temps=6, n_steps=400, n_warmup=150, n_systems=1,
                       inner="hmc_adaptive")
    for n in (256, 512, 1024):
        flux, err, z_true = make_targets(basis, filters, n)
        t = time.time()
        out = run_photo_z_batch_segmented(jax.random.key(5), basis, filters,
                                          flux, err, cfg, segment_steps=100)
        jax.block_until_ready(out["z"])
        dt = time.time() - t
        z_med = np.median(np.asarray(out["z"]).reshape(n, -1), axis=1)
        recov = float(np.mean(np.abs(z_med - z_true) < 0.25))
        seg_s = out["timings"]["segment_s"]
        n_seg = -(-cfg.n_steps // 100)
        steady = (n / (np.mean(seg_s[1:]) * n_seg)) if len(seg_s) >= 2 else None
        row = {"n": n, "wall_s": round(dt, 2),
               "init_s": round(out["timings"]["init_s"], 2),
               "segment_s": [round(s, 2) for s in seg_s],
               "targets_per_sec": round(n / dt, 2),
               "targets_per_sec_steady": round(steady, 1) if steady else None,
               "z_recovery": recov}
        RES["batches"].append(row)
        print(f"## N={n}: {dt:.1f}s wall, {n / dt:.1f} t/s "
              f"(steady {steady:.0f}), recovery {recov:.3f}",
              file=sys.stderr, flush=True)
        _save()
    print(json.dumps(RES))


if __name__ == "__main__":
    main()
