"""Measure the NumPy-oracle photo-z throughput on the EXACT config-4 bench
workload (the honest denominator for the photo-z targets/s ratio — the
same role scripts/oracle_config5_bench.py plays for config 5).

Workload: the first few targets of bench.py's ``_bench_photoz_batch``
generation recipe (seed 17, Dirichlet template weights, z ~ U(0.5, 4),
3% photometric errors, the shipped default basis and SDSS-like filters),
run through slice-within-parallel-tempering (the reference's sampler
family, oracle/photoz.py) with the SAME ladder shape the TPU bench uses:
6 temperatures, 400 sampling steps after 150 warmup.  The oracle is
charged no burn-in tuning (fixed slice widths) and targets are processed
sequentially — the 2014-era reference's execution model.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/oracle_photoz_bench.py
Writes scripts/oracle_photoz_results.json; bench.py reads
``targets_per_sec`` as ORACLE_PHOTOZ_RATE for the bench's
``photoz_vs_oracle`` field.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_targets=4, n_temps=6, n_steps=400, n_warmup=150):
    # target generation EXACTLY as bench.py _bench_photoz_batch (seed 17)
    import jax
    import jax.numpy as jnp

    from celeste_tpu.oracle.photoz import (
        geometric_betas, oracle_photoz_logprob, oracle_photoz_pt,
    )
    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photometry import project_to_bands

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    rng = np.random.default_rng(17)
    z_true = rng.uniform(0.5, 4.0, n_targets)
    ws = rng.dirichlet(np.ones(basis.n_basis), size=n_targets)
    f_clean = np.asarray(jax.jit(jax.vmap(
        lambda w, z: project_to_bands(basis, filters, w, 2.0, z)
    ))(jnp.asarray(ws, jnp.float32), jnp.asarray(z_true, jnp.float32)))
    flux, err = [], []
    for i in range(n_targets):
        e = 0.03 * np.abs(f_clean[i]) + 1e-5
        flux.append(f_clean[i] + rng.normal(size=e.shape) * e)
        err.append(e)

    lam_rest = np.asarray(basis.lam_rest, float)
    b = np.asarray(basis.b, float)
    filt_lam = np.asarray(filters.lam, float)
    filt_weight = np.asarray(filters.resp * filters.lam * filters.dlam,
                             float)
    k = b.shape[0]
    d = k + 1
    betas = geometric_betas(n_temps, 0.02)
    widths = np.full(d, 1.0)
    z_max = 6.0

    srng = np.random.default_rng(5)
    z_est, t0 = [], time.time()
    for i in range(n_targets):
        lp = lambda v: oracle_photoz_logprob(  # noqa: E731
            v, lam_rest, b, filt_lam, filt_weight, flux[i], err[i],
            z_max=z_max)
        x0s = srng.normal(size=(n_temps, d)) * np.asarray(
            [2.0] + [1.0] * (k - 1) + [1.0])
        cold, _ = oracle_photoz_pt(lp, x0s, betas, n_warmup + n_steps,
                                   widths, srng)
        kept = cold[n_warmup:]
        z = z_max / (1.0 + np.exp(-kept[:, 0]))
        z_est.append(float(np.median(z)))
        print(f"# target {i}: z_true {z_true[i]:.2f} -> z_med "
              f"{z_est[-1]:.2f} ({time.time() - t0:.0f}s cum)",
              file=sys.stderr)
    wall = time.time() - t0

    rec = {
        "targets_per_sec": n_targets / wall,
        "sec_per_target": wall / n_targets,
        "wall_s": wall,
        "n_targets": n_targets,
        "n_temps": n_temps,
        "n_steps": n_steps,
        "n_warmup": n_warmup,
        "z_true": [float(z) for z in z_true],
        "z_median": z_est,
        "z_recovery_frac": float(np.mean(
            np.abs(np.asarray(z_est) - z_true) < 0.25)),
        "note": ("NumPy slice-within-PT, sequential targets, single CPU "
                 "core; same ladder shape and target-generation recipe as "
                 "bench.py's photoz stage"),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "oracle_photoz_results.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
