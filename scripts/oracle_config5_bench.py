"""Measure the NumPy-oracle slice-sampler ESS/sec on the EXACT BASELINE
config-5 scene (VERDICT r2 Missing #2 / Next #2: the headline config-5
ratios previously borrowed the easier 6-star D=18 field's denominator of
6.0 ESS/s; this script gives config-5-as-written its own measured
denominator).

Target: the 12-source mixed field from ``celeste_tpu.bench.config5``
(10 stars + 2 galaxies, 48x128 r-band stamp, D = 10*3 + 2*7 = 44),
sampled in the SAME unconstrained parameterization the rebuild uses
(du arcsec offsets, log flux, logit theta, log sigma, logit ab, phi),
with the exp/sigmoid log-det-Jacobian terms so the unconstrained target
is proper.  Weak priors are omitted: the sources are bright and the
posterior is likelihood-dominated (documented in BASELINE.md); the
likelihood evaluation is the pure-NumPy oracle forward model, i.e. the
2014-era reference's compute style (pixel-vectorized NumPy, Python loops
over sources/components).

Sampler: coordinate-wise stepping-out slice sampling (oracle/samplers.py,
Neal 2003) started at the ground truth (treated as converged — this
FAVORS the oracle: no burn-in is charged to it).

Run on CPU:  JAX_PLATFORMS=cpu python scripts/oracle_config5_bench.py
Writes scripts/oracle_config5_results.json; the measured min ESS/sec is
recorded in BASELINE.md and used by bench.py as ORACLE_CONFIG5_ESS_RATE.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_steps=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from celeste_tpu.bench.config5 import build_config5
    from celeste_tpu.inference.diagnostics import ess
    from celeste_tpu.oracle.forward import (
        oracle_poisson_loglik,
        oracle_scene_lambda,
    )
    from celeste_tpu.oracle.samplers import oracle_slice_sample

    _, _, vec, info = build_config5()
    kinds = info["scene"].kinds
    wcs = info["wcs"]
    ost = info["oracle_stamp"]
    counts = ost["counts"]
    vec = np.asarray(vec, np.float64)

    def sigmoid(t):
        return 1.0 / (1.0 + np.exp(-t))

    def logprob(x):
        """Oracle posterior in unconstrained coords: NumPy Poisson loglik
        of the 12-source scene + log-det-Jacobians of the bijections."""
        sources = []
        ljd = 0.0
        off = 0
        for kind in kinds:
            du = x[off:off + 2]
            u = np.asarray(wcs.duas2equa(du), np.float64)
            lf = x[off + 2]
            ljd += lf                       # d flux / d log flux
            if kind == "star":
                sources.append({"type": "star", "u": u, "flux": np.exp(lf)})
                off += 3
            else:
                t, s, a, phi = x[off + 3:off + 7]
                # logit/exp Jacobians (theta, sigma, ab)
                ljd += (np.log(sigmoid(t)) + np.log(sigmoid(-t)) + s
                        + np.log(sigmoid(a)) + np.log(sigmoid(-a)))
                sources.append({
                    "type": "galaxy", "u": u, "flux": np.exp(lf),
                    "theta_dev": sigmoid(t), "sigma": np.exp(s),
                    "ab": sigmoid(a), "phi": phi,
                })
                off += 7
        lam = oracle_scene_lambda(sources, ost)
        return oracle_poisson_loglik(lam, counts) + ljd

    d = vec.size
    assert d == 44, d

    # per-eval cost (the honest unit the reference pays per density call)
    logprob(vec)
    t0 = time.time()
    n_probe = 20
    for _ in range(n_probe):
        logprob(vec)
    eval_ms = (time.time() - t0) / n_probe * 1e3
    print(f"# oracle config5 eval: {eval_ms:.2f} ms", file=sys.stderr)

    # slice widths in the unconstrained space: ~posterior-scale steps
    widths = []
    for kind in kinds:
        widths += [0.2, 0.2, 0.1] if kind == "star" else \
                  [0.2, 0.2, 0.1, 0.5, 0.2, 0.5, 0.5]
    widths = np.asarray(widths)

    if n_steps is None:
        # bound the run: ~44 coords * ~6 evals each per step
        est_step_s = eval_ms / 1e3 * d * 6
        n_steps = int(max(150, min(400, 1500 / est_step_s)))
    print(f"# running {n_steps} slice steps (D={d})", file=sys.stderr)

    rng = np.random.default_rng(0)
    t0 = time.time()
    samples = oracle_slice_sample(logprob, vec, n_steps, widths, rng)
    wall = time.time() - t0

    e = np.asarray(ess(samples[None]))          # single chain
    rec = {
        "scene": "config5 (12 src mixed, 48x128, D=44)",
        "sampler": "oracle coordinate slice (Neal 2003), NumPy forward",
        "n_steps": n_steps,
        "wall_s": round(wall, 1),
        "eval_ms": round(eval_ms, 3),
        "ess_min": float(e.min()),
        "ess_median": float(np.median(e)),
        "ess_per_sec_min": float(e.min() / wall),
        "ess_per_sec_median": float(np.median(e) / wall),
        "steps_per_sec": n_steps / wall,
    }
    print(json.dumps(rec, indent=2))
    out = os.path.join(os.path.dirname(__file__), "oracle_config5_results.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
