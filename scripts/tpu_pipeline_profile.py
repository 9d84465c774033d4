"""Per-phase wall profile of the bench pipeline stage on the TPU.

The r4 rehearsals measured the pipeline stage at 247-288 s wall in a
fresh process (vs ~60 s in-process-warm during the rehearsal-4 session),
which would starve the last bench stage.  This script runs the EXACT
bench workload twice in one process with a timestamped metrics stream,
separating fresh-process costs (executable deserialization, first
dispatches) from steady in-process cost, and attributing wall to
pipeline phases (detect / classify / type_switch / sample).

Writes scripts/tpu_pipeline_profile_results.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


class PhaseLogger:
    """MetricsLogger-compatible stream capturing wall per event."""

    def __init__(self):
        self.events = []
        self.t0 = time.time()

    def log(self, event, **kw):
        self.events.append((event, round(time.time() - self.t0, 2)))
        print(f"#   {time.time() - self.t0:7.1f}s  {event} {kw}",
              file=sys.stderr, flush=True)


def run_once(label):
    from celeste_tpu.data.synthetic import (
        galaxy_source, make_synthetic_stamp, star_source,
    )
    from celeste_tpu.model.priors import FluxPrior, SourcePriors
    from celeste_tpu.pipeline import PipelineConfig, run_pipeline

    cosd = np.cos(np.deg2rad(10.0))
    srcs = [
        star_source(u=(30.0 - 3.5 / 3600 / cosd, 10.0 - 2.0 / 3600), flux_r=35.0),
        star_source(u=(30.0 + 3.0 / 3600 / cosd, 10.0 + 2.5 / 3600), flux_r=25.0),
        galaxy_source(u=(30.0, 10.0), flux_r=70.0, sigma=1.8, ab=0.6),
    ]
    scene = make_synthetic_stamp(srcs, shape=(33, 33), bands=(2,), seed=101)
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0))
    cfg = PipelineConfig(max_sources=5, n_chains=32, n_warmup=80, n_steps=160,
                         map_steps=150, seed=3, detection_min_separation=7)
    lg = PhaseLogger()
    t = time.time()
    catalog, artifacts = run_pipeline(scene.stamps[0], band=0, n_bands=1,
                                      cfg=cfg, priors=priors, logger=lg)
    dt = time.time() - t
    print(f"# {label}: {dt:.1f}s wall, {artifacts['n_sources']} sources",
          file=sys.stderr, flush=True)
    return {"label": label, "wall_s": round(dt, 1), "events": lg.events,
            "n_sources": artifacts["n_sources"]}


def main():
    t0 = time.time()
    jax.block_until_ready(jax.numpy.zeros(()) + 1)
    init_s = time.time() - t0
    print(f"# tunnel init {init_s:.0f}s", file=sys.stderr, flush=True)
    out = {"init_s": round(init_s, 1), "backend": jax.default_backend(),
           "runs": [run_once("fresh-process"), run_once("in-process-warm")]}
    path = os.path.join(os.path.dirname(__file__),
                        "tpu_pipeline_profile_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["runs"]))


if __name__ == "__main__":
    main()
