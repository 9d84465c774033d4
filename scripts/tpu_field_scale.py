"""Survey-scale field pipeline on the real TPU (VERDICT r4 Next #5).

Runs the shared 256x1024 ~60-source scene (celeste_tpu.bench.field_scale)
through the FULL pipeline — detect -> classify -> MAP -> joint group
sampling — on the axon chip, gates the photoObj-style accuracy report
(incl. the posterior z-RMS calibration band that is too expensive for
the 1-core CPU test lane: ~25 min there, seconds of device time here),
records a field-scale throughput metric into the regression history, and
writes ``scripts/tpu_field_scale_results.json``.  The committed artifact
is then asserted by ``tests/test_field.py::test_field_scale_accuracy``,
so regenerating it with a miscalibrated sampler fails the CPU lane.

Run: ``python scripts/tpu_field_scale.py`` (plain env = axon TPU;
budget ~5 min tunnel init).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    from celeste_tpu.bench.field_scale import (
        accuracy_report, make_survey_scene, survey_scene_cfg,
    )
    from celeste_tpu.field import run_field_pipeline
    from celeste_tpu.model.priors import FluxPrior, SourcePriors

    t0 = time.time()
    (jnp.zeros((8, 8)) + 1.0).block_until_ready()
    x = jax.random.normal(jax.random.key(0), (512, 512), jnp.float32)
    jnp.sum(x @ x).block_until_ready()
    init_s = time.time() - t0
    print(f"# tunnel init {init_s:.0f}s, backend {jax.default_backend()}",
          file=sys.stderr)

    scene, srcs = make_survey_scene()
    # segmented sampling keeps each device call under the axon kill edge
    cfg = survey_scene_cfg(sample=True, sample_segment=32, warmup_window=16)
    t1 = time.time()
    cat, art = run_field_pipeline(
        scene.stamps[0], band=0, n_bands=1, cfg=cfg,
        priors=SourcePriors(flux=FluxPrior(log_ref_mean=3.2, log_ref_std=2.0)))
    wall = time.time() - t1
    rep = accuracy_report(cat, scene, srcs)
    srcs_per_sec = len(cat) / wall

    result = {
        "backend": jax.default_backend(),
        "tunnel_init_s": round(init_s, 1),
        "pipeline_wall_s": round(wall, 1),
        "n_sources_catalog": len(cat),
        "n_truth": len(srcs),
        "n_groups": art["n_groups"],
        "sources_per_sec": round(srcs_per_sec, 3),
        "diagnostics_worst": {
            "rhat_max": max(d["rhat_max"] for d in art["diagnostics"]),
            "divergence_max": max(d["divergence_rate"]
                                  for d in art["diagnostics"]),
        } if art.get("diagnostics") else None,
        "accuracy": {k: (None if v is None else float(v) if np.isscalar(v)
                         else v)
                     for k, v in rep.items()
                     if k in ("completeness", "purity", "kind_accuracy",
                              "pos_rms_arcsec", "flux_rel_bias",
                              "pos_z_rms", "flux_z_rms", "n_matched")},
    }
    print(json.dumps(result, indent=1))

    # the accuracy gates the CPU lane asserts against this artifact
    ok = (result["accuracy"]["completeness"] >= 0.9
          and result["accuracy"]["purity"] >= 0.9
          and 0.7 <= result["accuracy"]["pos_z_rms"] <= 1.4
          and 0.7 <= result["accuracy"]["flux_z_rms"] <= 1.4)
    result["gates_ok"] = bool(ok)
    out = os.path.join(_REPO, "scripts", "tpu_field_scale_results.json")
    if not ok:
        print("# GATES FAILED — NOT writing the committed artifact",
              file=sys.stderr)
        with open(out + ".failed", "w") as fh:
            json.dump(result, fh, indent=1)
        raise SystemExit(1)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)

    if jax.default_backend() == "tpu":
        from celeste_tpu.bench.regression import check_regression
        ok_r, ref = check_regression(
            "field pipeline sources/sec (256x1024 survey scene)",
            srcs_per_sec, "tpu", update=True)
        print(f"# history: field sources/sec {srcs_per_sec:.3f} "
              f"(median {ref}, ok={ok_r})", file=sys.stderr)


if __name__ == "__main__":
    main()
