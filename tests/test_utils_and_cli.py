"""Aux subsystems (SURVEY.md §5): checkpoint exact-resume, JSONL metrics,
guards, profiling harness, and the experiment CLI."""

import io
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.inference import mh_init, mh_kernel, run_chains_ensemble
from celeste_tpu.utils import (
    MetricsLogger,
    checked_logdensity,
    load_checkpoint,
    save_checkpoint,
    timed,
)


def _target(x):
    return -0.5 * jnp.sum(x * x)


def test_checkpoint_exact_resume(tmp_path):
    """save -> load -> continue == uninterrupted run, bitwise."""
    kern = mh_kernel(_target, step_scales=jnp.full(2, 0.5))
    x0 = jax.random.normal(jax.random.key(0), (4, 2))
    init = jax.vmap(lambda x: mh_init(x, _target))(x0)

    key = jax.random.key(42)
    k1, k2 = jax.random.split(key)
    # uninterrupted: 20 then 20 more
    s_a, mid, _ = run_chains_ensemble(k1, kern, init, n_steps=20)
    s_b, fin, _ = run_chains_ensemble(k2, kern, mid, n_steps=20)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, mid, step=20)
    loaded, step, _ = load_checkpoint(path, mid)
    assert step == 20
    s_b2, fin2, _ = run_chains_ensemble(k2, kern, loaded, n_steps=20)
    np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_b2))
    np.testing.assert_array_equal(np.asarray(fin.x), np.asarray(fin2.x))


def test_metrics_jsonl():
    buf = io.StringIO()
    logger = MetricsLogger(stream=buf)
    logger.log("window", step=10, accept=0.42, means=jnp.asarray([1.0, 2.0]))
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "window" and rec["accept"] == 0.42
    assert rec["means"] == [1.0, 2.0]


def test_device_log_from_jit():
    from celeste_tpu.utils import metrics as m
    buf = io.StringIO()
    m._DEFAULT_LOGGER = MetricsLogger(stream=buf)

    @jax.jit
    def f(x):
        m.device_log("inner", val=jnp.sum(x))
        return x * 2

    f(jnp.ones(3)).block_until_ready()
    jax.effects_barrier()
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "inner" and rec["val"] == 3.0
    m._DEFAULT_LOGGER = None


def test_checked_logdensity_catches_nan():
    bad = lambda x: jnp.log(x[0])  # NaN for negative input
    _, run = checked_logdensity(bad)
    assert np.isfinite(float(run(jnp.asarray([2.0]))))
    with pytest.raises(Exception):
        run(jnp.asarray([-1.0]))


def test_timed_harness():
    f = jax.jit(lambda x: jnp.sum(x * x))
    dt, out = timed(f, jnp.ones(128), iters=3)
    assert dt > 0 and np.isfinite(float(out))


def test_cli_star_single(tmp_path):
    from celeste_tpu.run import main
    out = str(tmp_path / "res")
    res = main([f"config=star_single", "n_chains=8", "n_steps=200", f"out={out}"])
    assert np.all(np.isfinite(res["mean"]))
    assert os.path.exists(out) or os.path.exists(out + ".npz")
    metrics = open(out + ".metrics.jsonl").read().strip().splitlines()
    events = [json.loads(l)["event"] for l in metrics]
    assert events[0] == "start" and events[-1] == "done"


def test_cli_unknown_config():
    from celeste_tpu.run import main
    with pytest.raises(SystemExit):
        main(["config=nope"])


def test_cli_unknown_key():
    from celeste_tpu.run import main
    with pytest.raises(SystemExit):
        main(["config=star_single", "bogus_key=1"])


@pytest.mark.slow
def test_cli_field_survey_map_scan(tmp_path):
    """`config=field_survey sample=False` is the fast survey scan: the full
    256x1024 ~60-source frame through detect -> classify -> MAP with the
    photoObj-style accuracy report attached (celeste_tpu.bench.field_scale;
    VERDICT r4 Next #5 surfaced through the CLI)."""
    from celeste_tpu.run import main
    out = str(tmp_path / "survey")
    res = main(["config=field_survey", "sample=False", f"out={out}"])
    rep = res["accuracy"]
    assert rep["completeness"] >= 0.9 and rep["purity"] >= 0.9
    assert len(res["kinds"]) >= 50
    assert os.path.exists(out + ".npz") or os.path.exists(out)
