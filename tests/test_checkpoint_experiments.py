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

    # resuming a completed run exits with a clear message
    with pytest.raises(SystemExit):
        main(["config=star_single", "n_chains=6", "n_steps=200",
              "checkpoint_every=100", f"resume={out1}.ckpt.npz",
              f"out={str(tmp_path / 'c')}"])


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
