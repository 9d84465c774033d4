"""The bench's parent/child supervisor contract (VERDICT r2 Missing #1):
``python bench.py`` must ALWAYS exit 0 with exactly one JSON line on
stdout — including when the child wedges inside a device call or a
GIL-holding XLA compile, where a same-process watchdog thread provably
cannot fire (measured 2026-08-17: a 3000 s-budget run blew through its
watchdog inside a multiband compile and died on the outer ``timeout``).

These run the REAL bench.py as a subprocess the way the driver does,
on CPU with budgets tiny enough that every stage is skipped.
"""

import json
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=180, state_path=None):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               **extra_env)
    env.pop("CELESTE_BENCH_CHILD", None)
    if state_path is not None:
        # keep killed-subprocess state litter out of the repo root
        env["CELESTE_BENCH_STATE"] = str(state_path)
    return subprocess.run([sys.executable, BENCH], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def test_normal_path_emits_one_parseable_line(tmp_path):
    p = _run({"CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             state_path=tmp_path / "state.json")
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "single-stamp likelihood evals/sec/chip"
    assert set(rec["stages_skipped"]) >= {"evals", "config5_tiled"}
    assert rec["tunnel_init_s"] is not None
    assert rec["bench_wall_s"] is not None


def test_sigterm_emits_snapshot_before_dying(tmp_path):
    """The driver wraps the bench in ``timeout`` (SIGTERM then SIGKILL): if
    its window is ever shorter than the bench deadline, the parent must
    still print the snapshot as the one stdout line."""
    import time

    state = str(tmp_path / "state.json")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               CELESTE_BENCH_WEDGE="1", CELESTE_BENCH_HARD_CAP_S="600",
               CELESTE_BENCH_STAGE_BUDGET_S="500",
               CELESTE_BENCH_STATE=state)
    env.pop("CELESTE_BENCH_CHILD", None)
    p = subprocess.Popen([sys.executable, BENCH], env=env, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        # wait for init to land in the state file, then deliver the TERM
        deadline = time.time() + 120
        while time.time() < deadline and not os.path.exists(state):
            time.sleep(0.5)
        assert os.path.exists(state), "child never wrote its state file"
        p.terminate()
        out, err = p.communicate(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, err[-2000:]
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines}"
    rec = json.loads(lines[0])
    assert rec["tunnel_init_s"] is not None
    assert rec["bench_wall_s"] is not None


def test_stage_cap_bounds_a_greedy_stage(tmp_path, monkeypatch):
    """Per-stage hard caps (VERDICT r3 Next #1a): a stage whose segmented
    loop keeps polling the deadline must be stopped at ITS cap, not at the
    global budget — round 3's config5 stage legally ate 414 s of the 420 s
    budget and cost the record six metrics."""
    import importlib.util
    import time

    monkeypatch.setenv("CELESTE_BENCH_STATE", str(tmp_path / "state.json"))
    spec = importlib.util.spec_from_file_location("bench_cap_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.BUDGET_S = 10_000.0

    walls = {}

    def greedy():
        t0 = time.monotonic()
        # the segmented-loop pattern: bounded work, deadline check between
        while bench._stage_remaining() > 0.0:
            time.sleep(0.02)
        walls["greedy"] = time.monotonic() - t0

    bench._stage("greedy", greedy, est_s=0, cap_s=0.5)
    assert 0.4 < walls["greedy"] < 3.0, walls
    assert bench._STAGE_END is None  # cap cleared even on normal exit

    seen = {}
    bench._stage("peek", lambda: seen.update(rem=bench._stage_remaining()),
                 est_s=0)
    assert seen["rem"] > 5_000.0  # uncapped stage sees the global budget


def _load_bench(monkeypatch, tmp_path):
    import importlib.util

    monkeypatch.setenv("CELESTE_BENCH_STATE", str(tmp_path / "state.json"))
    spec = importlib.util.spec_from_file_location("bench_retry_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.BUDGET_S = 10_000.0
    return bench


def test_stage_retries_once_on_transient_tunnel_fault(tmp_path, monkeypatch):
    """A transient axon RPC fault (measured 2026-08-20: `remote_compile:
    read body: response body closed` killed the config5 NUTS arm) must cost
    one retry, not the stage's metrics."""
    bench = _load_bench(monkeypatch, tmp_path)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
                "response body closed before all bytes were read")
        bench.RESULT["value"] = 42.0

    bench._stage("flaky", flaky, est_s=0, cap_s=5)
    assert calls["n"] == 2
    assert bench.RESULT["value"] == 42.0
    assert "flaky" not in bench.RESULT["stages_skipped"]


def test_stage_does_not_retry_real_errors(tmp_path, monkeypatch):
    bench = _load_bench(monkeypatch, tmp_path)
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("shape mismatch: deterministic bug")

    bench._stage("broken", broken, est_s=0, cap_s=5)
    assert calls["n"] == 1  # deterministic faults must not be retried


def test_retry_transient_helper_budget_gate(tmp_path, monkeypatch):
    """_retry_transient only retries while the stage has budget left."""
    bench = _load_bench(monkeypatch, tmp_path)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: Socket closed")

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        bench._retry_transient(flaky, "arm", min_s=20.0)
    assert calls["n"] == 2  # plenty of budget: one retry happened

    calls["n"] = 0
    bench.BUDGET_S = 0.0  # exhausted: no retry
    with _pytest.raises(RuntimeError):
        bench._retry_transient(flaky, "arm", min_s=20.0)
    assert calls["n"] == 1


def test_preinit_hang_triggers_cooldown_respawn(tmp_path):
    """The tunnel-attach hang (DESIGN.md §9, observed 2026-08-21: child
    blocked in the first RPC forever, state file never written) must cost
    one cooled-down respawn, not the whole record.  The first child wedges
    before init; the parent's init watchdog kills it, cools down, and the
    respawned child completes normally (stages est-skipped on the tiny
    leftover budget)."""
    p = _run({"CELESTE_BENCH_WEDGE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_INIT_WATCHDOG_S": "3",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              # generous parent deadline + a pinned tiny child budget:
              # child STARTUP (~15-40 s import under load) is a fixed cost,
              # so a compressed deadline races it flakily
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "150",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             state_path=tmp_path / "state.json")
    assert p.returncode == 0, p.stderr[-2000:]
    assert "respawning once" in p.stderr
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines}"
    rec = json.loads(lines[0])
    # the SECOND child ran: init landed, and the record is parseable
    assert rec["tunnel_init_s"] is not None
    assert rec["bench_wall_s"] is not None


def test_preinit_crash_triggers_cooldown_respawn(tmp_path):
    """A child that dies before writing any state (transient attach/import
    failure) is the same failure class: one cooled-down retry."""
    p = _run({"CELESTE_BENCH_CRASH_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "150",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             state_path=tmp_path / "state.json")
    assert p.returncode == 0, p.stderr[-2000:]
    assert "respawning once" in p.stderr
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["tunnel_init_s"] is not None


@pytest.mark.slow
def test_wedged_child_is_killed_and_partial_record_emitted(tmp_path):
    p = _run({"CELESTE_BENCH_WEDGE": "1",
              "CELESTE_BENCH_HARD_CAP_S": "8",
              "CELESTE_BENCH_STAGE_BUDGET_S": "5"},
             state_path=tmp_path / "state.json")
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    # the snapshot carries whatever completed before the wedge (here: init)
    assert rec["tunnel_init_s"] is not None
    assert "killing child" in p.stderr
