"""The bench's parent/child supervisor contract (VERDICT r2 Missing #1,
rebuilt round 5 per VERDICT r4 Next #1): ``python bench.py`` must ALWAYS
exit 0 with exactly one JSON line on stdout — including when the child
wedges inside a device call or a GIL-holding XLA compile, where a
same-process watchdog thread provably cannot fire (measured 2026-08-17: a
3000 s-budget run blew through its watchdog inside a multiband compile and
died on the outer ``timeout``), and including the tunnel-attach hang that
cost round 4 its entire driver record (first child hung pre-init, 180 s
cooldown respawn hung again, record all-null at 831 s).

These run the REAL bench.py as a subprocess the way the driver does,
on CPU with budgets tiny enough that every stage is skipped.  Timescales
are compressed via the same env knobs the driver path reads.
"""

import json
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _base_env(tmp_path, extra_env):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    # keep hazard telemetry + killed-subprocess state litter out of the
    # repo; overtime off unless a test opts in
    env.update({"CELESTE_BENCH_ATTACH_LOG": str(tmp_path / "attach_log.jsonl"),
                "CELESTE_BENCH_STATE": str(tmp_path / "state.json"),
                "CELESTE_BENCH_OVERTIME_S": "0"})
    env.update(extra_env)
    env.pop("CELESTE_BENCH_CHILD", None)
    return env


def _run(extra_env, tmp_path, timeout=180):
    return subprocess.run([sys.executable, BENCH],
                          env=_base_env(tmp_path, extra_env), cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def _one_record(p):
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines}"
    return json.loads(lines[0])


def test_normal_path_emits_one_parseable_line(tmp_path):
    p = _run({"CELESTE_BENCH_STAGE_BUDGET_S": "1"}, tmp_path)
    rec = _one_record(p)
    assert rec["metric"] == "single-stamp likelihood evals/sec/chip"
    assert set(rec["stages_skipped"]) >= {"evals", "config5_tiled"}
    assert rec["tunnel_init_s"] is not None
    assert rec["bench_wall_s"] is not None
    assert rec["supervisor"]["spawns"] == 1
    assert rec["supervisor"]["hangs"] == []
    # hazard telemetry: spawn + init_done + emit all logged
    events = [json.loads(ln)["event"]
              for ln in open(tmp_path / "attach_log.jsonl")]
    assert {"spawn", "init_done", "emit"} <= set(events)


def test_sigterm_emits_snapshot_before_dying(tmp_path):
    """The driver wraps the bench in ``timeout`` (SIGTERM then SIGKILL): if
    its window is ever shorter than the bench deadline, the parent must
    still print the snapshot as the one stdout line."""
    import time

    state = str(tmp_path / "state.json")
    env = _base_env(tmp_path, {"CELESTE_BENCH_WEDGE": "1",
                               "CELESTE_BENCH_HARD_CAP_S": "600",
                               "CELESTE_BENCH_STAGE_BUDGET_S": "500"})
    p = subprocess.Popen([sys.executable, BENCH], env=env, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        # the state file is phase-stamped from the child's first lines now;
        # wait for INIT to land in it, then deliver the TERM
        deadline = time.time() + 120
        init_done = False
        while time.time() < deadline and not init_done:
            try:
                with open(state) as fh:
                    init_done = json.load(fh).get("tunnel_init_s") is not None
            except Exception:  # noqa: BLE001 — not written yet / mid-swap
                pass
            time.sleep(0.5)
        assert init_done, "child never recorded tunnel init in its state"
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


def test_preinit_hang_self_detects_and_respawns(tmp_path):
    """The tunnel-attach hang (DESIGN.md §9, observed 2026-08-21: child
    blocked in the first RPC forever, ~0 CPU).  A hung RPC read does not
    hold the GIL, so the CHILD's heartbeat thread detects the stalled init
    phase itself and exits rc=17; the parent cools down and respawns with
    the stage shortlist.  The wedge hook parks the child in phase
    'spawned' with the heartbeat alive — exactly the observed signature."""
    p = _run({"CELESTE_BENCH_WEDGE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_STALL_S": "spawned=2",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "5",
              # generous parent deadline + a pinned tiny child budget:
              # child STARTUP (~15-40 s import under load) is a fixed cost,
              # so a compressed deadline races it flakily
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "150",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path)
    rec = _one_record(p)
    assert "rc=17" in p.stderr            # the child SELF-detected the stall
    assert "hang_detected" in p.stderr
    # the SECOND child ran: init landed, and the record is parseable
    assert rec["tunnel_init_s"] is not None
    assert rec["bench_wall_s"] is not None
    assert rec["supervisor"]["spawns"] == 2
    assert rec["supervisor"]["hangs"] == ["spawned"]


def test_frozen_child_caught_by_stale_heartbeat(tmp_path):
    """The GIL-held analog (a compile-wedge during init): every thread
    stops, so the heartbeat goes stale and only the PARENT can catch it.
    The freeze hook SIGSTOPs the child; the parent's stale-heartbeat
    watchdog must kill + respawn it."""
    p = _run({"CELESTE_BENCH_FREEZE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_HB_STALE_S": "3",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "5",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "150",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path)
    rec = _one_record(p)
    assert "heartbeat stale" in p.stderr
    assert rec["tunnel_init_s"] is not None
    assert rec["supervisor"]["spawns"] == 2


def test_preinit_crash_triggers_cooldown_respawn(tmp_path):
    """A child that dies before completing init (transient attach/import
    failure) is the same failure class: one cooled-down retry."""
    p = _run({"CELESTE_BENCH_CRASH_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "5",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "150",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path)
    rec = _one_record(p)
    assert "hang_detected" in p.stderr
    assert rec["tunnel_init_s"] is not None
    assert rec["supervisor"]["spawns"] == 2


@pytest.mark.slow
def test_double_hang_second_respawn(tmp_path):
    """Round 4's killer: the RESPAWNED child hung too and had no watchdog
    (bench.py r4 gated every check on ``not respawned``).  Both children
    must self-detect, and the THIRD spawn must land the record."""
    p = _run({"CELESTE_BENCH_WEDGE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_WEDGE_PREINIT_TIMES": "2",
              "CELESTE_BENCH_STALL_S": "spawned=2",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "5",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_HARD_CAP_S": "400",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path, timeout=300)
    rec = _one_record(p)
    assert rec["tunnel_init_s"] is not None
    assert rec["supervisor"]["spawns"] == 3
    assert rec["supervisor"]["hangs"] == ["spawned", "spawned"]


@pytest.mark.slow
def test_overtime_extends_window_when_record_would_be_null(tmp_path):
    """A zero-metric record at the deadline is worthless, so the parent
    gambles on the driver's outer window instead: the first child hangs
    pre-init and the 20 s window cannot afford cooldown + respawn
    (respawn_min 25 s), so the parent must grant overtime, respawn, and
    still land a record (SIGTERM emit covers the true downside, covered
    by test_sigterm_emits_snapshot_before_dying)."""
    p = _run({"CELESTE_BENCH_WEDGE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_STALL_S": "spawned=2",
              "CELESTE_BENCH_HARD_CAP_S": "20",
              "CELESTE_BENCH_OVERTIME_S": "600",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "1",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "1",
              "CELESTE_BENCH_RESPAWN_MIN_S": "25",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "60",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path, timeout=300)
    rec = _one_record(p)
    assert "overtime_granted" in p.stderr
    assert rec["supervisor"]["overtime_s"] > 0
    assert rec["tunnel_init_s"] is not None


@pytest.mark.slow
def test_wedged_child_is_killed_and_partial_record_emitted(tmp_path):
    p = _run({"CELESTE_BENCH_WEDGE": "1",
              "CELESTE_BENCH_HARD_CAP_S": "8",
              "CELESTE_BENCH_STAGE_BUDGET_S": "5"},
             tmp_path)
    rec = _one_record(p)
    # the snapshot carries whatever completed before the wedge (here: init)
    assert rec["tunnel_init_s"] is not None
    assert "deadline_kill" in p.stderr


@pytest.mark.slow
def test_overtime_child_not_killed_before_writing_state(tmp_path):
    """Regression (found by the first REAL-timescale double-hang
    rehearsal, 2026-08-21): a child respawned deep into overtime has a
    few seconds of no-state while sitecustomize imports jax — the
    parent's deadline fallback judged it against the BASE budget instead
    of the extended window and killed it the same tick, exhausting the
    spawn budget and losing the record.  Here the respawn lands at
    ~50 s elapsed against a 5 s HARD_CAP: the child must survive its
    startup and complete."""
    p = _run({"CELESTE_BENCH_WEDGE_PREINIT_ONCE": str(tmp_path / "marker"),
              "CELESTE_BENCH_STALL_S": "spawned=2",
              "CELESTE_BENCH_HARD_CAP_S": "5",
              "CELESTE_BENCH_OVERTIME_S": "600",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_S": "45",
              "CELESTE_BENCH_RESPAWN_COOLDOWN_MAX_S": "45",
              "CELESTE_BENCH_RESPAWN_MIN_S": "5",
              "CELESTE_BENCH_RESPAWN_RESERVE_S": "60",
              "CELESTE_BENCH_RESPAWN_CHILD_BUDGET_S": "1",
              "CELESTE_BENCH_STAGE_BUDGET_S": "1"},
             tmp_path, timeout=300)
    rec = _one_record(p)
    assert "respawn_exhausted" not in p.stderr
    assert rec["tunnel_init_s"] is not None          # the respawn COMPLETED
    assert rec["supervisor"]["spawns"] == 2
    assert rec["supervisor"]["hangs"] == ["spawned"]
