"""The driver contract (VERDICT r1 #1): ``dryrun_multichip`` must succeed
in a FRESH process with the container's hostile default environment — the
sitecustomize that force-registers the axon TPU plugin and pins
``jax_platforms='axon,cpu'`` — without the caller setting any defensive env
vars.  Round 1's MULTICHIP record was rc=1 exactly because the dryrun
trusted its environment; this test reproduces the driver's calling
convention."""

import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_survives_hostile_env():
    env = dict(os.environ)
    # reconstruct the driver's env: NO defensive vars set by the caller;
    # PYTHONPATH (and thus sitecustomize) left exactly as the container
    # ships it.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_reexecs_when_backend_already_cpu_but_small():
    """If a 1-device CPU backend is already initialized (config update can
    no longer widen it), the dryrun must re-exec itself rather than fail."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # 1 CPU device only
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    code = (
        "import jax; jax.devices();"     # initialize the too-small backend
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_entry_compile_check_stays_off_the_tpu():
    """Round-5 hazard control (VERDICT r4 Next #1/#2, DESIGN.md §9): ANY
    axon attach poisons the next attach for ~5 min — and the driver
    compile-checks ``entry()`` minutes before running ``bench.py``.  The
    module must therefore pin the compile-check to CPU under the
    container's hostile default env (sitecustomize pinning 'axon,cpu'),
    reserving the TPU session for the bench."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("CELESTE_ENTRY_TPU", None)
    code = (
        "import __graft_entry__ as g; import jax;"
        "fn, args = g.entry();"
        "out = jax.jit(fn)(*args); out.block_until_ready();"
        "assert jax.default_backend() == 'cpu', jax.default_backend();"
        "print('ENTRY_CPU_OK', out.shape)"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ENTRY_CPU_OK" in proc.stdout
