"""Test harness config (SURVEY.md §4 item 4): run everything on CPU with a
virtual 8-device mesh so sharding/collective code is exercised without TPU
hardware, and so tests avoid the multi-minute TPU runtime init measured in
this environment.  ``shard_map``/``pjit`` code is identical from 1 to N
devices; the driver's ``dryrun_multichip`` does the same trick.
"""

import os

# Force CPU: this environment's sitecustomize force-registers the axon TPU
# plugin (JAX_PLATFORMS=axon, ~5 min runtime init per process).  Tests must
# run on the virtual 8-device CPU mesh, so hard-override the platform before
# the first backend initialization.  (sitecustomize's register() has already
# run by now, but backend *initialization* is lazy and respects
# JAX_PLATFORMS at first use.)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize's register() pins jax_platforms="axon,cpu" via
# jax.config.update, which shadows the env var; pin it back before the first
# (lazy) backend initialization.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (VERDICT r2
# Weak #8 — 53 min wall); warm reruns skip every unchanged program.  The
# cache key covers the HLO, so edits invalidate exactly what they change.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
