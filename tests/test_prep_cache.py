"""Warm-start prep artifacts for the config-5 bench stages
(celeste_tpu.bench.config5.config5_warmup_and_whiten_cached; VERDICT r3
Next #1b: the bench's ~180 s probe/warmup flow is checkpointed in-repo so
the driver-budgeted stage becomes load + measure).

The cache must be (a) exact — a hit returns bitwise the ensemble that was
saved; (b) self-invalidating — a changed warmup knob OR a changed
target density (code drift) falls back to a fresh warmup instead of
benching a stale posterior.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from celeste_tpu.bench.config5 import (
    config5_warmup_and_whiten,
    config5_warmup_and_whiten_cached,
    measure_chees_z,
    measure_nuts_z,
)

D = 4
# fixed anisotropic covariance so whitening has real work to do
_SCALES = jnp.asarray([0.5, 1.0, 2.0, 4.0], jnp.float32)


def _logd(x):
    return -0.5 * jnp.sum((x / _SCALES) ** 2)


def _logd_shifted(x):
    # same geometry, +5 nats everywhere: exactly what a likelihood-code
    # change looks like to the cached states' stored logp
    return _logd(x) + 5.0


VEC = jnp.zeros((D,), jnp.float32)
KW = dict(n_chains=8, n_warmup=10, warmup_window=5, n_zwarm=4,
          probe_steps=4, verbose=False)


def test_prep_cache_roundtrip_is_bitwise(tmp_path):
    path = str(tmp_path / "prep.npz")
    p1 = config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    assert os.path.exists(path)
    p2 = config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    np.testing.assert_array_equal(np.asarray(p2["states_z"].x),
                                  np.asarray(p1["states_z"].x))
    np.testing.assert_array_equal(np.asarray(p2["states_z"].logp),
                                  np.asarray(p1["states_z"].logp))
    assert p2["step_z"] == pytest.approx(p1["step_z"])
    assert p2["step_size"] == pytest.approx(p1["step_size"])
    np.testing.assert_allclose(np.asarray(p2["inv_mass"]),
                               np.asarray(p1["inv_mass"]))
    # both measurement arms run from a cache-hit prep
    rate, div, _depth = measure_nuts_z(p2, n_steps=8, run_segment=4,
                                       verbose=False)
    assert np.isfinite(rate) and rate > 0 and div < 0.5
    rate_c, acc, _nl = measure_chees_z(p2, n_steps=8, run_segment=4,
                                       warmup_iters=4, warmup_window=2,
                                       verbose=False)
    assert np.isfinite(rate_c) and rate_c > 0 and 0.0 < acc <= 1.0


def test_prep_cache_matches_uncached(tmp_path):
    path = str(tmp_path / "prep.npz")
    fresh = config5_warmup_and_whiten(_logd, VEC, **KW)
    cached = config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    hit = config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    for a, b in ((cached, fresh), (hit, fresh)):
        np.testing.assert_array_equal(np.asarray(a["states_z"].x),
                                      np.asarray(b["states_z"].x))
        assert a["step_z"] == pytest.approx(b["step_z"])


def test_prep_cache_invalidates_on_knob_change(tmp_path):
    path = str(tmp_path / "prep.npz")
    p1 = config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    kw2 = dict(KW, n_warmup=12)
    p2 = config5_warmup_and_whiten_cached(_logd, VEC, path, **kw2)
    assert not np.array_equal(np.asarray(p2["states_z"].x),
                              np.asarray(p1["states_z"].x))
    # the artifact was rewritten under the new fingerprint and now hits
    p3 = config5_warmup_and_whiten_cached(_logd, VEC, path, **kw2)
    np.testing.assert_array_equal(np.asarray(p3["states_z"].x),
                                  np.asarray(p2["states_z"].x))


def test_chees_warm_cache_roundtrip_and_invalidation(tmp_path):
    """The ChEES adaptation artifact (measure_chees_z warm_cache_path)
    mirrors the prep artifact: a hit returns bitwise the saved (state,
    eps, T); a knob change or a changed target falls back to a fresh
    adaptation."""
    from celeste_tpu.bench.config5 import _chees_warm_cached

    prep_path = str(tmp_path / "prep.npz")
    prep = config5_warmup_and_whiten_cached(_logd, VEC, prep_path, **KW)
    path = str(tmp_path / "chees.npz")
    st1, eps1, traj1 = _chees_warm_cached(prep, path, 4, 2, 16, False)
    assert os.path.exists(path)
    st2, eps2, traj2 = _chees_warm_cached(prep, path, 4, 2, 16, False)
    np.testing.assert_array_equal(np.asarray(st2.xs), np.asarray(st1.xs))
    assert eps2 == pytest.approx(eps1) and traj2 == pytest.approx(traj1)
    # knob change -> fresh adaptation (different iteration count)
    st3, _, _ = _chees_warm_cached(prep, path, 6, 2, 16, False)
    assert not np.array_equal(np.asarray(st3.xs), np.asarray(st1.xs))
    # changed target with the same fingerprint -> live probe rejects
    prep_shift = dict(prep, logd_z=lambda z: prep["logd_z"](z) + 5.0)
    st4, _, _ = _chees_warm_cached(prep_shift, path, 6, 2, 16, False)
    assert not np.array_equal(np.asarray(st4.logps), np.asarray(st3.logps))
    # the measurement arm runs end-to-end from a cache hit
    rate, acc, _nl = measure_chees_z(prep, n_steps=8, run_segment=4,
                                     warmup_iters=4, warmup_window=2,
                                     verbose=False, warm_cache_path=path)
    assert np.isfinite(rate) and rate > 0 and 0.0 < acc <= 1.0


def test_prep_cache_live_probe_catches_stale_target(tmp_path):
    """Same fingerprint, changed density: the live logd_z probe must
    reject the cached ensemble (its stored logp is 5 nats off) and run a
    fresh warmup against TODAY's target."""
    path = str(tmp_path / "prep.npz")
    config5_warmup_and_whiten_cached(_logd, VEC, path, **KW)
    p2 = config5_warmup_and_whiten_cached(_logd_shifted, VEC, path, **KW)
    # fresh prep is self-consistent with the shifted target
    fresh = config5_warmup_and_whiten(_logd_shifted, VEC, **KW)
    np.testing.assert_array_equal(np.asarray(p2["states_z"].x),
                                  np.asarray(fresh["states_z"].x))
    # and the re-saved artifact hits next time
    p3 = config5_warmup_and_whiten_cached(_logd_shifted, VEC, path, **KW)
    np.testing.assert_array_equal(np.asarray(p3["states_z"].logp),
                                  np.asarray(p2["states_z"].logp))
