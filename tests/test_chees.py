"""ChEES-HMC correctness (inference/chees.py): ensemble-adaptive jittered
HMC must recover the moments of a correlated Gaussian, and its joint
(step size, trajectory length) adaptation must land in sane ranges.

Same analytic-target gate as tests/test_samplers.py (SURVEY.md §4 item 3c);
ChEES is additionally checked for the property that motivates it — the
adapted trajectory length scales with the target's widest direction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.inference import (
    chees_init,
    chees_warmup,
    run_chees_ensemble,
    split_rhat,
)

COV = np.array([[2.0, 0.9, -0.4], [0.9, 1.0, 0.3], [-0.4, 0.3, 0.7]])
MEAN = np.array([1.0, -2.0, 0.5])
PREC = np.linalg.inv(COV)


def logdensity(x):
    d = x - jnp.asarray(MEAN, jnp.float32)
    return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d


def test_chees_gaussian_moments():
    """Warmup + frozen-(eps, T) run recovers mean/cov; chains mix (rhat)."""
    n_chains = 64
    x0 = jnp.asarray(MEAN, jnp.float32) + jax.random.normal(
        jax.random.key(0), (n_chains, 3))
    state, eps, traj = jax.jit(
        lambda k, x: chees_warmup(k, logdensity, x, n_warmup=300)
    )(jax.random.key(1), x0)
    eps_f, traj_f = float(eps), float(traj)
    assert 0.01 < eps_f < 5.0, eps_f
    assert eps_f <= traj_f, (eps_f, traj_f)
    samples, _, infos = jax.jit(lambda k, s: run_chees_ensemble(
        k, logdensity, s, n_steps=600, step_size=eps_f,
        trajectory_length=traj_f))(jax.random.key(2), state)
    acc = float(jnp.mean(infos.accept_rate))
    assert acc > 0.5, acc
    kept = np.asarray(samples[:, 150:])
    flat = kept.reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), MEAN, atol=0.12)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.3)
    r = np.asarray(split_rhat(kept))
    assert np.all(r < 1.1), r


def test_chees_trajectory_tracks_scale():
    """On isotropic N(0, s^2 I) the ChEES-optimal trajectory is ~ s (a
    quarter period is (pi/2)s); adapting on s=4 must produce a much longer
    trajectory than on s=0.25."""

    def make_logd(s):
        inv = 1.0 / (s * s)
        return lambda x: -0.5 * inv * jnp.sum(x * x)

    trajs = {}
    for s in (0.25, 4.0):
        x0 = s * jax.random.normal(jax.random.key(3), (64, 3))
        _, eps, traj = jax.jit(
            lambda k, x, s=s: chees_warmup(k, make_logd(s), x, n_warmup=400,
                                           init_step_size=0.1 * s)
        )(jax.random.key(4), x0)
        trajs[s] = float(traj)
    assert trajs[4.0] > 4.0 * trajs[0.25], trajs


def test_chees_warmup_windows_compose():
    """Two 50-step windows with the matching key split must reproduce the
    monolithic 100-step warmup bitwise (the TPU path runs warmup segmented
    because the axon tunnel kills long device calls)."""
    from celeste_tpu.inference import (
        chees_warmup_finish, chees_warmup_init, chees_warmup_window,
    )

    x0 = jnp.asarray(MEAN, jnp.float32) + jax.random.normal(
        jax.random.key(6), (32, 3))
    key = jax.random.key(7)
    st_m, eps_m, traj_m = chees_warmup(key, logdensity, x0, n_warmup=100)

    keys = jax.random.split(key, 100)
    carry = chees_warmup_init(x0, logdensity)
    carry = chees_warmup_window(keys[:50], logdensity, carry, n_iters=50)
    carry = chees_warmup_window(keys[50:], logdensity, carry, n_iters=50)
    st_w, eps_w, traj_w = chees_warmup_finish(carry)
    assert float(eps_m) == float(eps_w)
    assert float(traj_m) == float(traj_w)
    np.testing.assert_array_equal(np.asarray(st_m.xs), np.asarray(st_w.xs))


def test_chees_via_experiment_runner():
    """sampler="chees" flows through the experiment runner (warmup ->
    whitening -> segmented run) and converges on the star posterior."""
    from celeste_tpu.experiments import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(name="star_single", sampler="chees", n_chains=8,
                           n_steps=200, n_warmup=100, metric="dense",
                           shape=(15, 15))
    r = run_experiment(cfg)
    assert float(np.max(r["rhat"])) < 1.1
    assert float(np.min(r["ess"])) > 50.0


def test_chees_sharded_matches_single_chip():
    """ChEES with the chain axis sharded over the 8-device mesh: pooled
    adaptation statistics become ICI all-reduces under GSPMD; the adapted
    (eps, T) and the sampled moments must agree with the unsharded run.

    Not bitwise: cross-device mean reductions reorder fp32 sums, and tiny
    eps differences compound through the leapfrog — statistical agreement
    is the correct contract here (the per-chain kernels' bitwise gate
    lives in test_parallel.py, where no pooled statistics exist)."""
    from celeste_tpu.parallel import run_sharded_chees
    from celeste_tpu.parallel.mesh import chain_mesh

    n_chains = 64
    x0 = jnp.asarray(MEAN, jnp.float32) + jax.random.normal(
        jax.random.key(8), (n_chains, 3))
    mesh = chain_mesh()
    assert mesh.devices.size == 8
    samples_s, _, eps_s, traj_s = run_sharded_chees(
        jax.random.key(9), logdensity, x0, mesh,
        n_warmup=200, n_steps=400)

    k_warm = jax.random.split(jax.random.key(9))[0]  # matches the helper's split
    state, eps_p, traj_p = chees_warmup(k_warm, logdensity, x0, n_warmup=200)
    # adapted scalars agree to a few percent (same target, same keys,
    # different reduction order)
    np.testing.assert_allclose(float(eps_s), float(eps_p), rtol=0.1)
    np.testing.assert_allclose(float(traj_s), float(traj_p), rtol=0.15)
    kept = np.asarray(samples_s[:, 100:]).reshape(-1, 3)
    np.testing.assert_allclose(kept.mean(0), MEAN, atol=0.12)
    np.testing.assert_allclose(np.cov(kept.T), COV, atol=0.3)


def test_chees_init_state_shapes():
    xs = jax.random.normal(jax.random.key(5), (8, 3))
    st = chees_init(xs, logdensity)
    assert st.xs.shape == (8, 3)
    assert st.logps.shape == (8,)
    assert st.grads.shape == (8, 3)
    lp = np.asarray(jax.vmap(logdensity)(xs))
    np.testing.assert_allclose(np.asarray(st.logps), lp, rtol=1e-5)


def test_run_chees_presplit_keys_compose():
    """Pre-split key slices + Halton start_iter offsets make bounded
    run_chees_ensemble segments reproduce the monolithic call's streams
    EXACTLY — the invariant the field pipeline's segmented group sampler
    is built on (celeste_tpu/field.py).  Bitwise here, where both sides
    execute the same per-step program; whole-pipeline composition is
    gated statistically instead (program-boundary fusion differs in the
    last ulp — tests/test_field.py documents the measurement)."""
    def mono(k, xs):
        st = chees_init(xs, logdensity)
        s, _, _ = run_chees_ensemble(k, logdensity, st, n_steps=6,
                                     step_size=0.3, trajectory_length=1.0)
        return s

    def segd(k, xs):
        st = chees_init(xs, logdensity)
        ks = jax.random.split(k, 6)
        s1, st, _ = run_chees_ensemble(ks[:4], logdensity, st, n_steps=4,
                                       step_size=0.3, trajectory_length=1.0,
                                       start_iter=0)
        s2, st, _ = run_chees_ensemble(ks[4:], logdensity, st, n_steps=2,
                                       step_size=0.3, trajectory_length=1.0,
                                       start_iter=4)
        return jnp.concatenate([s1, s2], axis=1)

    keys = jax.random.split(jax.random.key(0), 3)
    xs = jax.random.normal(jax.random.key(1), (3, 5, 3))
    a = jax.vmap(mono)(keys, xs)
    b = jax.vmap(segd)(keys, xs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_chees_rejects_raw_uint32_keys():
    st = chees_init(jax.random.normal(jax.random.key(2), (4, 3)), logdensity)
    with pytest.raises(TypeError, match="typed PRNG keys"):
        run_chees_ensemble(jax.random.PRNGKey(0), logdensity, st, n_steps=2,
                           step_size=0.3, trajectory_length=1.0)
