"""Batch-aware value-and-grad (inference/vg.py) and warmup windowing.

Motivated by a measured TPU fact (scripts/tpu_session5_results.json):
vmap(grad(tiled logdensity)) is 7x slower than one vjp of the batch-major
program, and single device calls longer than ~60 s die under the axon
tunnel — so samplers route gradients through ``custom_vmap`` and warmup is
segmentable.  These tests pin the EXACTNESS contracts of both mechanisms.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.inference import (
    batch_aware_value_and_grad,
    hmc_warmup,
    hmc_warmup_finish,
    hmc_warmup_init,
    hmc_warmup_window,
    value_and_grad_of,
)


def _quad_chain(x):
    return -0.5 * jnp.sum(x * x * jnp.arange(1.0, x.shape[-1] + 1))


def _quad_batch(xs):
    return jax.vmap(_quad_chain)(xs)


def test_vg_unbatched_matches_plain():
    vg = batch_aware_value_and_grad(_quad_chain, _quad_batch)
    x = jnp.asarray(np.random.default_rng(0).normal(size=7), jnp.float32)
    v0, g0 = jax.value_and_grad(_quad_chain)(x)
    v1, g1 = vg(x)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-6)


def test_vg_batch_rule_used_and_exact():
    calls = {"batch": 0}

    def batch_fn(xs):
        calls["batch"] += 1
        return _quad_batch(xs)

    vg = batch_aware_value_and_grad(_quad_chain, batch_fn)
    xs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 7)), jnp.float32)
    v, g = jax.vmap(vg)(xs)
    assert calls["batch"] >= 1, "custom_vmap batch rule was not taken"
    v0, g0 = jax.vmap(jax.value_and_grad(_quad_chain))(xs)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0), rtol=1e-6)


def test_vg_under_jit_scan_vmap():
    """The sampler composition: vg inside a scan body under vmap + jit."""
    vg = batch_aware_value_and_grad(_quad_chain, _quad_batch)

    def chain_step(x, _):
        v, g = vg(x)
        return x + 0.01 * g, v

    @jax.jit
    def run(xs):
        return jax.vmap(lambda x: jax.lax.scan(chain_step, x, None, length=3))(xs)

    xs = jnp.asarray(np.random.default_rng(2).normal(size=(4, 7)), jnp.float32)
    final, vals = run(xs)
    # reference: plain autodiff composition
    def chain_step0(x, _):
        v, g = jax.value_and_grad(_quad_chain)(x)
        return x + 0.01 * g, v

    final0, vals0 = jax.jit(jax.vmap(
        lambda x: jax.lax.scan(chain_step0, x, None, length=3)))(xs)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals0), rtol=1e-6)


def test_value_and_grad_of_prefers_attribute():
    def logd(x):
        return -jnp.sum(x * x)

    sentinel = object()
    logd.value_and_grad = sentinel
    assert value_and_grad_of(logd) is sentinel

    def plain(x):
        return -jnp.sum(x * x)

    x = jnp.ones(3)
    v, g = value_and_grad_of(plain)(x)
    np.testing.assert_allclose(np.asarray(v), -3.0, rtol=1e-6)


@pytest.mark.slow
def test_tiled_logdensity_vg_matches_plain_grad():
    """The production consumer: make_tiled_crowded_logdensity's attached vg
    must agree with plain autodiff of the per-chain function, batched."""
    from celeste_tpu.bench.config5 import build_config5

    logd, _, vec, _ = build_config5(impl="jnp")
    assert hasattr(logd, "value_and_grad") and hasattr(logd, "batched")
    xs = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(0),
                                                 (3, vec.shape[0]))
    v0, g0 = jax.vmap(jax.value_and_grad(logd))(xs)
    v1, g1 = jax.vmap(logd.value_and_grad)(xs)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=2e-6)
    # gradients are large (1e4-scale); compare with mixed tolerance
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=5e-4,
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(logd.batched(xs)), np.asarray(v0),
                               rtol=2e-6)


def test_vg_through_nuts_bitwise():
    """Regression: NUTS wraps leapfrog in lax.cond with a per-chain (batched)
    predicate; cond's batching promotes hoisted closure consts to batched,
    which custom_vmap forbids — vg must therefore hoist every array const to
    an explicit argument.  Gate: NUTS with the batch-aware vg is BITWISE
    equal to NUTS with plain autodiff."""
    from celeste_tpu.inference import hmc_init, nuts_kernel, run_chains_ensemble

    c = jnp.asarray(np.arange(5.0), jnp.float32)

    def chain(x):
        return -jnp.sum((x - c) ** 2)

    def chain_aware(x):
        return -jnp.sum((x - c) ** 2)

    chain_aware.value_and_grad = batch_aware_value_and_grad(
        chain_aware, lambda xs: jax.vmap(chain_aware)(xs))

    xs = jnp.ones((3, 5))
    out = []
    for f in (chain, chain_aware):
        states = jax.vmap(lambda x: hmc_init(x, f))(xs)
        kern = nuts_kernel(f, step_size=0.1, inv_mass=jnp.ones(5), max_depth=3)
        s, _, _ = jax.jit(lambda k, st: run_chains_ensemble(k, kern, st,
                                                            n_steps=4))(
            jax.random.key(0), states)
        out.append(np.asarray(s))
    np.testing.assert_array_equal(out[0], out[1])


def _warmup_args():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=7), jnp.float32)
    key = jax.random.key(7)
    return key, x0


@pytest.mark.parametrize("splits", [(10, 30), (13, 13, 14)])
def test_warmup_window_segmentation_exact(splits):
    """Chained windows over the same split keys == monolithic hmc_warmup,
    bitwise (the carry is the whole adaptation state)."""
    key, x0 = _warmup_args()
    n_warmup = sum(splits) if len(splits) == 3 else 40
    state_m, ss_m, im_m = hmc_warmup(key, _quad_chain, x0, n_warmup=n_warmup,
                                     n_leapfrog=4)
    keys = jax.random.split(key, n_warmup)
    carry = hmc_warmup_init(x0, _quad_chain)
    off = 0
    sizes = list(splits) if len(splits) == 3 else [10, 30]
    for k in sizes:
        carry = hmc_warmup_window(keys[off:off + k], _quad_chain, carry,
                                  n_warmup=n_warmup, n_leapfrog=4)
        off += k
    state_s, ss_s, im_s = hmc_warmup_finish(carry)
    np.testing.assert_array_equal(np.asarray(state_m.x), np.asarray(state_s.x))
    np.testing.assert_array_equal(np.asarray(ss_m), np.asarray(ss_s))
    np.testing.assert_array_equal(np.asarray(im_m), np.asarray(im_s))
