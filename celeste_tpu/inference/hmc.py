"""Hamiltonian Monte Carlo with dual-averaging step-size and diagonal
mass-matrix adaptation (SURVEY.md §7: the autodiff upgrade of the
reference's gradient-free samplers; BASELINE north-star requires HMC/NUTS
with vmapped chain ensembles).

Implementation from the standard literature (Neal 2011; Hoffman & Gelman
2014 §3.2 for dual averaging; Stan-style windowed Welford variance for the
mass matrix).  Everything is fixed-shape: leapfrog runs under ``lax.scan``
with a static trajectory length; warmup is a ``lax.scan`` over steps with
masked adaptation windows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from celeste_tpu.inference.vg import value_and_grad_of


class HMCState(NamedTuple):
    x: jax.Array          # [D]
    logp: jax.Array       # scalar
    grad: jax.Array       # [D] cached gradient of logp at x


class HMCInfo(NamedTuple):
    accepted: jax.Array
    accept_prob: jax.Array
    logp: jax.Array
    energy_error: jax.Array


def hmc_init(x0, logdensity_fn) -> HMCState:
    x0 = jnp.asarray(x0)
    logp, grad = value_and_grad_of(logdensity_fn)(x0)
    return HMCState(x=x0, logp=logp, grad=grad)


def _leapfrog(value_and_grad_fn, x, p, grad, step_size, inv_mass, n_steps):
    """Static-length leapfrog integrator; returns final (x, p, logp, grad)."""

    def body(carry, _):
        x, p, grad = carry
        p_half = p + 0.5 * step_size * grad
        x_new = x + step_size * inv_mass * p_half
        logp_new, grad_new = value_and_grad_fn(x_new)
        p_new = p_half + 0.5 * step_size * grad_new
        return (x_new, p_new, grad_new), logp_new

    (x_f, p_f, grad_f), logps = jax.lax.scan(body, (x, p, grad), None, length=n_steps)
    return x_f, p_f, logps[-1], grad_f


def hmc_kernel(logdensity_fn, step_size, inv_mass, n_leapfrog: int = 16):
    """Build an HMC step.  ``inv_mass`` is the [D] diagonal inverse mass
    (posterior variance estimate); ``step_size`` scalar."""
    vg = value_and_grad_of(logdensity_fn)
    inv_mass = jnp.asarray(inv_mass, jnp.float32)
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)

    def step(key, state: HMCState):
        k_mom, k_acc = jax.random.split(key)
        p0 = sqrt_mass * jax.random.normal(k_mom, state.x.shape, state.x.dtype)
        energy0 = -state.logp + 0.5 * jnp.sum(inv_mass * p0 * p0)
        x1, p1, logp1, grad1 = _leapfrog(
            vg, state.x, p0, state.grad, step_size, inv_mass, n_leapfrog
        )
        energy1 = -logp1 + 0.5 * jnp.sum(inv_mass * p1 * p1)
        d_energy = energy0 - energy1
        d_energy = jnp.where(jnp.isfinite(d_energy), d_energy, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(d_energy))
        accept = jax.random.uniform(k_acc, (), state.logp.dtype) < accept_prob
        new = HMCState(
            x=jnp.where(accept, x1, state.x),
            logp=jnp.where(accept, logp1, state.logp),
            grad=jnp.where(accept, grad1, state.grad),
        )
        return new, HMCInfo(accepted=accept, accept_prob=accept_prob, logp=new.logp,
                            energy_error=-d_energy)

    return step


# ---------------------------------------------------------------------------
# Warmup: dual averaging + Welford diagonal mass
# ---------------------------------------------------------------------------

class DualAveragingState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    t: jax.Array


def da_init(step_size0):
    ls = jnp.log(jnp.asarray(step_size0, jnp.float32))
    return DualAveragingState(
        log_step=ls, log_step_avg=ls, h_avg=jnp.float32(0.0),
        mu=jnp.log(10.0) + ls, t=jnp.float32(0.0),
    )


def da_update(da: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75):
    t = da.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * da.h_avg + (target - accept_prob) / (t + t0)
    log_step = da.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * da.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_avg, da.mu, t)


class WelfordState(NamedTuple):
    mean: jax.Array
    m2: jax.Array
    count: jax.Array


def welford_init(d):
    return WelfordState(jnp.zeros(d, jnp.float32), jnp.zeros(d, jnp.float32), jnp.float32(0.0))


def welford_update(w: WelfordState, x):
    count = w.count + 1.0
    delta = x - w.mean
    mean = w.mean + delta / count
    m2 = w.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(w: WelfordState, reg: float = 1e-3):
    var = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    # Stan-style shrinkage toward unit scale for small counts
    shrink = w.count / (w.count + 5.0)
    return shrink * var + reg * (1.0 - shrink) + 1e-7


def hmc_warmup_init(x0, logdensity_fn, init_step_size: float = 0.1):
    """Warmup carry for ``hmc_warmup_window`` — (HMCState, dual-averaging
    state, Welford state, inv_mass, step counter)."""
    x0 = jnp.asarray(x0)
    d = x0.shape[0]
    return (hmc_init(x0, logdensity_fn), da_init(init_step_size),
            welford_init(d), jnp.ones(d, jnp.float32), jnp.int32(0))


def hmc_warmup_window(keys, logdensity_fn, carry, n_warmup: int,
                      n_leapfrog: int = 16, target_accept: float = 0.8):
    """Advance the adaptive warmup by ``len(keys)`` steps and return the
    updated carry.  Segmenting is exact: running ``hmc_warmup`` monolithically
    equals chaining windows over the same split keys (the carry is the whole
    adaptation state).  Built for environments that bound single device-call
    durations (DESIGN.md §3: the axon tunnel kills executions somewhere in
    the 60-120 s range) and for checkpointable warmup.

    ``n_warmup`` is the TOTAL planned warmup length (the mass-adaptation
    window is phased on it), not the window length.
    """
    vg = value_and_grad_of(logdensity_fn)

    def step(carry, key_t):
        state, da, wf, inv_mass, t = carry
        step_size = jnp.exp(da.log_step)
        sqrt_mass = 1.0 / jnp.sqrt(inv_mass)
        k_mom, k_acc = jax.random.split(key_t)
        p0 = sqrt_mass * jax.random.normal(k_mom, state.x.shape, state.x.dtype)
        energy0 = -state.logp + 0.5 * jnp.sum(inv_mass * p0 * p0)
        x1, p1, logp1, grad1 = _leapfrog(vg, state.x, p0, state.grad, step_size,
                                         inv_mass, n_leapfrog)
        energy1 = -logp1 + 0.5 * jnp.sum(inv_mass * p1 * p1)
        d_energy = energy0 - energy1
        d_energy = jnp.where(jnp.isfinite(d_energy), d_energy, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(d_energy))
        accept = jax.random.uniform(k_acc, (), state.logp.dtype) < accept_prob
        state = HMCState(
            x=jnp.where(accept, x1, state.x),
            logp=jnp.where(accept, logp1, state.logp),
            grad=jnp.where(accept, grad1, state.grad),
        )
        da = da_update(da, accept_prob, target=target_accept)
        # mass adaptation window: second half of warmup, frozen for last 10%
        in_window = jnp.logical_and(t >= n_warmup // 2, t < int(n_warmup * 0.9))
        wf_new = welford_update(wf, state.x)
        wf = jax.tree_util.tree_map(lambda a, b: jnp.where(in_window, b, a), wf, wf_new)
        # refresh inv_mass estimate at every step once the window has data
        # (cheap: diagonal); before the window it stays at ones
        est = welford_variance(wf)
        inv_mass = jnp.where(wf.count > 10.0, est, inv_mass)
        return (state, da, wf, inv_mass, t + 1), None

    return jax.lax.scan(step, carry, keys)[0]


def hmc_warmup_finish(carry):
    """(final HMCState, adapted step_size, inv_mass) from a warmup carry."""
    state, da, _, inv_mass, _ = carry
    return state, jnp.exp(da.log_step_avg), inv_mass


def hmc_warmup(key, logdensity_fn, x0, n_warmup: int = 500, n_leapfrog: int = 16,
               init_step_size: float = 0.1, target_accept: float = 0.8):
    """Adaptive warmup: runs HMC while adapting step size (dual averaging,
    every step) and diagonal mass (Welford over the second half of warmup).

    Returns (final HMCState, step_size, inv_mass).  Designed to be vmapped
    over chains (each chain adapts independently; ensemble-pooled adaptation
    lives in ``celeste_tpu.parallel``).  For bounded device-call durations
    or warmup checkpointing, drive ``hmc_warmup_window`` directly with
    slices of ``jax.random.split(key, n_warmup)`` — the result is identical.
    """
    carry = hmc_warmup_init(x0, logdensity_fn, init_step_size)
    carry = hmc_warmup_window(jax.random.split(key, n_warmup), logdensity_fn,
                              carry, n_warmup, n_leapfrog, target_accept)
    return hmc_warmup_finish(carry)
