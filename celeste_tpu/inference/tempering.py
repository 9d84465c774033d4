"""Parallel tempering (SURVEY.md §2.2: the one real parallelism strategy in
the reference — slice-within-parallel-tempering for the multimodal quasar
redshift posterior, C15; Miller et al. NIPS 2015).

TPU-first shape: the temperature ladder is an ARRAY axis (vmapped), not a
process pool.  One tempering "system" holds T replicas of the chain state;
a step = (a) one kernel step per replica at its inverse temperature
(vmapped), (b) an even/odd adjacent-pair swap sweep (deterministic-even then
deterministic-odd alternation, the standard scheme that mixes a ladder in
O(T^2) rather than O(T^3) swaps).  Ensembles of systems vmap once more; the
cross-chip version distributes the *ensemble* axis (celeste_tpu.parallel),
keeping each ladder chip-local so swaps never cross ICI.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PTState(NamedTuple):
    xs: jax.Array        # [T, D] replica positions (index 0 = cold)
    logps: jax.Array     # [T] UNtempered log density at each replica
    even_phase: jax.Array  # bool scalar: which swap parity this step


class PTInfo(NamedTuple):
    swap_accept: jax.Array   # [T-1] bool, adjacent-pair acceptances (padded)
    swap_active: jax.Array   # [T-1] bool, which pairs were attempted
    logp_cold: jax.Array


def pt_init(xs, logdensity_fn) -> PTState:
    logps = jax.vmap(logdensity_fn)(xs)
    return PTState(xs=xs, logps=logps, even_phase=jnp.bool_(True))


def pt_kernel(logdensity_fn: Callable, inner_kernel_fn: Callable, betas):
    """Build a tempered step.

    ``inner_kernel_fn(beta)`` must return a ``(key, state)->(state, info)``
    kernel targeting ``beta * logdensity`` (plus any beta-independent prior
    terms the caller folds in); state must expose ``.x`` and ``.logp``
    (MHState/SliceState/HMCState all qualify).  A factory may instead take
    ``(beta, replica_idx)`` — the second argument is the traced ladder
    index, letting per-replica tuned parameters (e.g. adapted step sizes,
    ``hmc_at_beta_adaptive``) index their slot.
    ``betas`` is the [T] inverse-temperature ladder, betas[0] == 1.
    """
    import inspect

    betas = jnp.asarray(betas, jnp.float32)
    t = betas.shape[0]
    takes_idx = len(inspect.signature(inner_kernel_fn).parameters) >= 2

    def step(key, state: PTState):
        k_move, k_swap = jax.random.split(key)

        # (a) per-replica move at its own temperature.  The carried
        # untempered logp seeds the inner state directly — no re-evaluation
        # of the log density on entry (it is exact through moves and swaps).
        def move(beta, idx, key_r, x, lp):
            kern = inner_kernel_fn(beta, idx) if takes_idx else inner_kernel_fn(beta)
            new, _ = kern.step(key_r, kern.init(x, lp))
            return new.x, new.logp / jnp.maximum(beta, 1e-12)

        keys = jax.random.split(k_move, t)
        xs, logps = jax.vmap(move)(betas, jnp.arange(t), keys,
                                   state.xs, state.logps)

        # (b) even/odd adjacent swap sweep
        # pair i <-> i+1 for i in the active parity; accept with
        # min(1, exp((beta_i - beta_{i+1}) * (logp_{i+1} - logp_i)))
        i = jnp.arange(t - 1)
        active = (i % 2 == 0) == state.even_phase
        log_ratio = (betas[:-1] - betas[1:]) * (logps[1:] - logps[:-1])
        u = jax.random.uniform(k_swap, (t - 1,))
        accept = jnp.logical_and(active, jnp.log(u) < log_ratio)

        # apply swaps via gather: build permutation
        perm = jnp.arange(t)
        # for accepted pair i: perm[i]=i+1, perm[i+1]=i  (pairs are disjoint
        # within a parity class, so the updates never collide)
        perm = perm.at[i].set(jnp.where(accept, i + 1, perm[i]))
        perm = perm.at[i + 1].set(jnp.where(accept, i, perm[i + 1]))
        xs = xs[perm]
        logps = logps[perm]

        new_state = PTState(xs=xs, logps=logps,
                            even_phase=jnp.logical_not(state.even_phase))
        return new_state, PTInfo(swap_accept=accept, swap_active=active,
                                 logp_cold=logps[0])

    return step


class _KernelBundle(NamedTuple):
    init: Callable
    step: Callable


def mh_at_beta(logdensity_fn, step_scales):
    """Adapter: random-walk MH inner kernel family for pt_kernel.
    ``init(x, logp_untempered)`` builds the state from the carried logp —
    zero extra density evaluations."""
    from celeste_tpu.inference.mh import MHState, mh_kernel

    def factory(beta):
        tempered = lambda x: beta * logdensity_fn(x)
        kern = mh_kernel(tempered, step_scales)
        init = lambda x, lp: MHState(x=x, logp=beta * lp)
        return _KernelBundle(init=init, step=kern)

    return factory


def slice_at_beta(logdensity_fn, widths, **kw):
    """Adapter: slice-sampling inner kernel family (the reference's choice
    for quasar photo-z, C15)."""
    from celeste_tpu.inference.slice_ import SliceState, slice_kernel

    def factory(beta):
        tempered = lambda x: beta * logdensity_fn(x)
        kern = slice_kernel(tempered, widths, **kw)
        init = lambda x, lp: SliceState(x=x, logp=beta * lp)
        return _KernelBundle(init=init, step=kern)

    return factory


def hmc_at_beta(logdensity_fn, step_size, inv_mass, n_leapfrog: int = 8,
                scale_step_with_temp: bool = True):
    """Adapter: HMC inner kernel family — the gradient upgrade of the
    reference's slice-within-tempering.  Hotter replicas see flatter
    posteriors, so the step size optionally inflates by beta^(-1/4), capped
    at 2x (see the inline note for why full 1/sqrt(beta) overshoots).  One
    gradient evaluation per move seeds the state (gradients are not carried
    across swaps)."""
    from celeste_tpu.inference.hmc import HMCState, hmc_kernel

    def factory(beta):
        tempered = lambda x: beta * logdensity_fn(x)
        # gentle beta^(-1/4) inflation, capped at 2x: the likelihood flattens
        # when hot but the priors still bound the posterior, so full
        # 1/sqrt(beta) scaling overshoots and collapses hot-replica
        # acceptance (breaking the ladder)
        eps = (step_size * jnp.minimum(jnp.maximum(beta, 1e-6) ** -0.25, 2.0)
               if scale_step_with_temp else step_size)
        kern = hmc_kernel(tempered, eps, inv_mass, n_leapfrog=n_leapfrog)

        def init(x, lp):
            return HMCState(x=x, logp=beta * lp, grad=jax.grad(tempered)(x))

        return _KernelBundle(init=init, step=kern)

    return factory


def hmc_at_beta_adaptive(logdensity_fn, step_sizes, inv_masses,
                         n_leapfrog: int = 8):
    """Adapter: HMC inner kernels with PER-REPLICA adapted parameters
    (from ``pt_warmup``) instead of the capped beta^(-1/4) heuristic of
    ``hmc_at_beta`` — robust across SNR regimes where the heuristic's
    one-size inflation collapses hot-replica acceptance.

    ``step_sizes`` [T] and ``inv_masses`` [T, D] align with the ladder;
    the factory takes ``(beta, replica_idx)`` (pt_kernel passes the traced
    ladder index through)."""
    from celeste_tpu.inference.hmc import HMCState, hmc_kernel

    step_sizes = jnp.asarray(step_sizes, jnp.float32)
    inv_masses = jnp.asarray(inv_masses, jnp.float32)

    def factory(beta, idx):
        tempered = lambda x: beta * logdensity_fn(x)
        kern = hmc_kernel(tempered, step_sizes[idx], inv_masses[idx],
                          n_leapfrog=n_leapfrog)

        def init(x, lp):
            return HMCState(x=x, logp=beta * lp, grad=jax.grad(tempered)(x))

        return _KernelBundle(init=init, step=kern)

    return factory


def pt_warmup(key, logdensity_fn, xs0, betas, n_warmup: int = 200,
              n_leapfrog: int = 8, target_accept: float = 0.8):
    """Per-replica dual-averaging warmup for a tempered ladder: each
    replica adapts its own HMC step size and diagonal mass against ITS
    tempered target.  Returns (xs [T, D], step_sizes [T], inv_masses
    [T, D]) ready for ``hmc_at_beta_adaptive`` + ``pt_init``."""
    from celeste_tpu.inference.hmc import hmc_warmup

    betas = jnp.asarray(betas, jnp.float32)
    t = betas.shape[0]

    def one(k, x, beta):
        tempered = lambda v: beta * logdensity_fn(v)
        state, ss, im = hmc_warmup(k, tempered, x, n_warmup=n_warmup,
                                   n_leapfrog=n_leapfrog,
                                   target_accept=target_accept)
        return state.x, ss, im

    keys = jax.random.split(key, t)
    return jax.vmap(one)(keys, jnp.asarray(xs0), betas)


def geometric_ladder(n_temps: int, beta_min: float = 0.05):
    """Standard geometric inverse-temperature ladder from 1 down to
    beta_min."""
    return jnp.asarray(
        jnp.geomspace(1.0, beta_min, n_temps), jnp.float32
    )
