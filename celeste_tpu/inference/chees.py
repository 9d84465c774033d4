"""ChEES-HMC: ensemble-adaptive jittered HMC (Hoffman, Radul & Sountsov,
AISTATS 2021) — the TPU-native complement to NUTS.

Why this exists here: NUTS under ``vmap`` pays the FULL 2^max_depth
leapfrog budget every step — per-chain early exit dies under batching
(lax.cond with a batched predicate runs both branches), so realized tree
depth doesn't reduce wall time (measured: capping max_depth is the only
lever, DESIGN.md §5).  ChEES-HMC removes the tree entirely:

- ONE jittered trajectory length per step, SHARED by every chain in the
  ensemble → the leapfrog loop is a single ``fori_loop`` whose trip count
  is the actual trajectory length; compute ∝ realized work, chains stay in
  lockstep, full batch efficiency;
- the trajectory length T is adapted by Adam ascent on the ChEES
  criterion, whose expectation is estimated ACROSS the chain ensemble —
  the O(1e3) vmapped chains this framework runs everywhere are exactly
  the estimator the algorithm wants;
- step size adapts by dual averaging on the ensemble-mean accept rate.

Everything here is batch-major: states are [B, D], the logdensity is
consumed through its ``.batched``/batch-aware vg when present
(inference/vg.py), so the tiled crowded-field gradients keep their Pallas
fast path.  jitter u_t ~ Halton(t) (low-discrepancy, as in the paper) is
identical across chains by construction.

References: SURVEY.md §2.2 (DP analog: chain ensembles), §7 design stance
"samplers are pure (key, state) -> state kernels"; the ensemble-level
adaptation is the deliberate exception and is documented in DESIGN.md §5.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from celeste_tpu.inference.vg import value_and_grad_of


# energy-error threshold (nats) above which a proposal counts as diverged,
# matching inference/nuts.py's _DIVERGENCE_THRESHOLD
_DIVERGENCE_THRESHOLD = 1000.0


def _halton(i, base=2):
    """Halton sequence term i (base 2), traced-friendly: 24-bit radical
    inverse via bit twiddling."""
    i = i.astype(jnp.uint32) + 1
    # reverse the low 24 bits
    b = jnp.zeros((), jnp.uint32)
    x = i
    for _ in range(24):
        b = (b << 1) | (x & 1)
        x = x >> 1
    return b.astype(jnp.float32) / jnp.float32(1 << 24)


class ChEESState(NamedTuple):
    xs: jax.Array          # [B, D]
    logps: jax.Array       # [B]
    grads: jax.Array       # [B, D]


class ChEESAdaptState(NamedTuple):
    log_eps: jax.Array
    log_eps_avg: jax.Array
    da_t: jax.Array        # dual-averaging iteration
    da_gbar: jax.Array     # running accept-error
    log_T: jax.Array       # trajectory length (time units)
    adam_m: jax.Array
    adam_v: jax.Array
    adam_t: jax.Array


class ChEESInfo(NamedTuple):
    accept_rate: jax.Array
    n_leapfrog: jax.Array
    trajectory_length: jax.Array
    step_size: jax.Array
    divergence_rate: jax.Array   # fraction of chains with non-finite proposal energy


def chees_init(xs, logdensity_fn):
    vg = value_and_grad_of(logdensity_fn)
    logps, grads = jax.vmap(vg)(xs)
    return ChEESState(xs=jnp.asarray(xs), logps=logps, grads=grads)


def _ensemble_step(key, state: ChEESState, vg, inv_mass, eps, n_leap,
                   max_leapfrog: int):
    """One jittered-HMC step of the WHOLE ensemble; n_leap is a traced
    scalar shared by all chains (fori_loop trip count)."""
    b, d = state.xs.shape
    k_mom, k_acc = jax.random.split(key)
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)
    p0 = sqrt_mass[None, :] * jax.random.normal(k_mom, (b, d), state.xs.dtype)
    energy0 = -state.logps + 0.5 * jnp.sum(inv_mass[None, :] * p0 * p0, -1)

    def leap(_, carry):
        x, p, logp, g = carry
        p_half = p + 0.5 * eps * g
        x_new = x + eps * inv_mass[None, :] * p_half
        logp_new, g_new = jax.vmap(vg)(x_new)
        p_new = p_half + 0.5 * eps * g_new
        return x_new, p_new, logp_new, g_new

    n_leap = jnp.clip(n_leap, 1, max_leapfrog)
    x1, p1, logp1, g1 = jax.lax.fori_loop(
        0, n_leap, leap, (state.xs, p0, state.logps, state.grads))
    energy1 = -logp1 + 0.5 * jnp.sum(inv_mass[None, :] * p1 * p1, -1)
    # divergence = non-finite OR large-but-finite energy error (same
    # 1000-nat threshold as the NUTS path, so divergence diagnostics are
    # comparable across samplers; a badly mistuned step size must not
    # report divergence_rate 0 just because the energies stayed finite)
    diverged = (~jnp.isfinite(energy1)
                | (energy1 - energy0 > _DIVERGENCE_THRESHOLD))
    d_energy = jnp.where(diverged, -jnp.inf, energy0 - energy1)
    accept_prob = jnp.minimum(1.0, jnp.exp(d_energy))
    accept = jax.random.uniform(k_acc, (b,)) < accept_prob
    new = ChEESState(
        xs=jnp.where(accept[:, None], x1, state.xs),
        logps=jnp.where(accept, logp1, state.logps),
        grads=jnp.where(accept[:, None], g1, state.grads),
    )
    # velocity at the proposal end (for the ChEES gradient)
    v1 = inv_mass[None, :] * p1
    return new, accept_prob, x1, v1, diverged


def _chees_grad(xs, x1, v1, accept_prob, halved):
    """d ChEES / d log T estimator pooled over chains (paper eq. 8-ish):
    w * Delta * <x' - mu', v'>, importance-weighted by accept prob.

    Divergent proposals carry non-finite x1/v1 with accept_prob == 0; they
    must be masked BEFORE entering the means/products (0 * inf = nan would
    otherwise poison log_T permanently — seen on real stamp posteriors)."""
    finite = jnp.isfinite(jnp.sum(x1, -1) + jnp.sum(v1, -1))
    x1 = jnp.where(finite[:, None], x1, xs)
    v1 = jnp.where(finite[:, None], v1, 0.0)
    w_raw = jnp.where(finite, accept_prob, 0.0)
    mu0 = jnp.mean(xs, 0, keepdims=True)
    mu1 = jnp.sum(jnp.where(finite[:, None], x1, 0.0), 0, keepdims=True) \
        / jnp.maximum(jnp.sum(finite), 1)
    delta = (jnp.sum((x1 - mu1) ** 2, -1) - jnp.sum((xs - mu0) ** 2, -1))
    term = delta * jnp.sum((x1 - mu1) * v1, -1)
    w = w_raw / jnp.maximum(jnp.sum(w_raw), 1e-6)
    return jnp.sum(w * term) * halved


def chees_warmup_init(xs0, logdensity_fn, init_step_size: float = 0.1,
                      init_trajectory: float = 1.0):
    """Start the segmentable ChEES warmup: returns the (state, adapt)
    carry that ``chees_warmup_window`` advances (SURVEY.md §5.4 pattern —
    bounded device calls, checkpointable, bitwise == the monolithic run)."""
    state0 = chees_init(jnp.asarray(xs0), logdensity_fn)
    adapt0 = ChEESAdaptState(
        log_eps=jnp.log(jnp.float32(init_step_size)),
        log_eps_avg=jnp.log(jnp.float32(init_step_size)),
        da_t=jnp.float32(0.0), da_gbar=jnp.float32(0.0),
        log_T=jnp.log(jnp.float32(init_trajectory)),
        adam_m=jnp.float32(0.0), adam_v=jnp.float32(0.0),
        adam_t=jnp.float32(0.0))
    return state0, adapt0


def chees_warmup_window(key, logdensity_fn, carry, n_iters: int,
                        init_step_size: float = 0.1,
                        target_accept: float = 0.651,
                        max_leapfrog: int = 256, adam_lr: float = 0.025):
    """Advance the warmup ``n_iters`` steps.  The Halton/dual-averaging
    iteration index rides in the carry (``da_t``), so windows compose:
    window(k1, 50) ∘ window(k0, 50)  ==  one 100-step window, given the
    matching key split.  ``init_step_size`` must match the init call (it
    anchors the dual-averaging prior mean mu = log(10 * eps0)).

    ``key`` may be a single key (split internally) or a pre-split
    [n_iters] key array — pass consecutive slices of one
    ``jax.random.split(key, total)`` to make windows compose bitwise with
    the monolithic run."""
    vg = value_and_grad_of(logdensity_fn)
    state0, adapt0 = carry
    d = state0.xs.shape[-1]
    inv_mass = jnp.ones((d,), jnp.float32)
    mu = jnp.log(10.0 * init_step_size)

    def step(carry, key_t):
        state, ad = carry
        i = ad.da_t.astype(jnp.int32)        # global iteration index
        eps = jnp.exp(ad.log_eps)
        u = _halton(i)
        traj = u * jnp.exp(ad.log_T)
        n_leap = jnp.maximum(1, jnp.round(traj / eps)).astype(jnp.int32)
        halved = jnp.where(n_leap > max_leapfrog, 0.0, 1.0)
        new, accept_prob, x1, v1, _div = _ensemble_step(
            key_t, state, vg, inv_mass, eps, n_leap, max_leapfrog)
        # --- dual averaging on pooled accept rate (Nesterov/Stan schedule)
        acc = jnp.mean(accept_prob)
        t = ad.da_t + 1.0
        gbar = (1.0 - 1.0 / (t + 10.0)) * ad.da_gbar + \
            (target_accept - acc) / (t + 10.0)
        log_eps = mu - jnp.sqrt(t) / 0.05 * gbar
        w = t ** -0.75
        log_eps_avg = w * log_eps + (1.0 - w) * ad.log_eps_avg
        # --- Adam ascent on dChEES/dlogT (gradient wrt T times T)
        g_T = _chees_grad(state.xs, x1, v1, accept_prob, halved) \
            * jnp.exp(ad.log_T) * u
        g_T = jnp.where(jnp.isfinite(g_T), g_T, 0.0)
        at = ad.adam_t + 1.0
        m = 0.9 * ad.adam_m + 0.1 * g_T
        v = 0.999 * ad.adam_v + 0.001 * g_T * g_T
        mhat = m / (1.0 - 0.9 ** at)
        vhat = v / (1.0 - 0.999 ** at)
        log_T = ad.log_T + adam_lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        # keep T within sane physical bounds relative to eps
        log_T = jnp.clip(log_T, jnp.log(eps), jnp.log(eps * max_leapfrog))
        ad_new = ChEESAdaptState(log_eps=log_eps, log_eps_avg=log_eps_avg,
                                 da_t=t, da_gbar=gbar, log_T=log_T,
                                 adam_m=m, adam_v=v, adam_t=at)
        return (new, ad_new), acc

    if not jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        raise TypeError(
            "chees_warmup_window requires typed PRNG keys (jax.random.key); "
            "a raw uint32 jax.random.PRNGKey has shape (2,) and is "
            "indistinguishable from a pre-split key array here")
    keys = key if key.ndim == 1 else jax.random.split(key, n_iters)
    assert keys.shape[0] == n_iters
    (state, ad), _ = jax.lax.scan(step, (state0, adapt0), keys)
    return state, ad


def chees_warmup_finish(carry):
    state, ad = carry
    return state, jnp.exp(ad.log_eps_avg), jnp.exp(ad.log_T)


def chees_warmup(key, logdensity_fn, xs0, n_warmup: int = 200,
                 init_step_size: float = 0.1, init_trajectory: float = 1.0,
                 target_accept: float = 0.651, max_leapfrog: int = 256,
                 adam_lr: float = 0.025):
    """Joint (eps, T) adaptation on the ensemble.  Returns
    (ChEESState, step_size, trajectory_length).

    Diagonal-mass note: run this in whitened space (inference/whiten.py)
    for correlated targets; inv_mass is fixed to ones here — ChEES's own T
    adaptation subsumes the scale freedom the diagonal mass would carry.
    """
    carry = chees_warmup_init(xs0, logdensity_fn, init_step_size,
                              init_trajectory)
    carry = chees_warmup_window(key, logdensity_fn, carry, n_warmup,
                                init_step_size=init_step_size,
                                target_accept=target_accept,
                                max_leapfrog=max_leapfrog, adam_lr=adam_lr)
    return chees_warmup_finish(carry)


def run_chees_ensemble(key, logdensity_fn, state: ChEESState, n_steps: int,
                       step_size, trajectory_length, max_leapfrog: int = 256,
                       start_iter: int = 0):
    """Sample with frozen (eps, T), jittered per step (Halton).  Returns
    (samples [B, n_steps, D], final state, ChEESInfo of per-step means).

    ``start_iter`` offsets the Halton jitter index so segmented runs
    continue the low-discrepancy sequence instead of repeating it.

    ``key`` may be a single typed key (split internally) or a pre-split
    [n_steps] key array — pass consecutive slices of one
    ``jax.random.split(key, total)`` together with matching ``start_iter``
    offsets to make bounded segments compose bitwise with one monolithic
    run (the field pipeline's segmented group sampler relies on this)."""
    vg = value_and_grad_of(logdensity_fn)
    d = state.xs.shape[-1]
    inv_mass = jnp.ones((d,), jnp.float32)
    # asarray, not jnp.float32(): (eps, T) may be TRACED values — the
    # group-batched field sampler vmaps this whole function over per-group
    # adapted step sizes (celeste_tpu/field.py)
    eps = jnp.asarray(step_size, jnp.float32)

    def step(state, inp):
        key_t, i = inp
        u = _halton(i)
        traj = u * jnp.asarray(trajectory_length, jnp.float32)
        # clip HERE so the info reports the leapfrogs actually executed
        # (_ensemble_step clips identically; an unclipped report overcounts
        # gradient work whenever round(u*T/eps) exceeds the cap)
        n_leap = jnp.clip(jnp.round(traj / eps).astype(jnp.int32),
                          1, max_leapfrog)
        new, accept_prob, _, _, diverged = _ensemble_step(
            key_t, state, vg, inv_mass, eps, n_leap, max_leapfrog)
        info = ChEESInfo(accept_rate=jnp.mean(accept_prob),
                         n_leapfrog=n_leap,
                         trajectory_length=eps * n_leap.astype(jnp.float32),
                         step_size=eps,
                         divergence_rate=jnp.mean(diverged.astype(jnp.float32)))
        return new, (new.xs, info)

    if not jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        raise TypeError(
            "run_chees_ensemble requires typed PRNG keys (jax.random.key); "
            "a raw uint32 jax.random.PRNGKey has shape (2,) and is "
            "indistinguishable from a pre-split key array here")
    keys = key if key.ndim == 1 else jax.random.split(key, n_steps)
    assert keys.shape[0] == n_steps
    idx = start_iter + jnp.arange(n_steps)
    state, (samples, infos) = jax.lax.scan(step, state, (keys, idx))
    return jnp.swapaxes(samples, 0, 1), state, infos
