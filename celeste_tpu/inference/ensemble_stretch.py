"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move —
the emcee algorithm, the de-facto standard gradient-free sampler in
astronomy; natural companion to the reference's MH/slice family and a
strong baseline for posteriors with correlated scales).

TPU-first shape: the complementary-ensemble formulation.  Walkers split
into two half-ensembles; each half updates IN PARALLEL against the other
half (one vmapped batch of L walkers per half-step), so a K-walker
ensemble advances with 2 batched likelihood evaluations per sweep — no
sequential walker loop.  The whole ensemble is one chain state; many
independent ensembles vmap on top.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StretchState(NamedTuple):
    xs: jax.Array      # [K, D] walker positions (K even)
    logps: jax.Array   # [K]


class StretchInfo(NamedTuple):
    accept_rate: jax.Array
    logp_mean: jax.Array


def stretch_init(xs, logdensity_fn) -> StretchState:
    xs = jnp.asarray(xs)
    return StretchState(xs=xs, logps=jax.vmap(logdensity_fn)(xs))


def stretch_kernel(logdensity_fn, a: float = 2.0):
    """Build a one-sweep kernel (both half-ensembles updated).  ``a`` is
    the stretch scale (emcee default 2)."""

    def half_update(key, movers, movers_lp, others):
        k_z, k_pick, k_acc = jax.random.split(key, 3)
        l, d = movers.shape
        # z ~ g(z) prop 1/sqrt(z) on [1/a, a]
        u = jax.random.uniform(k_z, (l,))
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        picks = jax.random.randint(k_pick, (l,), 0, others.shape[0])
        partners = others[picks]
        prop = partners + z[:, None] * (movers - partners)
        prop_lp = jax.vmap(logdensity_fn)(prop)
        log_ratio = (d - 1.0) * jnp.log(z) + prop_lp - movers_lp
        accept = jnp.log(jax.random.uniform(k_acc, (l,))) < log_ratio
        new = jnp.where(accept[:, None], prop, movers)
        new_lp = jnp.where(accept, prop_lp, movers_lp)
        return new, new_lp, accept

    def step(key, state: StretchState):
        k1, k2 = jax.random.split(key)
        k_walkers = state.xs.shape[0]
        half = k_walkers // 2
        a_xs, b_xs = state.xs[:half], state.xs[half:]
        a_lp, b_lp = state.logps[:half], state.logps[half:]
        a_xs, a_lp, acc_a = half_update(k1, a_xs, a_lp, b_xs)
        b_xs, b_lp, acc_b = half_update(k2, b_xs, b_lp, a_xs)
        xs = jnp.concatenate([a_xs, b_xs])
        logps = jnp.concatenate([a_lp, b_lp])
        info = StretchInfo(
            accept_rate=jnp.mean(jnp.concatenate([acc_a, acc_b]).astype(jnp.float32)),
            logp_mean=jnp.mean(logps),
        )
        return StretchState(xs=xs, logps=logps), info

    return step
