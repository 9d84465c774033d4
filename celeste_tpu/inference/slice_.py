"""Coordinate-wise slice sampling (SURVEY.md C10 — the reference's
``slicesample`` workhorse; Neal 2003 §4 stepping-out + shrinkage),
restructured for XLA: fixed-trip-count loops with masked updates instead of
data-dependent Python control flow.

One full kernel step = one sweep over all D coordinates (matching the
reference's per-iteration behavior).  Stepping-out and shrinkage run under
``lax.while_loop`` with hard iteration caps so the computation stays
static-shape; the caps are generous (default 16/32) and hitting them leaves
the current point in place (a null update, preserving detailed balance in
the same way as a rejected proposal).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SliceState(NamedTuple):
    x: jax.Array      # [D]
    logp: jax.Array   # scalar


class SliceInfo(NamedTuple):
    logp: jax.Array
    n_evals: jax.Array   # likelihood evaluations consumed this step


def slice_init(x0, logdensity_fn) -> SliceState:
    x0 = jnp.asarray(x0)
    return SliceState(x=x0, logp=logdensity_fn(x0))


def slice_kernel(logdensity_fn, widths, max_stepout: int = 16, max_shrink: int = 32):
    """Build a one-sweep slice step.  ``widths`` is the [D] initial bracket
    width per coordinate (the reference's per-parameter step sizes)."""
    widths = jnp.asarray(widths, jnp.float32)

    def update_coord(carry, d):
        x, logp, key, n_evals = carry
        k_h, k_pos, k_shrink = jax.random.split(key, 3)
        key = jax.random.fold_in(key, d)

        log_y = logp + jnp.log(jax.random.uniform(k_h, (), logp.dtype))
        w_d = widths[d]

        # --- stepping out ------------------------------------------------
        u = jax.random.uniform(k_pos, (), x.dtype)
        lo0 = x[d] - w_d * u
        hi0 = lo0 + w_d

        def logp_at(v):
            return logdensity_fn(x.at[d].set(v))

        def stepout_cond(c):
            v, n, done = c
            return jnp.logical_and(jnp.logical_not(done), n < max_stepout)

        def stepout_lo(c):
            v, n, _ = c
            done = logp_at(v) <= log_y
            return (jnp.where(done, v, v - w_d), n + 1, done)

        def stepout_hi(c):
            v, n, _ = c
            done = logp_at(v) <= log_y
            return (jnp.where(done, v, v + w_d), n + 1, done)

        lo, n_lo, _ = jax.lax.while_loop(stepout_cond, stepout_lo, (lo0, 0, False))
        hi, n_hi, _ = jax.lax.while_loop(stepout_cond, stepout_hi, (hi0, 0, False))

        # --- shrinkage ---------------------------------------------------
        def shrink_cond(c):
            _, _, _, _, accepted, n, _ = c
            return jnp.logical_and(jnp.logical_not(accepted), n < max_shrink)

        def shrink_body(c):
            lo_c, hi_c, xv, lp_new, _, n, k = c
            k, k_u = jax.random.split(k)
            prop = lo_c + jax.random.uniform(k_u, (), x.dtype) * (hi_c - lo_c)
            lp_prop = logp_at(prop)
            ok = lp_prop > log_y
            lo_c = jnp.where(jnp.logical_or(ok, prop >= x[d]), lo_c, prop)
            hi_c = jnp.where(jnp.logical_or(ok, prop < x[d]), hi_c, prop)
            xv = jnp.where(ok, prop, xv)
            lp_new = jnp.where(ok, lp_prop, lp_new)
            return (lo_c, hi_c, xv, lp_new, ok, n + 1, k)

        lo_f, hi_f, x_d, logp_new, accepted, n_shrink, _ = jax.lax.while_loop(
            shrink_cond, shrink_body, (lo, hi, x[d], logp, False, 0, k_shrink)
        )
        x = x.at[d].set(jnp.where(accepted, x_d, x[d]))
        logp = jnp.where(accepted, logp_new, logp)
        n_evals = n_evals + n_lo + n_hi + n_shrink + 1
        return (x, logp, key, n_evals), None

    def step(key, state: SliceState):
        d_range = jnp.arange(state.x.shape[0])
        (x, logp, _, n_evals), _ = jax.lax.scan(
            update_coord, (state.x, state.logp, key, jnp.int32(0)), d_range
        )
        return SliceState(x=x, logp=logp), SliceInfo(logp=logp, n_evals=n_evals)

    return step
