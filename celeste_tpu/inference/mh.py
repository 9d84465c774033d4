"""Random-walk Metropolis-Hastings kernel (SURVEY.md C11; BASELINE config 1
runs MH over (position, flux)).

Matches the reference's gradient-free workhorse behaviorally; written as a
pure jittable step so 10^3-10^4 chains vmap onto one TPU core.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MHState(NamedTuple):
    x: jax.Array        # [D] position
    logp: jax.Array     # scalar log density at x


class MHInfo(NamedTuple):
    accepted: jax.Array   # bool
    logp: jax.Array       # post-step log density


def mh_init(x0, logdensity_fn) -> MHState:
    x0 = jnp.asarray(x0)
    return MHState(x=x0, logp=logdensity_fn(x0))


def mh_kernel(logdensity_fn, step_scales):
    """Build a step function.  ``step_scales`` is a [D] vector of per-axis
    proposal standard deviations (isotropic Gaussian proposal otherwise)."""
    step_scales = jnp.asarray(step_scales, jnp.float32)

    def step(key, state: MHState):
        k_prop, k_acc = jax.random.split(key)
        prop = state.x + step_scales * jax.random.normal(k_prop, state.x.shape, state.x.dtype)
        logp_prop = logdensity_fn(prop)
        log_u = jnp.log(jax.random.uniform(k_acc, (), state.logp.dtype))
        accept = log_u < (logp_prop - state.logp)
        new = MHState(
            x=jnp.where(accept, prop, state.x),
            logp=jnp.where(accept, logp_prop, state.logp),
        )
        return new, MHInfo(accepted=accept, logp=new.logp)

    return step
