"""Numerical guards (SURVEY.md §5.2: the race-detector/sanitizer slot —
on-device the hazards are NaN/Inf, not data races).

``checked_logdensity`` wraps a log-density with ``checkify`` NaN/derivative
checks for debugging runs; production samplers instead rely on the kernels'
masked finite handling (NUTS treats non-finite energies as divergences, MH
rejects them) so no checking overhead lands in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_logdensity(logdensity_fn):
    """Return (checked_fn, run) where ``run(x)`` raises on NaN/Inf logp or
    gradient.  Debug tool; ~2x overhead."""

    def with_checks(x):
        lp = logdensity_fn(x)
        checkify.check(jnp.isfinite(lp), "non-finite log density")
        g = jax.grad(logdensity_fn)(x)
        checkify.check(jnp.all(jnp.isfinite(g)), "non-finite gradient")
        return lp

    checked = checkify.checkify(with_checks)

    def run(x):
        err, out = checked(x)
        err.throw()
        return out

    return checked, run
