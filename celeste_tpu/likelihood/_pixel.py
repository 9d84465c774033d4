"""Per-pixel Poisson log-likelihood terms, shared by the dense and tiled
likelihood kernels (the jnp mirrors AND the Pallas bodies — pure jnp, so
it traces inside both).

``centered=True`` computes the log-likelihood relative to the SATURATED
model (lambda = x): per-pixel ``x*(log lam - log x~) + (x - lam)`` with
``x~ = max(x, eps)``.  That subtracts a parameter-independent constant
per pixel BEFORE the pixel sum, so the posterior, all gradients, and all
log-density DIFFERENCES are unchanged while the summed magnitude drops
from O(sum x log x) to O(chi^2 / 2) — three orders on survey stamps.

Why it matters (measured 2026-08-17, DESIGN.md §2): the 3-band config-5
field's log-posterior is ~1.65e7, where fp32 resolution is ~2 nats —
larger than the O(1) Hamiltonian energy errors HMC/NUTS must measure, so
acceptance decisions become rounding noise and dual-averaging collapses
(step size 1e-4 .. 1e-5 regardless of warmup length).  Centered, the same
field sums to ~1e4 and energy resolution is ~1e-3 nats.

Uncentered remains the default everywhere: oracle-parity tests compare
absolute values against the reference convention (reference's
``celeste_likelihood`` drops only the lgamma term; SURVEY.md C8).
"""

import jax.numpy as jnp

LAMBDA_MIN = 1e-10


def pixel_loglik(lam, counts, centered: bool):
    """Per-pixel Poisson log-likelihood terms (no mask, no reduction).

    ``lam`` may be pre- or post-clamp: clamping is idempotent and applied
    here.  ``centered`` must be a static Python bool.
    """
    lam = jnp.maximum(lam, LAMBDA_MIN)
    if centered:
        xt = jnp.maximum(counts, LAMBDA_MIN)
        return counts * (jnp.log(lam) - jnp.log(xt)) + (counts - lam)
    return counts * jnp.log(lam) - lam
