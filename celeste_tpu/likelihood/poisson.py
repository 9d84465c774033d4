"""Per-pixel Poisson log-likelihood (SURVEY.md C8).

log p(x | Theta) = sum_m [ x_m log lambda_m - lambda_m - log(x_m!) ]

The ``log(x_m!)`` term is constant in the parameters; by default it is
dropped (matching the reference's ``celeste_likelihood``) but can be kept
with ``normalized=True`` for absolute comparisons against
``scipy.stats.poisson.logpmf`` in tests.

Numerics (SURVEY.md §7 hard part 1): lambda is clamped to ``LAMBDA_MIN``
before the log — the sky background keeps lambda well away from zero on
real data, but fp32 underflow at stamp edges for faint sources could
otherwise produce -inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celeste_tpu.likelihood._pixel import LAMBDA_MIN, pixel_loglik
from celeste_tpu.model.render import expected_image


def poisson_loglik(lam, counts, mask=None, normalized: bool = False,
                   centered: bool = False):
    """Reduce a lambda grid against observed counts.  Shapes broadcast;
    reduction is over ALL axes -> scalar.  ``centered=True`` subtracts the
    saturated-model constant per pixel (same posterior/gradients, ~1000x
    smaller magnitude — fp32 energy resolution; ``likelihood._pixel``)."""
    ll = pixel_loglik(lam, counts, centered)
    if normalized:
        ll = ll - jax.lax.lgamma(counts + 1.0)
    if mask is not None:
        ll = ll * mask
    return jnp.sum(ll)


def stamp_loglik(sources, stamp, band=None, normalized: bool = False,
                 centered: bool = False):
    """Dense jnp path: render the scene then reduce (reference:
    ``celeste_likelihood``).  Differentiable end-to-end; the fused Pallas
    path lives in ``celeste_tpu.kernels.mog_field``."""
    lam = expected_image(sources, stamp, band)
    return poisson_loglik(lam, stamp.counts, stamp.mask, normalized,
                          centered)


def multi_stamp_loglik(sources, stamps, normalized: bool = False,
                       centered: bool = False):
    """Sum of per-band stamp logliks (reference:
    ``celeste_likelihood_multi_image``).  ``stamps`` is a *batched* Stamp
    pytree with leading band axis (see ``stack_stamps``); vmapped over it."""
    per_band = jax.vmap(
        lambda st: stamp_loglik(sources, st, band=st.band,
                                normalized=normalized, centered=centered)
    )(stamps)
    return jnp.sum(per_band)
