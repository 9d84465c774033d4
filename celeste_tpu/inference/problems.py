"""Posterior factories: glue model + likelihood + priors into flat-vector
log-density functions the samplers consume (the rebuild's equivalent of the
reference's ``celeste_mcmc`` wiring, SURVEY.md C11/§3.2).

A "problem" is just a closure ``logdensity(vec) -> scalar`` over
unconstrained parameters, with the prior evaluated in constrained space
plus the reparameterization log-|det J| — so every sampler (MH, slice, HMC,
NUTS) targets exactly the same posterior.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.likelihood.poisson import stamp_loglik
from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.model.priors import SourcePriors
from celeste_tpu.model.stamp import stack_stamps


def _make_multi_loglik(stamps, bands):
    """Per-band likelihood as ONE vmapped computation when the stamps are
    stackable (same shape + PSF size) — one fused XLA program instead of a
    Python loop of n_bands sequential renders.  Falls back to the loop for
    heterogeneous cutouts."""
    stamps = list(stamps)
    bands = list(bands)
    stackable = (
        len(stamps) > 1
        and len({np.asarray(s.counts).shape for s in stamps}) == 1
        and len({int(s.psf.n_components) for s in stamps}) == 1
    )
    if not stackable:
        def loglik(params):
            ll = 0.0
            for stamp, band in zip(stamps, bands):
                ll = ll + stamp_loglik([params], stamp, band=band)
            return ll
        return loglik

    batched = stack_stamps(stamps)
    bands_arr = jnp.asarray(bands, jnp.int32)

    def loglik(params):
        per_band = jax.vmap(
            lambda st, b: stamp_loglik([params], st, band=b)
        )(batched, bands_arr)
        return jnp.sum(per_band)

    return loglik


def make_star_logdensity(stamps: Sequence, bands: Sequence[int],
                         priors: SourcePriors | None = None, n_bands: int = 5):
    """Single point source observed in ``stamps`` (one per entry of
    ``bands``; band indexes each stamp's flux slot).  BASELINE configs 1-2.
    """
    priors = priors or SourcePriors()
    loglik = _make_multi_loglik(stamps, bands)

    def logdensity(vec):
        params = StarParams.from_vector(vec, n_bands)
        ll = loglik(params)
        lp = priors.star_logpdf(params)
        ljd = StarParams.log_det_jacobian(vec, n_bands)
        return ll + lp + ljd

    return logdensity


def make_galaxy_logdensity(stamps: Sequence, bands: Sequence[int],
                           priors: SourcePriors | None = None, n_bands: int = 5):
    """Single galaxy source (BASELINE config 3)."""
    priors = priors or SourcePriors()
    loglik = _make_multi_loglik(stamps, bands)

    def logdensity(vec):
        params = GalaxyParams.from_vector(vec, n_bands)
        ll = loglik(params)
        lp = priors.galaxy_logpdf(params)
        ljd = GalaxyParams.log_det_jacobian(vec, n_bands)
        return ll + lp + ljd

    return logdensity
