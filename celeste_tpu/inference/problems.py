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

import jax.numpy as jnp

from celeste_tpu.likelihood.poisson import stamp_loglik
from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.model.priors import SourcePriors


def make_star_logdensity(stamps: Sequence, bands: Sequence[int],
                         priors: SourcePriors | None = None, n_bands: int = 5):
    """Single point source observed in ``stamps`` (one per entry of
    ``bands``; band indexes each stamp's flux slot).  BASELINE configs 1-2.
    """
    priors = priors or SourcePriors()
    stamps = list(stamps)
    bands = list(bands)

    def logdensity(vec):
        params = StarParams.from_vector(vec, n_bands)
        ll = 0.0
        for stamp, band in zip(stamps, bands):
            ll = ll + stamp_loglik([params], stamp, band=band)
        lp = priors.star_logpdf(params)
        ljd = StarParams.log_det_jacobian(vec, n_bands)
        return ll + lp + ljd

    return logdensity


def make_galaxy_logdensity(stamps: Sequence, bands: Sequence[int],
                           priors: SourcePriors | None = None, n_bands: int = 5):
    """Single galaxy source (BASELINE config 3)."""
    priors = priors or SourcePriors()
    stamps = list(stamps)
    bands = list(bands)

    def logdensity(vec):
        params = GalaxyParams.from_vector(vec, n_bands)
        ll = 0.0
        for stamp, band in zip(stamps, bands):
            ll = ll + stamp_loglik([params], stamp, band=band)
        lp = priors.galaxy_logpdf(params)
        ljd = GalaxyParams.log_det_jacobian(vec, n_bands)
        return ll + lp + ljd

    return logdensity
