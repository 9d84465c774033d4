"""Priors over source parameters (SURVEY.md C9).

The Celeste-style model puts: a flat prior on position (within the stamp),
a log-normal prior on the reference-band flux, a Gaussian (optionally
mixture) prior on *colors* — adjacent-band log-flux ratios
c_b = log(f_b / f_{b+1}) — a Beta-like prior on the exp/deV mixing weight,
log-normal on galaxy scale, uniform on axis ratio and angle.  All densities
are evaluated in CONSTRAINED space; the sampler-side log-|det J| for the
unconstrained reparameterization is added by the posterior factory
(``celeste_tpu.inference.problems``).

Defaults are weakly-informative and synthetic-data-friendly; real SDSS runs
would fit the color GMM offline (C16) and drop the artifact in.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp

REF_BAND = 2  # r band


def _normal_logpdf(x, mean, std):
    z = (x - mean) / std
    return -0.5 * z * z - jnp.log(std) - 0.9189385332046727


def _beta_logpdf(x, a, b):
    """Normalized Beta(a, b) log-density (a, b are static Python floats)."""
    log_norm = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    return (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x) + log_norm


@dataclass(frozen=True)
class FluxPrior:
    """Reference-band log-normal + color prior (Gaussian by default, or an
    empirical ``ColorGMM`` — the reference's catalog-fit mixture over the
    stellar locus / galaxy bimodality; model/color_prior.py)."""

    log_ref_mean: float = 3.0       # log nanomaggies (~20 nmgy)
    log_ref_std: float = 3.0        # broad
    color_mean: tuple = (0.0, 0.0, 0.0, 0.0)
    color_std: tuple = (1.5, 1.5, 1.5, 1.5)
    ref_band: int = REF_BAND
    color_gmm: Optional[object] = None   # ColorGMM; overrides the Gaussian

    def logpdf(self, log_flux):
        """``log_flux`` [B] natural-log fluxes; returns the genuine
        CONSTRAINED-space density over the flux vector (true multivariate
        log-normal pdf, including the -sum(log flux) measure term).

        The map (f_0..f_{B-1}) -> (log f_ref, colors) is exp followed by a
        unit-determinant linear map, so the flux-space density is
        N(log f_ref) * prod_b N(c_b) / prod_b f_b.  Samplers working in
        unconstrained log-flux space add ``log_det_jacobian`` (= +sum log f)
        back, recovering the intended N x N density over (log f_ref, colors)
        — adding the Jacobian on top of a log-space density would tilt the
        posterior by prod_b f_b (effective log-flux mode mu + sigma^2).
        """
        b = log_flux.shape[-1]
        # clamp the reference slot into range so 2-band problems (b=2 with
        # the ugriz default ref_band=2) don't index out of bounds
        ref = min(self.ref_band, b - 1)
        lp = _normal_logpdf(log_flux[..., ref],
                            self.log_ref_mean, self.log_ref_std)
        if b > 1:
            colors = log_flux[..., :-1] - log_flux[..., 1:]
            if self.color_gmm is not None:
                lp = lp + self.color_gmm.logpdf(colors)
            else:
                mean = jnp.asarray(self.color_mean[: b - 1], jnp.float32)
                std = jnp.asarray(self.color_std[: b - 1], jnp.float32)
                lp = lp + jnp.sum(_normal_logpdf(colors, mean, std), axis=-1)
        # change of measure log-flux -> flux (makes this a real flux density)
        return lp - jnp.sum(log_flux, axis=-1)


@dataclass(frozen=True)
class PositionPrior:
    """Flat within a box of half-width ``halfwidth_arcsec`` around the scene
    reference; smooth Gaussian roll-off outside keeps the posterior proper
    and HMC-friendly."""

    halfwidth_arcsec: float = 60.0
    rolloff: float = 1.0

    def logpdf(self, du):
        excess = jnp.maximum(jnp.abs(du) - self.halfwidth_arcsec, 0.0)
        return -0.5 * jnp.sum((excess / self.rolloff) ** 2, axis=-1)


@dataclass(frozen=True)
class GalaxyShapePrior:
    """theta_dev ~ Beta(a,b); log sigma ~ N; ab ~ flat (0,1); phi ~ flat."""

    theta_a: float = 1.0
    theta_b: float = 1.0
    log_sigma_mean: float = 0.3     # ~1.35 arcsec
    log_sigma_std: float = 1.0
    ab_a: float = 1.0
    ab_b: float = 1.0

    def logpdf(self, theta_dev, sigma, ab, phi):
        """Genuine CONSTRAINED-space density over (theta_dev, sigma, ab,
        phi): normalized Betas, a true log-normal pdf on sigma (including the
        -log sigma measure term), and Uniform(0, pi) on the angle.
        Normalization constants matter here — Laplace-evidence star/galaxy
        classification compares models that differ exactly by this factor.
        """
        lp = _beta_logpdf(theta_dev, self.theta_a, self.theta_b)
        lp = lp + _normal_logpdf(jnp.log(sigma), self.log_sigma_mean,
                                 self.log_sigma_std) - jnp.log(sigma)
        lp = lp + _beta_logpdf(ab, self.ab_a, self.ab_b)
        # phi uniform over the pi-periodic angle
        return lp - jnp.log(jnp.pi)


@dataclass(frozen=True)
class SourcePriors:
    flux: FluxPrior = field(default_factory=FluxPrior)
    position: PositionPrior = field(default_factory=PositionPrior)
    shape: GalaxyShapePrior = field(default_factory=GalaxyShapePrior)

    def star_logpdf(self, params):
        return self.flux.logpdf(jnp.log(params.flux)) + self.position.logpdf(params.u)

    def galaxy_logpdf(self, params):
        return (
            self.flux.logpdf(jnp.log(params.flux))
            + self.position.logpdf(params.u)
            + self.shape.logpdf(params.theta_dev, params.sigma, params.ab, params.phi)
        )
