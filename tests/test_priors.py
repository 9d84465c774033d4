"""Prior convention gate (ADVICE r1, high): the priors are genuine
CONSTRAINED-space densities, so prior + log|det J| — the quantity every
sampler targets — must be exactly the intended unconstrained density.
A double-count (log-space density + Jacobian) would tilt the effective
log-flux prior mode from mu to mu + sigma^2; these tests pin that down by
quadrature so the bug class can't silently return."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.model.priors import FluxPrior, GalaxyShapePrior, SourcePriors


def _norm_logpdf(x, mu, sd):
    return -0.5 * ((x - mu) / sd) ** 2 - math.log(sd) - 0.5 * math.log(2 * math.pi)


def _star_unconstrained_logprior(priors, vec, n_bands):
    p = StarParams.from_vector(vec, n_bands)
    return priors.star_logpdf(p) + StarParams.log_det_jacobian(vec, n_bands)


def _gal_unconstrained_logprior(priors, vec, n_bands):
    p = GalaxyParams.from_vector(vec, n_bands)
    return priors.galaxy_logpdf(p) + GalaxyParams.log_det_jacobian(vec, n_bands)


def test_star_unconstrained_flux_prior_is_exactly_normal():
    """prior(constrained) + Jacobian, as a function of log-flux at du=0,
    must equal the N(mu, sigma) log-density pointwise (1-band model)."""
    mu, sd = 3.0, 3.0
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=mu, log_ref_std=sd))
    grid = np.linspace(mu - 4 * sd, mu + 4 * sd, 101)
    got = np.array([
        float(_star_unconstrained_logprior(
            priors, jnp.asarray([0.0, 0.0, g], jnp.float32), 1))
        for g in grid
    ])
    want = _norm_logpdf(grid, mu, sd)  # position prior contributes 0 at du=0
    np.testing.assert_allclose(got, want, atol=1e-4)
    # mode at mu, NOT mu + sigma^2 (the double-count signature)
    assert abs(grid[np.argmax(got)] - mu) < 0.5


def test_star_unconstrained_prior_normalizes_multiband():
    """5-band: integrate exp(prior + J) over (log f_ref, colors) == 1."""
    priors = SourcePriors(flux=FluxPrior())
    fp = priors.flux
    # evaluate on a product grid in (log_f_ref, c0..c3) mapped to log-fluxes
    n = 41
    ref_grid = np.linspace(fp.log_ref_mean - 6 * fp.log_ref_std,
                           fp.log_ref_mean + 6 * fp.log_ref_std, n)
    # colors are independent normals; check per-axis normalization by
    # integrating each 1-D conditional (separability of the density).
    dv = ref_grid[1] - ref_grid[0]
    lp_ref = np.array([
        float(_star_unconstrained_logprior(
            priors,
            jnp.asarray([0.0, 0.0, g, g, g, g, g], jnp.float32), 5))
        for g in ref_grid
    ])
    # holding colors fixed at 0 (log-fluxes all equal), the slice over the
    # common shift is the ref-band normal; its integral * the colors'
    # density at 0 must match the analytic product.
    colors_at_zero = 4 * _norm_logpdf(0.0, 0.0, 1.5)
    total = np.sum(np.exp(lp_ref - colors_at_zero)) * dv
    np.testing.assert_allclose(total, 1.0, rtol=2e-3)


def test_galaxy_unconstrained_sigma_prior_is_exactly_normal():
    mu, sd = 0.3, 1.0
    priors = SourcePriors(shape=GalaxyShapePrior(log_sigma_mean=mu,
                                                 log_sigma_std=sd))
    grid = np.linspace(mu - 4 * sd, mu + 4 * sd, 81)
    base = None
    got = []
    for g in grid:
        vec = jnp.asarray([0.0, 0.0, 1.0, 0.0, g, 0.0, 0.5], jnp.float32)
        got.append(float(_gal_unconstrained_logprior(priors, vec, 1)))
    got = np.array(got)
    want = _norm_logpdf(grid, mu, sd)
    # equal up to the (constant in sigma) other-param contributions
    np.testing.assert_allclose(got - got[40], want - want[40], atol=1e-4)
    assert abs(grid[np.argmax(got)] - mu) < 0.3


def test_galaxy_shape_prior_normalizes():
    """The unconstrained shape prior is separable over (logit_theta,
    log_sigma, logit_ab, phi).  For each axis, integrate the joint over a
    grid with the other axes fixed; dividing out the known analytic value of
    this axis's factor at the anchor point isolates the constant other-axes
    contribution, so the integral must come out to exactly 1.  Laplace
    star/galaxy classification depends on these constants being right."""
    ta, tb, aa, ab_ = 2.0, 3.0, 1.5, 1.0
    mu_s, sd_s = 0.3, 1.0
    priors = SourcePriors(shape=GalaxyShapePrior(
        theta_a=ta, theta_b=tb, log_sigma_mean=mu_s, log_sigma_std=sd_s,
        ab_a=aa, ab_b=ab_))

    def joint(lt, ls, la, phi):
        vec = jnp.asarray([0.0, 0.0, 1.0, lt, ls, la, phi], jnp.float32)
        return float(_gal_unconstrained_logprior(priors, vec, 1))

    def beta_logit_density(x, a, b):
        """density of logit(Beta(a,b)) at x."""
        p = 1.0 / (1.0 + math.exp(-x))
        log_norm = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        return math.exp((a - 1.0) * math.log(p) + (b - 1.0) * math.log(1 - p)
                        + log_norm + math.log(p * (1 - p)))

    anchors = [0.0, 0.0, 0.0, 0.1]
    factor_at_anchor = [
        beta_logit_density(0.0, ta, tb),
        math.exp(_norm_logpdf(0.0, mu_s, sd_s)),
        beta_logit_density(0.0, aa, ab_),
    ]
    for axis, (lo, hi, n) in enumerate([(-12.0, 12.0, 481), (-5.3, 5.9, 225),
                                        (-12.0, 12.0, 481)]):
        grid = np.linspace(lo, hi, n)
        dv = grid[1] - grid[0]
        vals = []
        for g in grid:
            c = list(anchors)
            c[axis] = float(g)
            vals.append(joint(*c))
        vals = np.array(vals)
        at_anchor = joint(*anchors)  # = log f_axis(anchor) + C_other
        log_c_other = at_anchor - math.log(factor_at_anchor[axis])
        total = np.sum(np.exp(vals - log_c_other)) * dv
        np.testing.assert_allclose(total, 1.0, rtol=5e-3,
                                   err_msg=f"axis {axis} not normalized")


def test_e2e_oracle_convention_matches():
    """The exact contract the e2e parity tests rely on: the JAX posterior's
    prior block equals the oracle's bare N(log f; mu, sd) term."""
    mu, sd = math.log(30.0), 2.0
    priors = SourcePriors(flux=FluxPrior(log_ref_mean=mu, log_ref_std=sd))
    for lf in (mu - 2.0, mu, mu + 1.3):
        vec = jnp.asarray([0.0, 0.0, lf], jnp.float32)
        got = float(_star_unconstrained_logprior(priors, vec, 1))
        want = -0.5 * ((lf - mu) / sd) ** 2 - math.log(sd) \
            - 0.5 * math.log(2 * math.pi)
        assert abs(got - want) < 1e-4
