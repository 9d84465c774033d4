"""Source parameter pytrees + constrained<->unconstrained bijections
(SURVEY.md C6: the reference's unified ``SrcParams`` star/galaxy container).

The reference samples directly in constrained coordinates with gradient-free
kernels.  The TPU rebuild runs gradient-based samplers (HMC/NUTS), so every
constrained parameter gets an unconstrained reparameterization with the
log-|det Jacobian| correction applied to the log-posterior:

  position u        ->  raw arcsec offsets (unbounded; see stamp.py for why
                        device positions are offsets, not absolute ra/dec)
  flux (>0)         ->  log flux
  theta_dev (0,1)   ->  logit          (fraction of flux in the deV comp)
  sigma=r_e (>0)    ->  log sigma      (half-light radius, arcsec)
  ab (0,1)          ->  logit          (minor/major axis ratio)
  phi (angle)       ->  raw radians    (unbounded; profile is pi-periodic)

Flat-vector packing order (used by the samplers, which operate on a single
[D] vector per chain):
  star:    [du_e, du_n, log_flux_0..B-1]                     D = 2 + B
  galaxy:  [du_e, du_n, log_flux_0..B-1, logit_theta, log_sigma,
            logit_ab, phi]                                   D = 6 + B
(du_e, du_n are east/north arcsec offsets from the scene reference point.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softplus_inv(y):
    return y + jnp.log(-jnp.expm1(-y))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


@jax.tree_util.register_pytree_node_class
class StarParams:
    """Point source: sky position (arcsec offsets from the scene reference)
    + per-band fluxes (nanomaggies)."""

    def __init__(self, u, flux):
        self.u = u
        self.flux = flux

    def tree_flatten(self):
        return (self.u, self.flux), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_bands(self):
        return self.flux.shape[-1]

    # -- flat unconstrained vector protocol --------------------------------
    def to_vector(self):
        return jnp.concatenate([self.u, jnp.log(self.flux)], axis=-1)

    @classmethod
    def from_vector(cls, vec, n_bands):
        return cls(vec[..., :2], jnp.exp(vec[..., 2:2 + n_bands]))

    @staticmethod
    def log_det_jacobian(vec, n_bands):
        """log |d(constrained)/d(unconstrained)| for the exp transform; add
        to the constrained-space log prior when sampling unconstrained."""
        return jnp.sum(vec[..., 2:2 + n_bands], axis=-1)


@jax.tree_util.register_pytree_node_class
class GalaxyParams:
    """Galaxy: position, fluxes, and the 4 shape parameters of the Celeste
    model (SURVEY.md C5/C6; Hogg & Lang 2013 shape convention):

    theta_dev in (0,1) — fraction of flux in the deV profile (1-theta_dev in
        exp); the reference's exp/deV mixing weight.
    sigma > 0  — half-light radius of the circular profile, arcsec.
    ab in (0,1) — minor/major axis ratio.
    phi — position angle, radians (counterclockwise from +x/east).
    """

    def __init__(self, u, flux, theta_dev, sigma, ab, phi):
        self.u = u
        self.flux = flux
        self.theta_dev = theta_dev
        self.sigma = sigma
        self.ab = ab
        self.phi = phi

    def tree_flatten(self):
        return (self.u, self.flux, self.theta_dev, self.sigma, self.ab, self.phi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_bands(self):
        return self.flux.shape[-1]

    def to_vector(self):
        scalars = jnp.stack(
            [logit(self.theta_dev), jnp.log(self.sigma), logit(self.ab), self.phi], axis=-1
        )
        return jnp.concatenate([self.u, jnp.log(self.flux), scalars], axis=-1)

    @classmethod
    def from_vector(cls, vec, n_bands):
        b = n_bands
        return cls(
            u=vec[..., :2],
            flux=jnp.exp(vec[..., 2:2 + b]),
            theta_dev=sigmoid(vec[..., 2 + b]),
            sigma=jnp.exp(vec[..., 3 + b]),
            ab=sigmoid(vec[..., 4 + b]),
            phi=vec[..., 5 + b],
        )

    @staticmethod
    def log_det_jacobian(vec, n_bands):
        b = n_bands
        log_flux_term = jnp.sum(vec[..., 2:2 + b], axis=-1)
        lt = vec[..., 2 + b]
        ls = vec[..., 3 + b]
        la = vec[..., 4 + b]
        sig_ljd = lambda x: -x - 2.0 * jax.nn.softplus(-x)  # d sigmoid/dx in log
        return log_flux_term + sig_ljd(lt) + ls + sig_ljd(la)


def galaxy_shape_cov_arcsec(theta_unused, sigma, ab, phi):
    """On-sky shape covariance W (arcsec^2) of the elliptical profile:
    W = R(phi) diag(sigma^2, (ab*sigma)^2) R(phi)^T  (SURVEY.md C5).

    ``sigma`` is the semi-major-axis half-light radius; the circular profile
    tables are scaled by W so an ab=1 galaxy has half-light radius sigma.
    """
    c, s = jnp.cos(phi), jnp.sin(phi)
    maj = sigma**2
    mnr = (ab * sigma) ** 2
    w_xx = c * c * maj + s * s * mnr
    w_yy = s * s * maj + c * c * mnr
    w_xy = c * s * (maj - mnr)
    return jnp.stack(
        [jnp.stack([w_xx, w_xy], axis=-1), jnp.stack([w_xy, w_yy], axis=-1)], axis=-2
    )
