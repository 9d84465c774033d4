"""2-D Gaussian mixtures as pytrees — the L0 math core (SURVEY.md C18, C2).

Everything in the Celeste-style forward model is a mixture of 2-D Gaussians:
the PSF (C2), the exp/deV galaxy profiles (C4), and their analytic
convolution (C5).  This module defines one canonical pytree, ``MoG2D``, and
the dense math on it.  All functions are pure jnp, fully vmappable and
differentiable; the Pallas fast path in ``celeste_tpu.kernels`` consumes the
*flattened* precision-form parameters produced by :func:`precision_form`.

Conventions
-----------
- ``w``   — component weights, shape [K].  For a *unit profile* (PSF or a
  normalized galaxy profile) ``sum(w) == 1`` so the profile integrates to 1
  over the plane; photometric fluxes multiply in later.
- ``mu``  — component means, shape [K, 2], in *pixel* coordinates (x, y).
- ``cov`` — component covariances, shape [K, 2, 2], pixel^2 units.

No reference code was readable (SURVEY.md §0); the math follows the public
model papers (Hogg & Lang 2013, arXiv:1210.6563 §2-3; Regier et al. 2015).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


@jax.tree_util.register_pytree_node_class
class MoG2D:
    """A mixture of K bivariate Gaussians.  Registered pytree; arrays may
    carry arbitrary leading batch dimensions as long as they broadcast.
    """

    def __init__(self, w, mu, cov):
        self.w = w
        self.mu = mu
        self.cov = cov

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.w, self.mu, self.cov), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ----------------------------------------------------------------------
    @property
    def n_components(self) -> int:
        return self.w.shape[-1]

    def __repr__(self):  # pragma: no cover
        return f"MoG2D(K={self.w.shape[-1]}, w={self.w}, mu={self.mu}, cov={self.cov})"

    def shift(self, delta) -> "MoG2D":
        """Translate all components by ``delta`` (shape [2])."""
        return MoG2D(self.w, self.mu + jnp.asarray(delta)[..., None, :], self.cov)

    def scale_weights(self, s) -> "MoG2D":
        return MoG2D(self.w * s, self.mu, self.cov)


def mog(w, mu, cov) -> MoG2D:
    """Convenience constructor casting inputs to float32 jnp arrays."""
    return MoG2D(
        jnp.asarray(w, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(cov, jnp.float32),
    )


def precision_form(m: MoG2D):
    """Flatten a MoG to the (amp, mu, prec, half-log-det) tuple the fused
    kernels consume.

    For each component k with covariance ``S``:
      ``prec = inv(S)`` stored as its three unique entries (a, b, c) with
      ``inv(S) = [[a, b], [b, c]]``, and
      ``lognorm = -log(2*pi) - 0.5*log(det S)`` so that the density is
      ``exp(lognorm - 0.5*(a dx^2 + 2 b dx dy + c dy^2))``.

    Returns (amp[K], mu[K,2], prec_abc[K,3], lognorm[K]).
    """
    s = m.cov
    det = s[..., 0, 0] * s[..., 1, 1] - s[..., 0, 1] * s[..., 1, 0]
    inv_det = 1.0 / det
    a = s[..., 1, 1] * inv_det
    b = -s[..., 0, 1] * inv_det
    c = s[..., 0, 0] * inv_det
    lognorm = -_LOG_2PI - 0.5 * jnp.log(det)
    return m.w, m.mu, jnp.stack([a, b, c], axis=-1), lognorm


def eval_grid(m: MoG2D, px, py):
    """Evaluate the mixture density at pixel coordinates.

    ``px``/``py`` have any broadcastable shape [...]; returns density of the
    same shape.  Dense jnp path (reference/differentiable); the Pallas kernel
    in ``celeste_tpu.kernels.mog_field`` computes the same quantity fused
    with the Poisson reduction.
    """
    amp, mu, prec, lognorm = precision_form(m)
    dx = px[..., None] - mu[..., :, 0]  # [..., K]
    dy = py[..., None] - mu[..., :, 1]
    quad = prec[..., :, 0] * dx * dx + 2.0 * prec[..., :, 1] * dx * dy + prec[..., :, 2] * dy * dy
    comp = jnp.exp(lognorm - 0.5 * quad)
    return jnp.sum(amp * comp, axis=-1)


def logpdf_grid(m: MoG2D, px, py):
    """log density at (px, py) via logsumexp over components (numerically
    safe for tail pixels; used by priors and tests, not the hot path)."""
    amp, mu, prec, lognorm = precision_form(m)
    dx = px[..., None] - mu[..., :, 0]
    dy = py[..., None] - mu[..., :, 1]
    quad = prec[..., :, 0] * dx * dx + 2.0 * prec[..., :, 1] * dx * dy + prec[..., :, 2] * dy * dy
    logs = jnp.log(amp) + lognorm - 0.5 * quad
    return jax.scipy.special.logsumexp(logs, axis=-1)


def convolve(f: MoG2D, g: MoG2D) -> MoG2D:
    """Analytic MoG (*) MoG convolution (SURVEY.md C5; Hogg & Lang 2013 §3).

    The convolution of two Gaussian mixtures is the mixture over all
    component pairs with weights multiplied, means added, covariances added.
    ``f`` has J comps, ``g`` has K comps -> result has J*K comps.
    """
    J = f.w.shape[-1]
    K = g.w.shape[-1]
    w = (f.w[..., :, None] * g.w[..., None, :]).reshape(*f.w.shape[:-1], J * K)
    mu = (f.mu[..., :, None, :] + g.mu[..., None, :, :]).reshape(*f.mu.shape[:-2], J * K, 2)
    cov = (f.cov[..., :, None, :, :] + g.cov[..., None, :, :, :]).reshape(
        *f.cov.shape[:-3], J * K, 2, 2
    )
    return MoG2D(w, mu, cov)


def concat(ms) -> MoG2D:
    """Concatenate several mixtures into one (for multi-source fields)."""
    return MoG2D(
        jnp.concatenate([m.w for m in ms], axis=-1),
        jnp.concatenate([m.mu for m in ms], axis=-2),
        jnp.concatenate([m.cov for m in ms], axis=-3),
    )


def isotropic(w, mu, var) -> MoG2D:
    """Build a mixture of isotropic components: ``var`` shape [K]."""
    w = jnp.asarray(w, jnp.float32)
    var = jnp.asarray(var, jnp.float32)
    eye = jnp.eye(2, dtype=jnp.float32)
    cov = var[..., None, None] * eye
    return MoG2D(w, jnp.asarray(mu, jnp.float32), cov)
