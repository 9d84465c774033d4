"""Star-vs-galaxy source classification (SURVEY.md C11: the reference's
source-type handling — its ``SrcParams`` carries a type indicator
a in {star, galaxy} and the samplers may switch types).

Trans-dimensional RJMCMC is hostile to fixed-shape TPU programs, so the
rebuild uses the standard alternative with identical output semantics:
fit BOTH models, estimate each marginal likelihood by Laplace
approximation at the MAP, and report the posterior type probability.
(The Laplace evidence is the textbook approximation:
log Z ~= logp(x*) + D/2 log 2pi - 0.5 log det(-H(x*)); for these
low-dimensional unimodal conditionals it is accurate to ~a nat, ample for
type selection.)  Everything is differentiable jnp: MAP by Adam,
Hessian by ``jax.hessian``, batched over sources via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from celeste_tpu.inference.map_fit import map_fit


def laplace_evidence(logdensity_fn, x_map):
    """log Z via Laplace approximation at (approximate) mode ``x_map``."""
    x_map = jnp.asarray(x_map)
    d = x_map.shape[0]
    logp = logdensity_fn(x_map)
    h = jax.hessian(logdensity_fn)(x_map)
    # -H must be PSD at a mode; regularize slightly for flat directions
    neg_h = -(h + h.T) / 2.0 + 1e-6 * jnp.eye(d)
    sign, logdet = jnp.linalg.slogdet(neg_h)
    logdet = jnp.where(sign > 0, logdet, jnp.inf)   # not a max -> evidence -inf
    return logp + 0.5 * d * jnp.log(2.0 * jnp.pi) - 0.5 * logdet


def classify_source(stamps, bands, x0_star, x0_galaxy, priors=None,
                    n_bands: int = 5, prior_star: float = 0.5,
                    n_map_steps: int = 400):
    """Posterior P(star | data) for one source.

    ``x0_star``/``x0_galaxy``: unconstrained init vectors for each model
    (e.g. from detection + defaults).  Returns dict with p_star, the two
    log evidences, and both MAP vectors.
    """
    from celeste_tpu.inference.problems import (
        make_galaxy_logdensity,
        make_star_logdensity,
    )

    logd_s = make_star_logdensity(stamps, bands, priors=priors, n_bands=n_bands)
    logd_g = make_galaxy_logdensity(stamps, bands, priors=priors, n_bands=n_bands)

    xs, _ = map_fit(logd_s, jnp.asarray(x0_star), n_steps=n_map_steps)
    xg, _ = map_fit(logd_g, jnp.asarray(x0_galaxy), n_steps=n_map_steps)

    log_z_s = laplace_evidence(logd_s, xs)
    log_z_g = laplace_evidence(logd_g, xg)

    log_odds = (log_z_s + jnp.log(prior_star)) - (log_z_g + jnp.log1p(-prior_star))
    p_star = jax.nn.sigmoid(log_odds)
    return {
        "p_star": p_star,
        "log_evidence_star": log_z_s,
        "log_evidence_galaxy": log_z_g,
        "x_map_star": xs,
        "x_map_galaxy": xg,
    }
