"""Within-MCMC star<->galaxy type switching (SURVEY.md C11: the reference's
``SrcParams`` carries a type indicator a in {star, galaxy} and its samplers
may switch types mid-chain).

Trans-dimensional RJMCMC needs per-step shape changes — hostile to XLA's
static-shape compilation — so this is the Carlin & Chib (1995) composite-
model sampler, which is *exactly* equivalent in output semantics and is a
fixed-shape program: carry BOTH parameter blocks at all times,

    p(a, x_s, x_g | data)  ∝  p(a) · L_a(data | x_a) · pi_a(x_a)
                                   · psi_{~a}(x_{~a}),

where psi_k is the *pseudo-prior* for the inactive block.  Each sweep:

  1. active block  <- one HMC step w.r.t. its posterior conditional;
  2. inactive block <- exact draw from its pseudo-prior (Gaussian);
  3. a <- Bernoulli on the marginal log-odds
         [logp_s(x_s) - psi_s(x_s)] - [logp_g(x_g) - psi_g(x_g)] + prior.

Both branches run every step (compute is 2x one model, shapes static); the
indicator selects with ``jnp.where``.  Mixing of ``a`` is governed by how
well psi matches the true conditional posterior — we fit psi by
MAP + Laplace (inference/model_select.py machinery), the same Gaussian
that makes the evidence approximation accurate, so the indicator
acceptance is near-ideal on well-identified sources.

Relation to ``classify_source``: Laplace evidence is the *approximation*
p_star ~= sigmoid(log Z_s - log Z_g); this sampler gives the asymptotically
exact posterior E[a] under full parameter uncertainty.  The agreement test
(tests/test_type_switch.py) checks both against each other.

Everything is jittable and vmappable over chains: state is a NamedTuple of
fixed-shape arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from celeste_tpu.inference.hmc import HMCState, hmc_init, hmc_kernel
from celeste_tpu.inference.map_fit import map_fit


class GaussianPseudoPrior(NamedTuple):
    """Dense Gaussian psi(x) = N(mean, cov) with cov = L L^T."""
    mean: jax.Array       # [D]
    chol: jax.Array       # [D, D] lower
    logdet_cov: jax.Array  # scalar: log det(cov)

    def logpdf(self, x):
        d = x.shape[-1]
        z = jax.scipy.linalg.solve_triangular(self.chol, x - self.mean,
                                              lower=True)
        return (-0.5 * jnp.sum(z * z, -1)
                - 0.5 * (d * jnp.log(2.0 * jnp.pi) + self.logdet_cov))

    def sample(self, key):
        z = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.chol @ z


def fit_pseudo_prior(logdensity_fn, x0, n_map_steps: int = 400,
                     jitter: float = 1e-5):
    """Laplace fit psi ~= posterior of one model: MAP by Adam, covariance
    = inverse negative Hessian (regularized).  Returns the pseudo-prior and
    the Laplace log-evidence (reusable for initializing p(a)).

    ``logdet_cov`` is computed FROM THE CHOL ACTUALLY SAMPLED WITH (the
    post-inversion jitter changes the covariance in sharply-constrained
    directions by up to ~2 nats; logpdf and sample must describe the same
    Gaussian or the Carlin-Chib indicator odds carry a dimension-dependent
    bias).  The evidence reuses the Hessian already computed here — it is
    the dominant cost (D^2 gradients through the render)."""
    x_map, _ = map_fit(logdensity_fn, jnp.asarray(x0), n_steps=n_map_steps)
    h = jax.hessian(logdensity_fn)(x_map)
    d = x_map.shape[0]
    neg_h = -(h + h.T) / 2.0
    # eigenvalue floor (ADVICE r2): at a poorly converged or boundary MAP
    # (e.g. galaxy model fit to a point source) the regularized negative
    # Hessian can be indefinite — cholesky would silently return NaN and
    # poison the whole type-switch run.  Clamping the spectrum keeps the
    # pseudo-prior a proper Gaussian in every direction; the clamped
    # directions just get wide (variance 1/jitter) instead of invalid.
    evals, evecs = jnp.linalg.eigh(neg_h)
    evals = jnp.maximum(evals, jitter)
    cov = (evecs * (1.0 / evals)[None, :]) @ evecs.T
    cov = (cov + cov.T) / 2.0
    chol = jnp.linalg.cholesky(cov)
    logdet_cov = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    pseudo = GaussianPseudoPrior(mean=x_map, chol=chol,
                                 logdet_cov=logdet_cov)
    # Laplace evidence from the same clamped spectrum (identical to the
    # raw Hessian whenever it was already positive definite)
    logdet_prec = jnp.sum(jnp.log(evals))
    evidence = (logdensity_fn(x_map) + 0.5 * d * jnp.log(2.0 * jnp.pi)
                - 0.5 * logdet_prec)
    return pseudo, evidence


class TypeSwitchState(NamedTuple):
    a: jax.Array           # scalar int32: 0 = star, 1 = galaxy
    star: HMCState         # star-block HMC state (x, logp, grad)
    gal: HMCState          # galaxy-block HMC state


class TypeSwitchInfo(NamedTuple):
    p_star_cond: jax.Array   # conditional P(a=star | blocks) this step
    accept_star: jax.Array   # active-block HMC accept prob (star branch)
    accept_gal: jax.Array


def type_switch_init(x0_star, x0_gal, logd_star, logd_gal,
                     a0: int = 0) -> TypeSwitchState:
    return TypeSwitchState(
        a=jnp.asarray(a0, jnp.int32),
        star=hmc_init(x0_star, logd_star),
        gal=hmc_init(x0_gal, logd_gal))


def type_switch_kernel(logd_star, logd_gal, pseudo_star: GaussianPseudoPrior,
                       pseudo_gal: GaussianPseudoPrior,
                       step_size_star, step_size_gal,
                       n_leapfrog: int = 8, prior_star: float = 0.5):
    """Build the Carlin-Chib sweep ``(key, state) -> (state, info)``.

    ``step_size_*``: HMC step sizes for each block's conditional update;
    the inverse mass is taken from the pseudo-prior's diagonal covariance
    (Laplace variances), which is the right preconditioner at the mode.
    """
    inv_mass_s = jnp.sum(pseudo_star.chol ** 2, axis=1)   # diag of cov
    inv_mass_g = jnp.sum(pseudo_gal.chol ** 2, axis=1)
    hmc_s = hmc_kernel(logd_star, step_size_star, inv_mass_s,
                       n_leapfrog=n_leapfrog)
    hmc_g = hmc_kernel(logd_gal, step_size_gal, inv_mass_g,
                       n_leapfrog=n_leapfrog)
    log_prior_odds = jnp.log(prior_star) - jnp.log1p(-prior_star)

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def step(key, state: TypeSwitchState):
        k_hs, k_hg, k_ps, k_pg, k_a = jax.random.split(key, 5)
        is_star = state.a == 0

        # 1+2. both blocks advance every step (static shapes); the indicator
        # picks posterior-HMC for the active block, pseudo-prior refresh for
        # the inactive one
        star_hmc, info_s = hmc_s(k_hs, state.star)
        gal_hmc, info_g = hmc_g(k_hg, state.gal)
        xs_pseudo = pseudo_star.sample(k_ps)
        xg_pseudo = pseudo_gal.sample(k_pg)
        star_pseudo = hmc_init(xs_pseudo, logd_star)
        gal_pseudo = hmc_init(xg_pseudo, logd_gal)
        star_new = _select(is_star, star_hmc, star_pseudo)
        gal_new = _select(is_star, gal_pseudo, gal_hmc)

        # 3. Gibbs update of the indicator given both blocks
        log_odds = ((star_new.logp - pseudo_star.logpdf(star_new.x))
                    - (gal_new.logp - pseudo_gal.logpdf(gal_new.x))
                    + log_prior_odds)
        p_star_cond = jax.nn.sigmoid(log_odds)
        a_new = jnp.where(jax.random.uniform(k_a) < p_star_cond, 0, 1
                          ).astype(jnp.int32)
        new = TypeSwitchState(a=a_new, star=star_new, gal=gal_new)
        info = TypeSwitchInfo(p_star_cond=p_star_cond,
                              accept_star=info_s.accept_prob,
                              accept_gal=info_g.accept_prob)
        return new, info

    return step


def run_type_switch(key, kernel, state: TypeSwitchState, n_steps: int):
    """Scan the sweep; returns (a_trace [n], star_x [n, Ds], gal_x [n, Dg],
    final state, info).  vmap over chains for an ensemble."""

    def body(st, k):
        st, info = kernel(k, st)
        return st, (st.a, st.star.x, st.gal.x, info)

    keys = jax.random.split(key, n_steps)
    state, (a_tr, xs_tr, xg_tr, infos) = jax.lax.scan(body, state, keys)
    return a_tr, xs_tr, xg_tr, state, infos


def sample_source_type_core(key, logd_s, logd_g, x0_star, x0_gal,
                            prior_star: float = 0.5, n_chains: int = 8,
                            n_steps: int = 400, n_warmup_frac: float = 0.25,
                            n_map_steps: int = 400, step_scale: float = 0.5,
                            n_leapfrog: int = 8):
    """The Carlin-Chib run against EXPLICIT logdensities: fit pseudo-priors,
    run a chain ensemble of the composite sampler, return posterior P(star)
    with full parameter uncertainty.  Fully traceable (jit/vmap over
    candidates — the pipeline's ambiguous-band pass vmaps this with
    per-candidate effective skies as traced closure data).

    ``step_scale`` is the dimensionless HMC step in the Laplace-whitened
    metric (the inverse mass already carries the scales).
    """
    pseudo_s, _ = fit_pseudo_prior(logd_s, x0_star, n_map_steps=n_map_steps)
    pseudo_g, _ = fit_pseudo_prior(logd_g, x0_gal, n_map_steps=n_map_steps)

    kern = type_switch_kernel(logd_s, logd_g, pseudo_s, pseudo_g,
                              step_size_star=step_scale,
                              step_size_gal=step_scale,
                              n_leapfrog=n_leapfrog, prior_star=prior_star)
    k_init, k_run = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_chains)

    def one_init(k):
        ks, kg, ka = jax.random.split(k, 3)
        st = type_switch_init(pseudo_s.sample(ks), pseudo_g.sample(kg),
                              logd_s, logd_g,
                              a0=0)
        a0 = jnp.where(jax.random.uniform(ka) < prior_star, 0, 1
                       ).astype(jnp.int32)
        return st._replace(a=a0)

    states = jax.vmap(one_init)(init_keys)
    run = jax.vmap(lambda k, st: run_type_switch(k, kern, st, n_steps))
    a_tr, xs_tr, xg_tr, _, infos = run(jax.random.split(k_run, n_chains),
                                       states)
    burn = int(n_steps * n_warmup_frac)
    a_kept = a_tr[:, burn:]
    # Rao-Blackwellized P(star): average the CONDITIONAL probabilities
    # (lower variance than the 0/1 indicator mean)
    p_star = jnp.mean(infos.p_star_cond[:, burn:])

    # conditional-posterior means: x_star is a genuine posterior draw only
    # while the chain occupies the star model (a==0); in the other model it
    # is a pseudo-prior (Laplace) refresh.  An unmasked mean would mix the
    # two and bias state estimates toward the Laplace mean on skewed
    # posteriors, so mask by the indicator (fall back to the unmasked mean
    # if a chain never visits a model — then only the pseudo-prior draws
    # exist, and they are at least MAP-centered).
    a_kept_f = a_kept.astype(jnp.float32)          # 1 = galaxy model
    def _cond_mean(x, w):
        den = jnp.sum(w)
        num = jnp.sum(x * w[:, :, None], axis=(0, 1))
        return jnp.where(den > 0, num / jnp.maximum(den, 1.0),
                         jnp.mean(x, axis=(0, 1)))
    xs_kept, xg_kept = xs_tr[:, burn:], xg_tr[:, burn:]
    return {
        "p_star": p_star,
        "p_star_indicator": 1.0 - jnp.mean(a_kept_f),
        "a_trace": a_tr,
        "x_star_samples": xs_kept,
        "x_gal_samples": xg_kept,
        "x_star_mean": _cond_mean(xs_kept, 1.0 - a_kept_f),
        "x_gal_mean": _cond_mean(xg_kept, a_kept_f),
        "switch_rate": jnp.mean(jnp.abs(jnp.diff(a_tr, axis=1)).astype(
            jnp.float32)),
    }


def sample_source_type(key, stamps, bands, x0_star, x0_gal, priors=None,
                       n_bands: int = 5, prior_star: float = 0.5,
                       n_chains: int = 8, n_steps: int = 400,
                       n_warmup_frac: float = 0.25, n_map_steps: int = 400,
                       step_scale: float = 0.5, n_leapfrog: int = 8):
    """End-to-end convenience wrapper: build the unconditional star/galaxy
    logdensities from stamps and run ``sample_source_type_core``."""
    from celeste_tpu.inference.problems import (
        make_galaxy_logdensity, make_star_logdensity,
    )

    logd_s = make_star_logdensity(stamps, bands, priors=priors,
                                  n_bands=n_bands)
    logd_g = make_galaxy_logdensity(stamps, bands, priors=priors,
                                    n_bands=n_bands)
    return sample_source_type_core(
        key, logd_s, logd_g, x0_star, x0_gal, prior_star=prior_star,
        n_chains=n_chains, n_steps=n_steps, n_warmup_frac=n_warmup_frac,
        n_map_steps=n_map_steps, step_scale=step_scale,
        n_leapfrog=n_leapfrog)
