"""Galaxy profile mixtures (SURVEY.md C4/C5): the fixed exp/deV MoG tables
and the theta-mixed, shape-scaled, PSF-convolved galaxy profile.

Math (Hogg & Lang 2013 arXiv:1210.6563 §2-3; Regier et al. 2015 eq. 5-8):
the circular unit profile is a fixed mixture ``sum_j a_j N(x; 0, v_j I)``;
an elliptical galaxy scales each component's covariance by the shape matrix
``W = R(phi) diag(sigma^2, (ab sigma)^2) R(phi)^T``; convolution with the
MoG PSF is the analytic pairwise MoG convolution.  Table constants are
*fitted from scratch* by ``scripts/fit_profile_tables.py`` (not transcribed
from the paper) and validated by ``tests/test_profiles.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

from celeste_tpu.model._profile_tables import DEV_AMPS, DEV_VARS, EXP_AMPS, EXP_VARS
from celeste_tpu.mog import MoG2D

N_EXP = len(EXP_AMPS)   # 6
N_DEV = len(DEV_AMPS)   # 10
N_GAL = N_EXP + N_DEV   # total components of the theta-mixed profile

_GAL_AMPS_EXP = jnp.asarray(EXP_AMPS, jnp.float32)
_GAL_VARS_EXP = jnp.asarray(EXP_VARS, jnp.float32)
_GAL_AMPS_DEV = jnp.asarray(DEV_AMPS, jnp.float32)
_GAL_VARS_DEV = jnp.asarray(DEV_VARS, jnp.float32)


def galaxy_profile_mog(theta_dev, shape_cov_px) -> MoG2D:
    """Unit-flux galaxy profile in pixel coords, BEFORE PSF convolution.

    Parameters
    ----------
    theta_dev : scalar in (0,1) — fraction of flux in the deV component.
    shape_cov_px : [2,2] — pixel-space shape covariance ``J W_sky J^T``
        (variance units of the tables are the squared half-light radius, so
        each table variance multiplies this matrix).

    Returns a MoG2D with N_GAL = N_EXP + N_DEV zero-centered components;
    weights sum to 1.
    """
    w = jnp.concatenate([
        (1.0 - theta_dev) * _GAL_AMPS_EXP,
        theta_dev * _GAL_AMPS_DEV,
    ])
    vars_ = jnp.concatenate([_GAL_VARS_EXP, _GAL_VARS_DEV])
    cov = vars_[:, None, None] * shape_cov_px[None, :, :]
    mu = jnp.zeros((N_GAL, 2), jnp.float32)
    return MoG2D(w, mu, cov)


def block_support_radii(kinds, psf_sigma_px, gal_sigma_px, rel_eps: float = 1e-4,
                        slack_px: float = 2.0):
    """Per-BLOCK support radii [S, N_GAL] for the block tile maps
    (parallel.tiles.build_block_tile_map).

    The reference bounds every source by one box; here each component
    block gets its own truncation radius from its own scale AND amplitude:
    a block of table weight a_j and total std sigma_j contributes less than
    ``rel_eps`` of a unit-flux source outside

        r_j = sigma_j * sqrt(2 ln(a_j / rel_eps)) + slack_px,

    so the wide deV wing keeps its big halo while the core blocks (and the
    PSF-dominated exp cores) stop inflating every neighboring tile's
    S_MAX.  Blocks with a_j <= rel_eps get radius -1: they are dropped from
    the tile lists entirely (the zero/epsilon-amplitude deV core rows).

    ``psf_sigma_px``: max PSF component std (pixels); ``gal_sigma_px``: an
    UPPER estimate of the galaxy half-light radius over the run (the tile
    map is static while positions/shapes are sampled — pass catalog sigma
    x a safety factor, and ``slack_px`` covers position movement).  Star
    rows put the PSF-only radius in column 0 (a star owns one block).
    theta-mixing is bounded by 1, so raw table amplitudes are the bound.
    """
    import numpy as np

    kinds = list(kinds)
    amps = np.concatenate([np.asarray(EXP_AMPS), np.asarray(DEV_AMPS)])
    varz = np.concatenate([np.asarray(EXP_VARS), np.asarray(DEV_VARS)])
    sig_g = np.sqrt(varz * float(gal_sigma_px) ** 2 + float(psf_sigma_px) ** 2)
    with np.errstate(divide="ignore"):
        arg = 2.0 * np.log(amps / rel_eps)
    r_gal = np.where(amps > rel_eps,
                     sig_g * np.sqrt(np.maximum(arg, 0.0)) + slack_px, -1.0)
    r_star = (float(psf_sigma_px) * np.sqrt(2.0 * np.log(1.0 / rel_eps))
              + slack_px)
    out = np.full((len(kinds), N_GAL), -1.0)
    for i, kind in enumerate(kinds):
        if kind == "star":
            out[i, 0] = r_star
        else:
            out[i] = r_gal
    return out
