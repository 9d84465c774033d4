"""Photometric flux projection (SURVEY.md C14: the reference's
``project_to_bands`` — redshift the rest-frame SED, integrate against each
band's throughput).

Math (Miller et al. 2015): with rest SED f_rest(lam) = sum_b w_b B_b(lam),
observed-frame f_obs(lam) = m * f_rest(lam / (1+z)), photon-counting band
flux = sum_lam f_obs(lam) * resp(lam) * lam * dlam (resp pre-normalized in
FilterBank).  Discretized on each band's fixed observed grid; the basis is
linearly interpolated at lam/(1+z) with ``jnp.interp`` (differentiable in
z).  Shape: [K, L] basis x [n_bands, n_pts] grids -> [n_bands] fluxes; the
whole thing is a small gather + matmul, ideal under vmap over chains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celeste_tpu.quasar.basis import QuasarBasis
from celeste_tpu.quasar.filters import FilterBank


def basis_band_matrix(basis: QuasarBasis, filters: FilterBank, z):
    """[n_bands, K] matrix M(z): band flux of each unit basis spectrum at
    redshift z.  flux = m * M(z) @ w."""
    lam_rest_query = filters.lam / (1.0 + z)          # [n_bands, n_pts]

    def interp_one_basis(b_row):
        f = jnp.interp(lam_rest_query.ravel(), basis.lam_rest, b_row,
                       left=0.0, right=0.0)
        return f.reshape(filters.lam.shape)           # [n_bands, n_pts]

    fvals = jax.vmap(interp_one_basis)(basis.b)        # [K, n_bands, n_pts]
    weights = filters.resp * filters.lam * filters.dlam  # [n_bands, n_pts]
    # HIGHEST precision: these contractions are tiny, and the TPU default
    # (bf16) would bias fluxes at the few-1e-3 level — comparable to 0.1
    # sigma of typical photometric errors.
    return jnp.einsum("kbp,bp->bk", fvals, weights,
                      precision=jax.lax.Precision.HIGHEST)


def project_to_bands(basis: QuasarBasis, filters: FilterBank, w, m, z):
    """Model band fluxes [n_bands] for simplex weights w [K], scale m,
    redshift z."""
    mat = basis_band_matrix(basis, filters, z)         # [n_bands, K]
    return m * jnp.einsum("bk,k->b", mat, w, precision=jax.lax.Precision.HIGHEST)
