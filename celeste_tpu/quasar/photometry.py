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

from typing import NamedTuple

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


class BandMatrixGrid(NamedTuple):
    """``basis_band_matrix`` precomputed on a uniform z grid.

    The exact projection rebuilds the [n_bands, K] matrix from scratch at
    every likelihood eval: K interps of n_bands*n_pts query points into the
    n_grid template table — ~2e3 gathered points per eval, the dominant
    cost of the photo-z inner loop on TPU where gathers are slow.  M(z) is
    a FIXED function of (basis, filters), piecewise-smooth in z, so we
    tabulate it once on a uniform grid and linearly interpolate the 20-ish
    matrix entries per eval instead: index arithmetic + one tiny gather,
    differentiable in z through the interpolation weight (same smoothness
    class as the exact path — both are piecewise linear in their grids).
    Accuracy at the PhotoZConfig default of 8192 points over z in [0, 6]:
    worst-case model-flux deviation 3% of a 3%-photometry sigma, median
    1e-4 sigma (measured over 2048 random targets, default basis;
    tests/test_quasar.py gates it) — far below the likelihood noise floor.
    """

    table: jax.Array    # [n_z, n_bands, K]
    z_max: float
    n_basis: int


def band_matrix_grid(basis: QuasarBasis, filters: FilterBank,
                     z_max: float = 6.0, n_z: int = 8192) -> BandMatrixGrid:
    """Tabulate ``basis_band_matrix`` on ``n_z`` uniform redshifts in
    [0, z_max].  Eager (call OUTSIDE jit, once per (basis, filters, cfg));
    the ~[4096, 5, K] fp32 table is ~300 KB — loop-invariant in the
    sampling scan, so it stays resident on-chip."""
    zs = jnp.linspace(0.0, float(z_max), int(n_z))
    table = jax.jit(jax.vmap(
        lambda z: basis_band_matrix(basis, filters, z)))(zs)
    return BandMatrixGrid(table=table, z_max=float(z_max),
                          n_basis=int(basis.n_basis))


def project_to_bands_grid(grid: BandMatrixGrid, w, m, z):
    """Grid-accelerated :func:`project_to_bands`: linear interpolation of
    the tabulated band matrix in z.  Same signature semantics (w [K] simplex
    weights, m scale, z redshift -> [n_bands] fluxes)."""
    n_z = grid.table.shape[0]
    dz = grid.z_max / (n_z - 1)
    t = z / dz
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n_z - 2)
    frac = jnp.clip(t - i0.astype(t.dtype), 0.0, 1.0)
    mat = (1.0 - frac) * grid.table[i0] + frac * grid.table[i0 + 1]
    return m * jnp.einsum("bk,k->b", mat, w,
                          precision=jax.lax.Precision.HIGHEST)
