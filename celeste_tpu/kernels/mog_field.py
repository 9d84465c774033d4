"""Fused MoG-field render + Poisson log-likelihood Pallas kernel.

This is the TPU-native replacement for the reference's hot loop
(SURVEY.md §3.1: ``gen_model_image`` + ``celeste_likelihood`` — K-component
MoG evaluated per pixel, then a Poisson reduction).  Design:

- Chains (or proposals, or chain×band products) are the batch axis B;
  each chain carries C Gaussian components (C = PSF comps for a star,
  J*K for a galaxy, or a concatenation over sources for a scene).
- Per-chain component parameters arrive in *precision form* (see
  ``celeste_tpu.mog.precision_form``) as [B, C] planes: effective
  amplitude (flux x iota x weight x normalizer), center, inverse-cov
  entries.  They are produced by cheap vmapped jnp on [B, C]-sized data;
  the kernel spends its time on the [B, PIX] work.
- The kernel tiles B into rows of a (B_TILE, PIX_PAD) block, broadcasts
  each component's scalars down a column, evaluates
  lambda = sky + sum_c amp_c * exp(-0.5 * quad_c) with the component loop
  unrolled (C is static), and reduces counts*log(lambda) - lambda in
  register — one scalar out per chain, nothing written to HBM but [B].
- Pixels are pre-flattened and padded to a lane multiple (128); masked
  lanes contribute exactly 0.

Gradients: the public entry is a ``jax.custom_vjp`` whose forward is the
Pallas kernel and whose backward is JAX-autodiff of the identical jnp
reference implementation (``_loglik_jnp``) — bitwise-comparable math, so
HMC/NUTS get exact gradients while MH/slice run the pure fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from celeste_tpu.likelihood._pixel import pixel_loglik

LANE = 128
# b_tile sweep on v5e (scripts/tpu_session2.py, B=65536 star):
# 128: 3.40e7, 256: 3.78e7, 512: 3.58e7, 1024: 3.69e7 evals/s -> 256
DEFAULT_B_TILE = 256


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def stamp_pixel_data(stamp):
    """Flatten a Stamp's pixel grids into kernel-ready padded [1, PIX_PAD]
    arrays: (px, py, counts, sky, mask)."""
    px, py = stamp.pixel_grid()
    counts = stamp.counts.ravel()
    sky = stamp.sky.ravel()
    mask = stamp.mask.ravel()
    pix = px.shape[0]
    pix_pad = ((pix + LANE - 1) // LANE) * LANE
    px = _pad_to(px, pix_pad, 0)[None, :]
    py = _pad_to(py, pix_pad, 0)[None, :]
    counts = _pad_to(counts, pix_pad, 0)[None, :]
    sky = _pad_to(sky, pix_pad, 0, value=1.0)[None, :]   # keep log() finite
    mask = _pad_to(mask, pix_pad, 0)[None, :]
    return px, py, counts, sky, mask


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _loglik_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                   px_ref, py_ref, counts_ref, sky_ref, mask_ref, out_ref,
                   *, n_comp: int, centered: bool):
    px = px_ref[0:1, :]
    py = py_ref[0:1, :]
    b_t = amp_ref.shape[0]
    lam = jnp.broadcast_to(sky_ref[0:1, :], (b_t, px.shape[1])).astype(jnp.float32)
    for c in range(n_comp):
        # fold the amplitude into the exponent: exp(log amp - quad/2) saves
        # one multiply per pixel per component; log(0)=-inf for padded rows
        # yields exactly 0 contribution
        log_amp = jnp.log(amp_ref[:, c:c + 1])
        nha = -0.5 * pa_ref[:, c:c + 1]
        nhb = -pb_ref[:, c:c + 1]
        nhc = -0.5 * pc_ref[:, c:c + 1]
        dx = px - mx_ref[:, c:c + 1]
        dy = py - my_ref[:, c:c + 1]
        arg = log_amp + nha * dx * dx + nhb * dx * dy + nhc * dy * dy
        lam = lam + jnp.exp(arg)
    ll = pixel_loglik(lam, counts_ref[0:1, :], centered) * mask_ref[0:1, :]
    out_ref[:, 0] = jnp.sum(ll, axis=1)


def _render_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                   px_ref, py_ref, sky_ref, out_ref, *, n_comp: int):
    px = px_ref[0:1, :]
    py = py_ref[0:1, :]
    lam = jnp.broadcast_to(sky_ref[0:1, :], (amp_ref.shape[0], px.shape[1])).astype(jnp.float32)
    for c in range(n_comp):
        dx = px - mx_ref[:, c:c + 1]
        dy = py - my_ref[:, c:c + 1]
        quad = (pa_ref[:, c:c + 1] * dx * dx
                + 2.0 * pb_ref[:, c:c + 1] * dx * dy
                + pc_ref[:, c:c + 1] * dy * dy)
        lam = lam + amp_ref[:, c:c + 1] * jnp.exp(-0.5 * quad)
    out_ref[:, :] = lam


# ---------------------------------------------------------------------------
# jnp reference (also the autodiff path)
# ---------------------------------------------------------------------------

def _loglik_jnp(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                centered: bool = False):
    """Identical math to the kernel, dense jnp: [B, C] params, [1, P] pixels
    -> [B] logliks.  Used for the custom-vjp backward and as the CPU/debug
    fallback.  The backward may stay UNCENTERED regardless of the forward's
    flag: centering adds per-pixel terms independent of the parameters, so
    the VJP is identical."""
    dx = px[:, None, :] - mx[..., None]          # [B, C, P] via broadcast
    dy = py[:, None, :] - my[..., None]
    quad = pa[..., None] * dx * dx + 2.0 * pb[..., None] * dx * dy + pc[..., None] * dy * dy
    lam = sky + jnp.sum(amp[..., None] * jnp.exp(-0.5 * quad), axis=1)
    ll = pixel_loglik(lam, counts, centered) * mask
    return jnp.sum(ll, axis=-1)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _loglik_pallas_raw(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                       b_tile: int, interpret: bool, centered: bool = False):
    b, c = amp.shape
    pix_pad = px.shape[1]
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    args = [_pad_to(a, b_pad, 0) for a in (amp, mx, my, pa, pb, pc)]

    grid = (b_pad // b_tile,)
    param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, pix_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_loglik_kernel, n_comp=c, centered=centered),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 5,
        out_specs=pl.BlockSpec((b_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * b_pad * c * pix_pad,
            bytes_accessed=(6 * b_pad * c + 5 * pix_pad + b_pad) * 4,
            transcendentals=b_pad * c * pix_pad,
        ),
    )(*args, px, py, counts, sky, mask)
    return out[:b, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _loglik_custom(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                   b_tile, interpret, centered):
    return _loglik_pallas_raw(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                              b_tile, interpret, centered)


def _loglik_fwd(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask, b_tile,
                interpret, centered):
    out = _loglik_pallas_raw(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                             b_tile, interpret, centered)
    return out, (amp, mx, my, pa, pb, pc, px, py, counts, sky, mask)


def _loglik_bwd(b_tile, interpret, centered, residuals, g):
    # centering terms are parameter-independent: the uncentered VJP is the
    # centered VJP, so the backward ignores the flag
    _, vjp = jax.vjp(_loglik_jnp, *residuals)
    return vjp(g)


_loglik_custom.defvjp(_loglik_fwd, _loglik_bwd)


def mog_field_loglik(amp, mx, my, pa, pb, pc, pixel_data, *,
                     b_tile: int = DEFAULT_B_TILE, interpret: bool | None = None,
                     impl: str = "pallas", centered: bool = False):
    """Poisson log-likelihood of a batched MoG field.

    Parameters: [B, C] fp32 planes (amplitude WITH normalizer folded in:
    ``amp = weight * exp(lognorm)``), plus ``pixel_data`` from
    :func:`stamp_pixel_data`.  Returns [B] logliks.

    ``impl='pallas'`` runs the fused kernel forward with the jnp autodiff
    backward; ``impl='jnp'`` runs dense jnp both ways (XLA still fuses
    well — used for oracle-style checking and as the safe default off-TPU
    with ``interpret`` cost concerns).
    """
    px, py, counts, sky, mask = pixel_data
    if impl == "jnp":
        return _loglik_jnp(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                           centered)
    if interpret is None:
        interpret = _interpret_default()
    return _loglik_custom(amp, mx, my, pa, pb, pc, px, py, counts, sky, mask,
                          b_tile, interpret, centered)


def mog_field_render(amp, mx, my, pa, pb, pc, pixel_data, *,
                     b_tile: int = DEFAULT_B_TILE, interpret: bool | None = None):
    """Expected-count images lambda [B, PIX_PAD] (debug/visualization path;
    the production likelihood never materializes lambda)."""
    px, py, counts, sky, mask = pixel_data
    del counts, mask
    if interpret is None:
        interpret = _interpret_default()
    b, c = amp.shape
    pix_pad = px.shape[1]
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    args = [_pad_to(a, b_pad, 0) for a in (amp, mx, my, pa, pb, pc)]
    grid = (b_pad // b_tile,)
    param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, pix_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_render_kernel, n_comp=c),
        out_shape=jax.ShapeDtypeStruct((b_pad, pix_pad), jnp.float32),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 3,
        out_specs=pl.BlockSpec((b_tile, pix_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args, px, py, sky)
    return out[:b]


# ---------------------------------------------------------------------------
# model integration: flat parameter batches -> fused loglik
# ---------------------------------------------------------------------------

def _field_planes(vec, stamp, band, kind: str, n_bands: int):
    """[D] unconstrained source vector -> per-component [C] planes in
    precision form with normalizers folded into the amplitude."""
    from celeste_tpu.model.params import GalaxyParams, StarParams
    from celeste_tpu.model.render import galaxy_unit_mog, star_unit_mog
    from celeste_tpu.mog import precision_form

    if kind == "star":
        params = StarParams.from_vector(vec, n_bands)
        unit = star_unit_mog(params, stamp)
    elif kind == "galaxy":
        params = GalaxyParams.from_vector(vec, n_bands)
        unit = galaxy_unit_mog(params, stamp)
    else:
        raise ValueError(kind)
    w, mu, prec, lognorm = precision_form(unit)
    amp = stamp.iota * params.flux[..., band] * w * jnp.exp(lognorm)
    return (amp, mu[..., 0], mu[..., 1], prec[..., 0], prec[..., 1], prec[..., 2])


def mixed_field_planes(vec, stamp, band, n_bands: int, is_star):
    """Kind-agnostic per-source planes for SPMD mixed star/galaxy scenes.

    ``vec`` is a rectangular GAL_D = 6 + n_bands wide unconstrained vector
    (stars use the first 2 + n_bands slots, the rest are padding); ``is_star``
    is a TRACED bool — inside ``shard_map`` the per-source kind pattern
    differs across shards, so it must be data, not Python structure.

    Returns planes of width N_GAL * K in the block convention used by the
    tiled kernels: component block j (width K = PSF comps) holds components
    j*K..(j+1)*K-1; a star fills block 0 with its K PSF components and
    zero-amplitude elsewhere; a galaxy fills all N_GAL blocks.

    The galaxy branch is computed even for stars (XLA evaluates both sides
    of a ``where``), so the star's free-floating shape slots are clamped
    first — otherwise exp(slot) can overflow and the 0 * inf in the VJP of
    the unselected branch would poison the star's gradients with NaN.
    """
    from celeste_tpu.model.galaxy import N_GAL

    b = n_bands
    head = vec[..., : 2 + b]
    shape_raw = jnp.clip(vec[..., 2 + b:], -12.0, 12.0)
    v_gal = jnp.concatenate([head, shape_raw], axis=-1)
    g_planes = _field_planes(v_gal, stamp, band, "galaxy", n_bands)
    s_planes = _field_planes(head, stamp, band, "star", n_bands)
    k = s_planes[0].shape[-1]
    out = []
    for gp, sp in zip(g_planes, s_planes):
        pad = jnp.zeros(gp.shape[-1] - k, gp.dtype)
        sp_pad = jnp.concatenate([sp, pad], axis=-1)
        out.append(jnp.where(is_star, sp_pad, gp))
    return tuple(out)


def batched_stamp_loglik(vecs, stamp, band=0, kind: str = "star", n_bands: int = 5,
                         impl: str = "pallas", pixel_data=None,
                         centered: bool = False):
    """Fused likelihood for a [B, D] batch of unconstrained source vectors
    against one stamp.  The [B, C] parameter preparation is vmapped jnp
    (tiny); the [B, PIX] work runs in the Pallas kernel.  Differentiable
    (custom VJP).  This is the function the production samplers and the
    evals/sec benchmark drive.

    ``impl``: 'pallas' (general fused kernel), 'jnp' (dense XLA path), or
    'pallas_sep' (separable isotropic specialization — fewer
    transcendentals but lane-padded to 128 on small stamps; measured
    SLOWER than the flat-pixel general kernel for 25x25 stamps, see
    mog_field_sep.py docstring — kept for wide stamps where W ~ 128).
    """
    if kind == "star" and impl == "pallas_sep":
        from celeste_tpu.kernels.mog_field_sep import (
            mog_field_loglik_isotropic,
            psf_is_isotropic,
            stamp_pixel_data_2d,
            star_planes_isotropic,
        )
        try:
            isotropic = psf_is_isotropic(stamp.psf)
        except Exception:        # traced PSF (stamp passed through jit args)
            isotropic = False
        if isotropic:
            planes = jax.vmap(
                lambda v: star_planes_isotropic(v, stamp, band, n_bands))(vecs)
            return mog_field_loglik_isotropic(*planes,
                                              stamp_pixel_data_2d(stamp),
                                              centered=centered)
        impl = "pallas"  # non-isotropic PSF: fall through to general
    if impl == "pallas_general":
        impl = "pallas"
    planes = jax.vmap(lambda v: _field_planes(v, stamp, band, kind, n_bands))(vecs)
    if pixel_data is None:
        pixel_data = stamp_pixel_data(stamp)
    return mog_field_loglik(*planes, pixel_data, impl=impl, centered=centered)
