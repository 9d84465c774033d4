"""Separable fused kernel for ISOTROPIC mixtures (stars / any MoG whose
components are circular, which includes every SDSS-style fitted PSF in
this framework).

Key identity: an isotropic Gaussian factors over pixel axes,
  exp(-((x-cx)^2 + (y-cy)^2) / 2v) = exp(-(x-cx)^2/2v) * exp(-(y-cy)^2/2v),
so the per-(chain, component) transcendental count drops from H*W to H+W;
only the per-pixel Poisson log remains dense.

MEASURED OUTCOME (TPU v5e, 2026-08-16, scripts/tpu_tune_sep.py): for 25x25
stamps this kernel is SLOWER than the flat-pixel general kernel (2.2e7 vs
4.4e7 evals/s at B=65536).  Two reasons: (a) the (B_TILE, W) row blocks
pad W=25 -> 128 lanes, wasting ~80% of VPU throughput, while the general
kernel's flat 640-pixel layout has zero padding; (b) exp is only ~60% of
the general kernel's per-element cost, bounding the possible win at <2x.
It is therefore NOT the default dispatch — select with
``batched_stamp_loglik(..., impl='pallas_sep')``.  It becomes profitable
when W approaches the 128-lane width (wide stamps / field tiles), which is
exactly the crowded-field tiling regime.

Layout: chains tile the sublane axis (B_TILE rows); the row/column factor
arrays live as (B_TILE, W_pad) / (B_TILE, H_pad) lanes; lambda is built
row-by-row (static H loop) as rank-1 updates and reduced immediately —
nothing larger than (B_TILE, W_pad) is ever materialized.  b_tile <= 512
(1024 exceeds the 16MB VMEM scoped limit at W_pad=128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from celeste_tpu.likelihood._pixel import pixel_loglik

LANE = 128
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


def stamp_pixel_data_2d(stamp):
    """Axis-separable pixel data: (xs [1, W_pad], ys [1, H_pad],
    counts [H, W_pad], sky [H, W_pad], mask [H, W_pad]) with lane padding
    masked to zero (sky padded to 1 to keep the log finite)."""
    h, w = stamp.counts.shape
    w_pad = ((w + LANE - 1) // LANE) * LANE
    h_pad = ((h + LANE - 1) // LANE) * LANE
    xs = _pad_to(jnp.arange(w, dtype=jnp.float32), w_pad, 0)[None, :]
    ys = _pad_to(jnp.arange(h, dtype=jnp.float32), h_pad, 0)[None, :]
    counts = _pad_to(stamp.counts, w_pad, 1)
    sky = _pad_to(stamp.sky, w_pad, 1, value=1.0)
    mask = _pad_to(stamp.mask, w_pad, 1)
    return xs, ys, counts, sky, mask


def _sep_loglik_kernel(amp_ref, cx_ref, cy_ref, iv_ref,
                       xs_ref, ys_ref, counts_ref, sky_ref, mask_ref, out_ref,
                       *, n_comp: int, h: int, centered: bool):
    """amp/cx/cy/iv: [B_t, C]; xs [1, W_pad]; ys [1, H_pad];
    counts/sky/mask [H, W_pad]; out [B_t, 1].

    amp carries the full normalizer: amp = weight * inv_var / (2 pi)."""
    b_t = amp_ref.shape[0]
    xs = xs_ref[0:1, :]                    # [1, W_pad]
    ys = ys_ref[0:1, :]                    # [1, H_pad]

    # row/col factors for every component: [B_t, W_pad] / [B_t, H_pad]
    rows = []
    cols = []
    for c in range(n_comp):
        iv = iv_ref[:, c:c + 1]
        dx = xs - cx_ref[:, c:c + 1]
        dy = ys - cy_ref[:, c:c + 1]
        rows.append(amp_ref[:, c:c + 1] * jnp.exp(-0.5 * iv * dx * dx))
        cols.append(jnp.exp(-0.5 * iv * dy * dy))

    acc = jnp.zeros((b_t, 1), jnp.float32)
    for hi in range(h):                    # static row loop
        lam = jnp.broadcast_to(sky_ref[hi:hi + 1, :], rows[0].shape).astype(jnp.float32)
        for c in range(n_comp):
            lam = lam + cols[c][:, hi:hi + 1] * rows[c]
        ll = pixel_loglik(lam, counts_ref[hi:hi + 1, :], centered) \
            * mask_ref[hi:hi + 1, :]
        acc = acc + jnp.sum(ll, axis=1, keepdims=True)
    out_ref[:, :] = acc


def _sep_loglik_jnp(amp, cx, cy, iv, xs, ys, counts, sky, mask,
                    centered: bool = False):
    """Dense jnp mirror of the separable kernel (autodiff backward +
    CPU check path).  [B, C] params -> [B] logliks."""
    h = counts.shape[0]
    ys = ys[..., :h]                                         # drop lane padding
    dx = xs[:, None, :] - cx[..., None]                      # [B, C, W]
    dy = ys[:, None, :] - cy[..., None]                      # [B, C, H]
    rows = amp[..., None] * jnp.exp(-0.5 * iv[..., None] * dx * dx)
    cols = jnp.exp(-0.5 * iv[..., None] * dy * dy)
    # lambda[b, h, w] = sky + sum_c cols[b, c, h] * rows[b, c, w]
    lam = sky[None] + jnp.einsum("bch,bcw->bhw", cols, rows,
                                 precision=jax.lax.Precision.HIGHEST)
    ll = pixel_loglik(lam, counts[None], centered) * mask[None]
    return jnp.sum(ll, axis=(1, 2))


def _sep_pallas_raw(amp, cx, cy, iv, pixel_data, b_tile: int, interpret: bool,
                    centered: bool = False):
    xs, ys, counts, sky, mask = pixel_data
    b, c = amp.shape
    h = counts.shape[0]
    w_pad = counts.shape[1]
    h_pad = ys.shape[1]
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    args = [_pad_to(a, b_pad, 0) for a in (amp, cx, cy, iv)]
    grid = (b_pad // b_tile,)
    param_spec = pl.BlockSpec((b_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_w = pl.BlockSpec((1, w_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((1, h_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((h, w_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sep_loglik_kernel, n_comp=c, h=h,
                          centered=centered),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[param_spec] * 4 + [vec_w, vec_h, img_spec, img_spec, img_spec],
        out_specs=pl.BlockSpec((b_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * c * h * w_pad,
            bytes_accessed=(4 * b_pad * c + 3 * h * w_pad + b_pad) * 4,
            transcendentals=b_pad * (c * (h_pad + w_pad) + h * w_pad),
        ),
    )(*args, xs, ys, counts, sky, mask)
    return out[:b, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _sep_custom(amp, cx, cy, iv, pixel_data, b_tile, interpret, centered):
    return _sep_pallas_raw(amp, cx, cy, iv, pixel_data, b_tile, interpret,
                           centered)


def _sep_fwd(amp, cx, cy, iv, pixel_data, b_tile, interpret, centered):
    out = _sep_pallas_raw(amp, cx, cy, iv, pixel_data, b_tile, interpret,
                          centered)
    return out, (amp, cx, cy, iv, pixel_data)


def _sep_bwd(b_tile, interpret, centered, residuals, g):
    # the centering terms are parameter-independent, so the uncentered VJP
    # IS the centered VJP — the backward ignores the flag (same convention
    # as mog_field._loglik_bwd)
    amp, cx, cy, iv, pixel_data = residuals
    xs, ys, counts, sky, mask = pixel_data

    def f(amp, cx, cy, iv):
        return _sep_loglik_jnp(amp, cx, cy, iv, xs, ys, counts, sky, mask)

    _, vjp = jax.vjp(f, amp, cx, cy, iv)
    # zero cotangent for pixel_data (counts/sky/etc are observed constants;
    # XLA dead-code-eliminates the zeros)
    zeros_pd = jax.tree_util.tree_map(jnp.zeros_like, (xs, ys, counts, sky, mask))
    return (*vjp(g), zeros_pd)


_sep_custom.defvjp(_sep_fwd, _sep_bwd)


def mog_field_loglik_isotropic(amp, cx, cy, inv_var, pixel_data, *,
                               b_tile: int = DEFAULT_B_TILE,
                               interpret: bool | None = None,
                               impl: str = "pallas",
                               centered: bool = False):
    """Poisson loglik for a batched ISOTROPIC MoG field.

    amp [B, C] must carry the normalizer: ``weight * inv_var / (2 pi)``;
    cx/cy [B, C] pixel centers; inv_var [B, C] = 1/variance.
    ``pixel_data`` from :func:`stamp_pixel_data_2d`.  Returns [B].
    ``centered``: saturated-model centering (likelihood/_pixel.py).
    """
    xs, ys, counts, sky, mask = pixel_data
    if impl == "jnp":
        return _sep_loglik_jnp(amp, cx, cy, inv_var, xs, ys, counts, sky,
                               mask, centered)
    if interpret is None:
        interpret = _interpret_default()
    return _sep_custom(amp, cx, cy, inv_var, pixel_data, b_tile, interpret,
                       centered)


def star_planes_isotropic(vec, stamp, band, n_bands: int):
    """[D] star vector -> isotropic planes (amp, cx, cy, inv_var), each [K].
    Requires the stamp PSF to be isotropic (cov = v * I); the caller
    (kernels dispatch) checks this once per stamp on the host."""
    from celeste_tpu.model.params import StarParams

    params = StarParams.from_vector(vec, n_bands)
    p = stamp.duas2pixel(params.u)
    v = stamp.psf.cov[..., 0, 0]
    inv_var = 1.0 / v
    amp = (stamp.iota * params.flux[..., band] * stamp.psf.w
           * inv_var / (2.0 * jnp.pi))
    cx = p[..., 0] + stamp.psf.mu[..., 0]
    cy = p[..., 1] + stamp.psf.mu[..., 1]
    return amp, cx, cy, inv_var


def psf_is_isotropic(psf, tol: float = 1e-6) -> bool:
    """Host-side check: all components circular within tol."""
    import numpy as np

    cov = np.asarray(psf.cov)
    return bool(
        np.all(np.abs(cov[..., 0, 1]) <= tol * np.abs(cov[..., 0, 0]))
        and np.all(np.abs(cov[..., 0, 0] - cov[..., 1, 1])
                   <= tol * np.abs(cov[..., 0, 0]))
    )
