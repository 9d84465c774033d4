"""Tiled block-sparse field likelihood kernel (SURVEY.md §5.7 — the
crowded-field hot path; BASELINE config 5 at production field sizes).

The dense kernel (mog_field.py) evaluates EVERY source's components on
EVERY pixel — O(S * P) per chain, fine for stamps, quadratic waste for a
large field where each source touches a tiny patch.  This kernel restores
the reference's bounded-support optimization (its per-source bounded-stamp
rendering, SURVEY.md §3.1) in TPU form:

- the field is tiled into (8, 128) VPU-shaped tiles, flattened tile-major
  (parallel/tiles.py);
- a host-built tile->source index table (scalar-prefetched, SMEM) lists at
  most S_MAX sources per tile, the sentinel index selecting a
  zero-amplitude padding slot;
- grid = (tiles, chain-blocks); each program gathers its tile's source
  component planes by dynamic slice, evaluates S_MAX * C Gaussians on
  (B_TILE, 1024) pixels, and reduces the tile's Poisson partial in
  register;
- per-tile partials land in an [n_tiles, B] output summed by XLA (a [T, B]
  reduction, negligible).

Work per chain: S_MAX * C * PIX instead of S * C * PIX -> the win is
S / S_MAX (measured 10-30x for realistic crowding; see
tests/test_tiled_field.py and scripts/tpu_tiled_bench.py).
Gradients: custom VJP, backward = autodiff of the dense jnp math
restricted to the same tile truncation (identical function).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from celeste_tpu.likelihood._pixel import LAMBDA_MIN, pixel_loglik
from celeste_tpu.parallel.tiles import PIX_PER_TILE, TileMap, tile_field_arrays, tile_pixel_coords

DEFAULT_B_TILE = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _tiled_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,  # [1, B_t, S_MAX*C]
                  px_ref, py_ref, counts_ref, sky_ref, mask_ref,    # [1, 1, PIX]
                  out_ref,                   # [1, 1, B_t]
                  *, n_comp: int, s_max: int, centered: bool):
    """All indexing is STATIC: the tile's source parameters were gathered
    into tile-major planes by XLA before the call (Mosaic cannot prove
    alignment of data-dependent lane offsets, so in-kernel gathers by
    source index are off the table — and the XLA gather is bandwidth-cheap
    relative to the compute)."""
    px = px_ref[0]                           # [1, PIX]
    py = py_ref[0]
    b_t = amp_ref.shape[1]
    lam = jnp.broadcast_to(sky_ref[0], (b_t, px.shape[1])).astype(jnp.float32)
    for k in range(s_max * n_comp):
        # amplitude folded into the exponent (log(0) = -inf for the zero
        # padding slot -> exact 0 contribution)
        log_amp = jnp.log(amp_ref[0][:, k:k + 1])
        dx = px - mx_ref[0][:, k:k + 1]
        dy = py - my_ref[0][:, k:k + 1]
        arg = (log_amp - 0.5 * pa_ref[0][:, k:k + 1] * dx * dx
               - pb_ref[0][:, k:k + 1] * dx * dy
               - 0.5 * pc_ref[0][:, k:k + 1] * dy * dy)
        lam = lam + jnp.exp(arg)
    ll = pixel_loglik(lam, counts_ref[0], centered) * mask_ref[0]
    out_ref[0, 0, :] = jnp.sum(ll, axis=1)


def _tiled_kernel_with_lam(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                           px_ref, py_ref, counts_ref, sky_ref, mask_ref,
                           out_ref, lam_ref, *, n_comp: int, s_max: int,
                           centered: bool):
    """Forward used under autodiff: same as ``_tiled_kernel`` but ALSO emits
    the pre-clamp lambda tile (incl. sky) [1, B_t, PIX] as the residual the
    Pallas backward consumes (saves one full slot-loop recompute there)."""
    px = px_ref[0]
    py = py_ref[0]
    b_t = amp_ref.shape[1]
    lam = jnp.broadcast_to(sky_ref[0], (b_t, px.shape[1])).astype(jnp.float32)
    for k in range(s_max * n_comp):
        log_amp = jnp.log(amp_ref[0][:, k:k + 1])
        dx = px - mx_ref[0][:, k:k + 1]
        dy = py - my_ref[0][:, k:k + 1]
        arg = (log_amp - 0.5 * pa_ref[0][:, k:k + 1] * dx * dx
               - pb_ref[0][:, k:k + 1] * dx * dy
               - 0.5 * pc_ref[0][:, k:k + 1] * dy * dy)
        lam = lam + jnp.exp(arg)
    lam_ref[0] = lam
    ll = pixel_loglik(lam, counts_ref[0], centered) * mask_ref[0]
    out_ref[0, 0, :] = jnp.sum(ll, axis=1)


def _tiled_bwd_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                      px_ref, py_ref, counts_ref, mask_ref,   # [1, 1, PIX]
                      lam_ref,                                # [1, B_t, PIX]
                      g_ref,                                  # [1, 1, B_t]
                      damp_ref, dmx_ref, dmy_ref, dpa_ref, dpb_ref, dpc_ref,
                      # outs: [1, W, B_t] — slot on SUBLANES so each slot's
                      # [B_t] reduction is one cheap static-sublane store
                      *, n_comp: int, s_max: int):
    """Backward of the tiled Poisson loglik wrt the gathered planes.

    For ll = sum_p mask (counts log(max(lam, eps)) - max(lam, eps)) with
    lam = sky + sum_k a_k exp(-q_k/2), q = pa dx^2 + 2 pb dx dy + pc dy^2:
      g_lam = g * mask * (counts/lam - 1) * [lam > eps]
      d a   = sum_p g_lam e_k ;      dL/dq = -0.5 g_lam a e_k
      d pa  = sum_p dq dx^2 ; d pb = sum_p 2 dq dx dy ; d pc = sum_p dq dy^2
      d mx  = sum_p -2 dq (pa dx + pb dy) ; d my = sum_p -2 dq (pb dx + pc dy)
    One exp per (slot, pixel) — the lambda residual spares the second loop.
    """
    px = px_ref[0]
    py = py_ref[0]
    lam = lam_ref[0]                                        # [B_t, PIX]
    active = (lam > LAMBDA_MIN).astype(jnp.float32)
    lam_c = jnp.maximum(lam, LAMBDA_MIN)
    g = g_ref[0, 0, :][:, None]                             # [B_t, 1]
    g_lam = (g * mask_ref[0]) * (counts_ref[0] / lam_c - 1.0) * active
    for k in range(s_max * n_comp):
        a = amp_ref[0][:, k:k + 1]
        pa = pa_ref[0][:, k:k + 1]
        pb = pb_ref[0][:, k:k + 1]
        pc = pc_ref[0][:, k:k + 1]
        dx = px - mx_ref[0][:, k:k + 1]
        dy = py - my_ref[0][:, k:k + 1]
        e = jnp.exp(-0.5 * pa * dx * dx - pb * dx * dy - 0.5 * pc * dy * dy)
        ge = g_lam * e                                      # [B_t, PIX]
        dq = (-0.5) * ge * a
        damp_ref[0, k, :] = jnp.sum(ge, axis=1)
        dpa_ref[0, k, :] = jnp.sum(dq * dx * dx, axis=1)
        dpb_ref[0, k, :] = jnp.sum(2.0 * dq * dx * dy, axis=1)
        dpc_ref[0, k, :] = jnp.sum(dq * dy * dy, axis=1)
        dmx_ref[0, k, :] = jnp.sum(dq * (-2.0) * (pa * dx + pb * dy), axis=1)
        dmy_ref[0, k, :] = jnp.sum(dq * (-2.0) * (pb * dx + pc * dy), axis=1)


def _slot_quad(planes, col0, n_comp, t_px, t_py):
    """One SOURCE slot's component block: (a [B,C], dx/dy/quad [B,C,PIX])
    on the tile's pixels.  ``col0`` is the slot's first plane column
    (contiguous block of n_comp columns)."""
    def sl(p):
        return jax.lax.dynamic_slice_in_dim(p, col0, n_comp, axis=1)

    amp, mx, my, pa, pb, pc = planes
    a = sl(amp)                                           # [B, C]
    dx = t_px[None, None, :] - sl(mx)[:, :, None]         # [B, C, PIX]
    dy = t_py[None, None, :] - sl(my)[:, :, None]
    quad = (sl(pa)[:, :, None] * dx * dx
            + 2.0 * sl(pb)[:, :, None] * dx * dy
            + sl(pc)[:, :, None] * dy * dy)
    return a, dx, dy, quad


# slot count above which the scan path replaces the broadcast form (the
# threshold is STATIC in the unbatched shapes, so the choice cannot be
# fooled by vmap the way a batch-size test would be)
_SCAN_COMP_THRESHOLD = 48


def _tile_lambda_chains(planes, t_idx, t_px, t_py, n_comp):
    """Shared per-tile sky-free lambda for the jnp mirrors: [B, PIX] from
    6 x [B, (S+1)*C] planes and one tile's source indices.  Keep the
    quadratic-form convention here IN ONE PLACE (the Pallas kernels carry
    the same math with the amplitude folded into the exponent).

    Memory discipline: the broadcast form materializes [B, s_max*C, PIX] —
    ~0.5 GB per tile at B=1024 on production fields, and because this
    function is also the tiled kernels' autodiff backward (and gets vmapped
    by the samplers, so a batch-size test could not see the blow-up), that
    footprint device-faulted v5e during config-5 warmup.  Crowded tiles
    (> _SCAN_COMP_THRESHOLD components) therefore take a scan-over-slots
    path with a hand-written VJP (the slot sum is associative: each slot's
    cotangents need only the lambda cotangent and a recomputed exp — no
    per-step carries, which AD-of-scan would have stored).  Sparse tiles
    keep the vectorized broadcast."""
    if t_idx.shape[0] * n_comp <= _SCAN_COMP_THRESHOLD:
        return _tile_lambda_chains_dense(planes, t_idx, t_px, t_py, n_comp)
    return _tile_lambda_chains_scan(planes, t_idx, t_px, t_py, n_comp)


def _tile_lambda_chains_dense(planes, t_idx, t_px, t_py, n_comp):
    """Vectorized broadcast form (plain AD) for sparse tiles."""
    amp, mx, my, pa, pb, pc = planes
    cols = (t_idx[:, None] * n_comp + jnp.arange(n_comp)[None, :]).reshape(-1)

    def chain(ampr, mxr, myr, par, pbr, pcr):
        a = ampr[cols]
        dx = t_px[None, :] - mxr[cols][:, None]
        dy = t_py[None, :] - myr[cols][:, None]
        quad = (par[cols][:, None] * dx * dx
                + 2.0 * pbr[cols][:, None] * dx * dy
                + pcr[cols][:, None] * dy * dy)
        return jnp.sum(a[:, None] * jnp.exp(-0.5 * quad), axis=0)

    return jax.vmap(chain)(amp, mx, my, pa, pb, pc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _tile_lambda_chains_scan(planes, t_idx, t_px, t_py, n_comp):
    """Scan-over-slots form with hand-written VJP (crowded tiles)."""
    lam0 = jnp.zeros((planes[0].shape[0], t_px.shape[0]), planes[0].dtype)

    def body(lam, col0):
        a, _, _, quad = _slot_quad(planes, col0, n_comp, t_px, t_py)
        return lam + jnp.sum(a[:, :, None] * jnp.exp(-0.5 * quad), axis=1), None

    lam, _ = jax.lax.scan(body, lam0, t_idx * n_comp)
    return lam


def _tlc_fwd(planes, t_idx, t_px, t_py, n_comp):
    return (_tile_lambda_chains_scan(planes, t_idx, t_px, t_py, n_comp),
            (planes, t_idx, t_px, t_py))


def _tlc_bwd(n_comp, residuals, g):
    """g [B, PIX] -> plane cotangents, one slot at a time.

    For lam = sum_k a_k exp(-q_k/2) with q = pa dx^2 + 2 pb dx dy + pc dy^2,
    dx = px - mx:  d/da = e_k;  dL/dq = -a e_k g / 2;
    dq/dpa = dx^2, dq/dpb = 2 dx dy, dq/dpc = dy^2;
    dq/dmx = -(2 pa dx + 2 pb dy), dq/dmy = -(2 pb dx + 2 pc dy).
    Scatter-adds handle repeated padding-slot columns exactly."""
    planes, t_idx, t_px, t_py = residuals
    amp, mx, my, pa, pb, pc = planes

    def add_block(dest, col0, val):
        cur = jax.lax.dynamic_slice_in_dim(dest, col0, n_comp, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(dest, cur + val, col0, axis=1)

    def sl(p, col0):
        return jax.lax.dynamic_slice_in_dim(p, col0, n_comp, axis=1)

    def body(acc, col0):
        d_amp, d_mx, d_my, d_pa, d_pb, d_pc = acc
        a, dx, dy, quad = _slot_quad(planes, col0, n_comp, t_px, t_py)
        e = jnp.exp(-0.5 * quad)
        ge = g[:, None, :] * e                        # [B, C, PIX]
        dq = -0.5 * ge * a[:, :, None]                # dL/dq per pixel
        d_amp = add_block(d_amp, col0, jnp.sum(ge, axis=2))
        d_pa = add_block(d_pa, col0, jnp.sum(dq * dx * dx, axis=2))
        d_pb = add_block(d_pb, col0, jnp.sum(2.0 * dq * dx * dy, axis=2))
        d_pc = add_block(d_pc, col0, jnp.sum(dq * dy * dy, axis=2))
        pac = sl(pa, col0)[:, :, None]
        pbc = sl(pb, col0)[:, :, None]
        pcc = sl(pc, col0)[:, :, None]
        d_mx = add_block(d_mx, col0, jnp.sum(
            dq * (-2.0) * (pac * dx + pbc * dy), axis=2))
        d_my = add_block(d_my, col0, jnp.sum(
            dq * (-2.0) * (pbc * dx + pcc * dy), axis=2))
        return (d_amp, d_mx, d_my, d_pa, d_pb, d_pc), None

    zeros = tuple(jnp.zeros_like(p) for p in planes)
    acc, _ = jax.lax.scan(body, zeros, t_idx * n_comp)
    import numpy as _np
    return (acc, _np.zeros(t_idx.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(t_px), jnp.zeros_like(t_py))


_tile_lambda_chains_scan.defvjp(_tlc_fwd, _tlc_bwd)


def _tiled_jnp(planes, tile_src, pixel_tiles, n_comp, centered=False):
    """Dense jnp mirror with the SAME tile truncation (backward path and
    CPU check).  planes: 6 x [B, (S+1)*C]; tile_src [T, S_MAX];
    pixel_tiles: 5 x [T, PIX]."""
    px, py, counts, sky, mask = pixel_tiles

    def tile_ll(t_idx, t_px, t_py, t_counts, t_sky, t_mask):
        lam = t_sky + _tile_lambda_chains(planes, t_idx, t_px, t_py, n_comp)
        return jnp.sum(pixel_loglik(lam, t_counts, centered) * t_mask,
                       axis=-1)

    per_tile = jax.vmap(tile_ll)(tile_src, px, py, counts, sky, mask)  # [T, B]
    return jnp.sum(per_tile, axis=0)


class TiledStampData:
    """Device-side bundle: tile tables + tiled pixel arrays for one field.

    Occupancy bucketing (``n_buckets`` > 1): tiles are partitioned by how
    many sources touch them and each bucket gets its own (tile-subset,
    s_max-subset) kernel launch, so sparse tiles don't pay the most crowded
    tile's S_MAX.  Work drops from T * S_MAX to sum_b T_b * S_MAX_b.
    """

    def __init__(self, tm: TileMap, stamp, n_buckets: int = 1):
        import numpy as np

        self.tile_map = tm
        self.tile_src = jnp.asarray(tm.tile_src, jnp.int32)
        px, py = tile_pixel_coords(tm)
        counts, sky, mask = tile_field_arrays(
            tm, np.asarray(stamp.counts), np.asarray(stamp.sky),
            np.asarray(stamp.mask), pad_values=(0.0, 1.0, 0.0))
        self.pixels = tuple(jnp.asarray(a, jnp.float32) for a in (px, py, counts, sky, mask))

        occupancy = np.sum(tm.tile_src < tm.n_sources, axis=1)   # [T]
        self.buckets = []
        if n_buckets <= 1 or tm.n_tiles < 2:
            self.buckets.append((jnp.arange(tm.n_tiles), tm.s_max))
        else:
            # bucket edges at occupancy quantiles; at least width 1
            qs = np.quantile(occupancy, np.linspace(0, 1, n_buckets + 1)[1:-1])
            edges = sorted(set(int(np.ceil(q)) for q in qs))
            lo = 0
            for edge in edges + [tm.s_max]:
                sel = np.where((occupancy > lo - 1) & (occupancy <= edge))[0] \
                    if lo > 0 else np.where(occupancy <= edge)[0]
                if len(sel):
                    s_cap = max(1, int(occupancy[sel].max()))
                    self.buckets.append((jnp.asarray(sel, jnp.int32), s_cap))
                lo = edge + 1
            # every tile must appear exactly once
            total = sum(len(np.asarray(s)) for s, _ in self.buckets)
            assert total == tm.n_tiles, (total, tm.n_tiles)


def _gather_tile_planes(planes, tile_src, n_comp):
    """[B, (S+1)*C] planes + [T, S_MAX] indices -> [T, B, S_MAX*C]
    tile-major gathered planes (XLA gather; zero padding slot included)."""
    t, s_max = tile_src.shape
    out = []
    for p in planes:
        b = p.shape[0]
        p3 = p.reshape(b, -1, n_comp)                      # [B, S+1, C]
        g = jnp.take(p3, tile_src, axis=1)                 # [B, T, S_MAX, C]
        out.append(jnp.transpose(g, (1, 0, 2, 3)).reshape(t, b, s_max * n_comp))
    return out


def _tiled_pallas_raw(planes, tile_src, pixel_tiles, n_comp, s_max, b_tile,
                      interpret, centered=False):
    amp = planes[0]
    b = amp.shape[0]
    t = tile_src.shape[0]
    pix = pixel_tiles[0].shape[1]
    # adapt the block to the actual batch: samplers vmap a per-chain (b=1)
    # logdensity, and padding b=1 to a 128-row block BEFORE vmap batching
    # multiplies both compute and the gathered planes by 128x per chain
    # (measured: 2.4 GB of gathered planes -> device fault at 1024 chains);
    # 8 is the f32 sublane minimum
    b_tile = min(b_tile, ((b + 7) // 8) * 8)
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    planes = [_pad_axis(p, b_pad, 0) for p in planes]
    gathered = _gather_tile_planes(planes, tile_src, n_comp)  # [T, B_pad, S_MAX*C]
    # unit middle axis so the tile-indexed blocks satisfy the Mosaic rule
    # (last two block dims divisible by (8, 128) or equal to array dims)
    pixel_tiles3 = [p[:, None, :] for p in pixel_tiles]       # [T, 1, PIX]

    grid = (t, b_pad // b_tile)
    width = s_max * n_comp
    param_spec = pl.BlockSpec((1, b_tile, width), lambda ti, bi: (ti, bi, 0),
                              memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, 1, pix), lambda ti, bi: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_kernel, n_comp=n_comp, s_max=s_max,
                          centered=centered),
        out_shape=jax.ShapeDtypeStruct((t, 1, b_pad), jnp.float32),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 5,
        out_specs=pl.BlockSpec((1, 1, b_tile), lambda ti, bi: (ti, 0, bi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * b_pad * t * s_max * n_comp * pix,
            bytes_accessed=(6 * t * b_pad * width + 5 * t * pix) * 4,
            transcendentals=b_pad * t * (s_max * n_comp + 1) * pix,
        ),
    )(*gathered, *pixel_tiles3)
    return jnp.sum(out[:, 0, :], axis=0)[:b]


def _tiled_pallas_fwd_lam(planes, tile_src, pixel_tiles, n_comp, s_max,
                          b_tile, interpret, centered=False):
    """Forward emitting (loglik [B], lam tiles [T, B_pad, PIX]) — the
    autodiff path; mirrors ``_tiled_pallas_raw``'s layout."""
    amp = planes[0]
    b = amp.shape[0]
    t = tile_src.shape[0]
    pix = pixel_tiles[0].shape[1]
    b_tile = min(b_tile, ((b + 7) // 8) * 8)
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    planes = [_pad_axis(p, b_pad, 0) for p in planes]
    gathered = _gather_tile_planes(planes, tile_src, n_comp)
    pixel_tiles3 = [p[:, None, :] for p in pixel_tiles]
    grid = (t, b_pad // b_tile)
    width = s_max * n_comp
    param_spec = pl.BlockSpec((1, b_tile, width), lambda ti, bi: (ti, bi, 0),
                              memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, 1, pix), lambda ti, bi: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
    out, lam = pl.pallas_call(
        functools.partial(_tiled_kernel_with_lam, n_comp=n_comp, s_max=s_max,
                          centered=centered),
        out_shape=(jax.ShapeDtypeStruct((t, 1, b_pad), jnp.float32),
                   jax.ShapeDtypeStruct((t, b_pad, pix), jnp.float32)),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 5,
        out_specs=(pl.BlockSpec((1, 1, b_tile), lambda ti, bi: (ti, 0, bi),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, b_tile, pix), lambda ti, bi: (ti, bi, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(*gathered, *pixel_tiles3)
    return jnp.sum(out[:, 0, :], axis=0)[:b], lam


def _tiled_bwd_pallas(planes, tile_src, pixel_tiles, lam, g, n_comp, s_max,
                      b_tile, interpret):
    """Pallas backward: gathered-cotangent kernel + one segment-sum scatter
    back to the [B, (S+1)*C] plane layout (the transpose of the forward's
    XLA gather)."""
    amp = planes[0]
    b, plane_w = amp.shape
    t = tile_src.shape[0]
    pix = pixel_tiles[0].shape[1]
    b_tile = min(b_tile, ((b + 7) // 8) * 8)
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    planes_p = [_pad_axis(p, b_pad, 0) for p in planes]
    gathered = _gather_tile_planes(planes_p, tile_src, n_comp)
    px, py, counts, sky, mask = [p[:, None, :] for p in pixel_tiles]
    g3 = _pad_axis(g, b_pad, 0)[None, None, :]              # [1, 1, B_pad]
    grid = (t, b_pad // b_tile)
    width = s_max * n_comp
    param_spec = pl.BlockSpec((1, b_tile, width), lambda ti, bi: (ti, bi, 0),
                              memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, 1, pix), lambda ti, bi: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
    lam_spec = pl.BlockSpec((1, b_tile, pix), lambda ti, bi: (ti, bi, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 1, b_tile), lambda ti, bi: (0, 0, bi),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, width, b_tile), lambda ti, bi: (ti, 0, bi),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_tiled_bwd_kernel, n_comp=n_comp, s_max=s_max),
        out_shape=tuple(jax.ShapeDtypeStruct((t, width, b_pad), jnp.float32)
                        for _ in range(6)),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 4 + [lam_spec, g_spec],
        out_specs=(out_spec,) * 6,
        interpret=interpret,
    )(*gathered, px, py, counts, mask, lam, g3)
    # scatter-add gathered cotangents back to plane columns: slot s of tile
    # t owns plane columns tile_src[t, s]*C .. +C (repeats accumulate)
    cols = (tile_src[:, :, None] * n_comp
            + jnp.arange(n_comp, dtype=tile_src.dtype)[None, None, :])
    seg_ids = cols.reshape(-1)                              # [T*W]
    d_planes = []
    for o in outs:
        flat = o.reshape(t * width, b_pad)[:, :b]           # [T*W, B]
        seg = jax.ops.segment_sum(flat, seg_ids, num_segments=plane_w)
        d_planes.append(seg.T)                              # [B, (S+1)*C]
    return tuple(d_planes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _tiled_custom(planes, tile_src, pixel_tiles, n_comp, s_max, b_tile,
                  interpret, centered):
    return _tiled_pallas_raw(planes, tile_src, pixel_tiles, n_comp, s_max,
                             b_tile, interpret, centered)


def _tiled_fwd(planes, tile_src, pixel_tiles, n_comp, s_max, b_tile,
               interpret, centered):
    if interpret:
        # CPU/debug: plain forward; backward falls back to the jnp mirror
        out = _tiled_pallas_raw(planes, tile_src, pixel_tiles, n_comp, s_max,
                                b_tile, interpret, centered)
        return out, (planes, tile_src, pixel_tiles, None)
    out, lam = _tiled_pallas_fwd_lam(planes, tile_src, pixel_tiles, n_comp,
                                     s_max, b_tile, interpret, centered)
    return out, (planes, tile_src, pixel_tiles, lam)


def _bwd_chain_chunk(b: int, s_max: int, n_comp: int, pix: int) -> int:
    """Chain-axis chunk for the dense-jnp backward: the VJP's [B, s*K, PIX]
    intermediates hit ~0.5 GB/tile at B=1024 on production fields (measured
    TPU device fault); bound them to ~32 MB.  Largest divisor of B under
    the budget keeps shapes static."""
    budget = (1 << 25) // max(1, s_max * n_comp * pix * 4)
    target = max(1, min(b, budget))
    return max(d for d in range(1, target + 1) if b % d == 0)


def _tiled_bwd(n_comp, s_max, b_tile, interpret, centered, residuals, g):
    # centering terms are parameter-independent: the uncentered VJP IS the
    # centered VJP, so both backward paths ignore the flag
    planes, tile_src, pixel_tiles, lam = residuals
    import numpy as np

    zero_idx = np.zeros(tile_src.shape, dtype=jax.dtypes.float0)
    if lam is not None:
        d_planes = _tiled_bwd_pallas(planes, tile_src, pixel_tiles, lam, g,
                                     n_comp, s_max, b_tile, interpret)
        zeros_pix = jax.tree_util.tree_map(jnp.zeros_like, pixel_tiles)
        return d_planes, zero_idx, zeros_pix
    b = planes[0].shape[0]
    chunk = _bwd_chain_chunk(b, s_max, n_comp, pixel_tiles[0].shape[1])

    def one(args):
        planes_c, g_c = args

        def f(p):
            return _tiled_jnp(p, tile_src, pixel_tiles, n_comp)

        _, vjp = jax.vjp(f, planes_c)
        return vjp(g_c)[0]

    if chunk == b:
        d_planes = one((planes, g))
    else:
        n_chunks = b // chunk
        planes_r = tuple(p.reshape(n_chunks, chunk, -1) for p in planes)
        g_r = g.reshape(n_chunks, chunk)
        d_r = jax.lax.map(one, (planes_r, g_r))
        d_planes = tuple(d.reshape(b, -1) for d in d_r)
    zeros_pix = jax.tree_util.tree_map(jnp.zeros_like, pixel_tiles)
    return d_planes, zero_idx, zeros_pix


_tiled_custom.defvjp(_tiled_fwd, _tiled_bwd)


def tiled_field_loglik(planes, data: TiledStampData, *, n_comp: int,
                       b_tile: int = DEFAULT_B_TILE, interpret: bool | None = None,
                       impl: str = "pallas", centered: bool = False):
    """Poisson loglik of a batched multi-source field with block-sparse
    tiling.

    ``planes``: 6-tuple of [B, (S+1)*C] parameter planes in precision form
    (source-major; the final C columns are the zero-amplitude padding slot).
    Returns [B].  Differentiable (custom VJP via the identical jnp math).
    """
    tm = data.tile_map
    if impl == "jnp":
        return _tiled_jnp(planes, data.tile_src, data.pixels, n_comp,
                          centered)
    if interpret is None:
        interpret = _interpret_default()
    out = 0.0
    for sel, s_cap in data.buckets:
        tile_src_b = data.tile_src[sel][:, :s_cap]
        pixels_b = tuple(p[sel] for p in data.pixels)
        out = out + _tiled_custom(tuple(planes), tile_src_b, pixels_b,
                                  n_comp, int(s_cap), b_tile, interpret,
                                  centered)
    return out


def scene_planes_padded(scene, vecs, stamp, band):
    """[B, D_total] joint crowded-scene vectors -> source-major padded
    planes [B, (S+1)*C] for the tiled kernel (uniform kind scenes)."""
    from celeste_tpu.kernels.mog_field import _field_planes

    kinds = set(scene.kinds)
    assert len(kinds) == 1, "tiled path requires uniform source kind"
    kind = scene.kinds[0]
    blocks, _ = scene.block_slices()

    def one_chain(vec):
        per_src = []
        for off, d, _ in blocks:
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            per_src.append(_field_planes(v, stamp, band, kind, scene.n_bands))
        stacked = tuple(jnp.stack(parts, axis=0) for parts in zip(*per_src))
        # append the zero padding slot and flatten source-major
        out = []
        for p in stacked:
            p = jnp.concatenate([p, jnp.zeros_like(p[:1])], axis=0)  # [S+1, C]
            out.append(p.reshape(-1))
        return tuple(out)

    return jax.vmap(one_chain)(vecs)


def scene_planes_blocked(scene, vecs, stamp, band):
    """[B, D_total] joint MIXED-kind scene vectors -> block-slot planes
    [B, (S*N_GAL + 1)*K] for the tiled kernels with ``n_comp = K``.

    Block convention (see parallel.tiles.build_block_tile_map): source i
    owns slots i*N_GAL..(i+1)*N_GAL-1, each K components wide; stars fill
    slot i*N_GAL and leave the rest zero-amplitude (never referenced by the
    block tile map).  Kinds are static here (single-chip path), so no
    traced selection is needed — each source renders only its own math.
    """
    from celeste_tpu.kernels.mog_field import _field_planes
    from celeste_tpu.model.galaxy import N_GAL

    k = stamp.psf.n_components
    blocks, _ = scene.block_slices()

    def one_chain(vec):
        per_src = []
        for off, d, kind in blocks:
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            p = _field_planes(v, stamp, band, kind, scene.n_bands)
            if kind == "star":
                p = tuple(jnp.concatenate(
                    [x, jnp.zeros((N_GAL - 1) * k, x.dtype)]) for x in p)
            per_src.append(p)
        out = []
        for parts in zip(*per_src):
            flat = jnp.concatenate(parts, axis=0)           # [S*N_GAL*K]
            out.append(jnp.concatenate([flat, jnp.zeros(k, flat.dtype)]))
        return tuple(out)

    return jax.vmap(one_chain)(vecs)


# ---------------------------------------------------------------------------
# tiled RENDER variant: per-tile lambda partials (for cross-chip source
# sharding, where lambda must be psum'd over the source axis BEFORE the log)
# ---------------------------------------------------------------------------

def _tiled_render_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                         px_ref, py_ref, out_ref, *, n_comp: int, s_max: int):
    """Same gather layout as _tiled_kernel but emits the SKY-FREE lambda
    tiles [T, B_t, PIX] instead of reducing — the source-sharded path adds
    sky once after the psum."""
    px = px_ref[0]
    py = py_ref[0]
    b_t = amp_ref.shape[1]
    lam = jnp.zeros((b_t, px.shape[1]), jnp.float32)
    for k in range(s_max * n_comp):
        log_amp = jnp.log(amp_ref[0][:, k:k + 1])
        dx = px - mx_ref[0][:, k:k + 1]
        dy = py - my_ref[0][:, k:k + 1]
        arg = (log_amp - 0.5 * pa_ref[0][:, k:k + 1] * dx * dx
               - pb_ref[0][:, k:k + 1] * dx * dy
               - 0.5 * pc_ref[0][:, k:k + 1] * dy * dy)
        lam = lam + jnp.exp(arg)
    out_ref[0] = lam


def _tiled_render_bwd_kernel(amp_ref, mx_ref, my_ref, pa_ref, pb_ref, pc_ref,
                             px_ref, py_ref,         # [1, 1, PIX]
                             g_ref,                  # [1, B_t, PIX]
                             damp_ref, dmx_ref, dmy_ref, dpa_ref, dpb_ref,
                             dpc_ref,                # [1, W, B_t]
                             *, n_comp: int, s_max: int):
    """Backward of the sky-free lambda-tile render wrt the gathered planes:
    the cotangent is already per-pixel (the source-sharded path reduces the
    psum'd lambda outside), so this is the loglik backward minus the
    counts/lam recovery — one exp per (slot, pixel), no residual needed."""
    px = px_ref[0]
    py = py_ref[0]
    g_lam = g_ref[0]                                        # [B_t, PIX]
    for k in range(s_max * n_comp):
        a = amp_ref[0][:, k:k + 1]
        pa = pa_ref[0][:, k:k + 1]
        pb = pb_ref[0][:, k:k + 1]
        pc = pc_ref[0][:, k:k + 1]
        dx = px - mx_ref[0][:, k:k + 1]
        dy = py - my_ref[0][:, k:k + 1]
        e = jnp.exp(-0.5 * pa * dx * dx - pb * dx * dy - 0.5 * pc * dy * dy)
        ge = g_lam * e
        dq = (-0.5) * ge * a
        damp_ref[0, k, :] = jnp.sum(ge, axis=1)
        dpa_ref[0, k, :] = jnp.sum(dq * dx * dx, axis=1)
        dpb_ref[0, k, :] = jnp.sum(2.0 * dq * dx * dy, axis=1)
        dpc_ref[0, k, :] = jnp.sum(dq * dy * dy, axis=1)
        dmx_ref[0, k, :] = jnp.sum(dq * (-2.0) * (pa * dx + pb * dy), axis=1)
        dmy_ref[0, k, :] = jnp.sum(dq * (-2.0) * (pb * dx + pc * dy), axis=1)


def _tiled_render_bwd_pallas(planes, tile_src, px, py, g, n_comp, s_max,
                             b_tile, interpret):
    """Pallas backward for the render variant + the segment-sum scatter
    back to plane columns.  ``g``: [T, B, PIX] lambda-tile cotangents."""
    amp = planes[0]
    b, plane_w = amp.shape
    t = tile_src.shape[0]
    pix = px.shape[1]
    b_tile = min(b_tile, ((b + 7) // 8) * 8)
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    planes_p = [_pad_axis(p, b_pad, 0) for p in planes]
    gathered = _gather_tile_planes(planes_p, tile_src, n_comp)
    g_p = _pad_axis(g, b_pad, 1)                            # [T, B_pad, PIX]
    pixel3 = [p[:, None, :] for p in (px, py)]
    grid = (t, b_pad // b_tile)
    width = s_max * n_comp
    param_spec = pl.BlockSpec((1, b_tile, width), lambda ti, bi: (ti, bi, 0),
                              memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, 1, pix), lambda ti, bi: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, b_tile, pix), lambda ti, bi: (ti, bi, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, width, b_tile), lambda ti, bi: (ti, 0, bi),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_tiled_render_bwd_kernel, n_comp=n_comp, s_max=s_max),
        out_shape=tuple(jax.ShapeDtypeStruct((t, width, b_pad), jnp.float32)
                        for _ in range(6)),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 2 + [g_spec],
        out_specs=(out_spec,) * 6,
        interpret=interpret,
    )(*gathered, *pixel3, g_p)
    cols = (tile_src[:, :, None] * n_comp
            + jnp.arange(n_comp, dtype=tile_src.dtype)[None, None, :])
    seg_ids = cols.reshape(-1)
    d_planes = []
    for o in outs:
        flat = o.reshape(t * width, b_pad)[:, :b]
        seg = jax.ops.segment_sum(flat, seg_ids, num_segments=plane_w)
        d_planes.append(seg.T)
    return tuple(d_planes)


def _tiled_render_jnp(planes, tile_src, px, py, n_comp):
    """Dense mirror: [B, (S+1)*C] planes -> sky-free lambda tiles
    [T, B, PIX] (shares the per-tile math with _tiled_jnp)."""
    return jax.vmap(
        lambda t_idx, t_px, t_py: _tile_lambda_chains(planes, t_idx, t_px, t_py,
                                                      n_comp)
    )(tile_src, px, py)


def _tiled_render_raw(planes, tile_src, px, py, n_comp, s_max, b_tile, interpret):
    b = planes[0].shape[0]
    t = tile_src.shape[0]
    pix = px.shape[1]
    # adapt the block to the actual batch: samplers vmap a per-chain (b=1)
    # logdensity, and padding b=1 to a 128-row block BEFORE vmap batching
    # multiplies both compute and the gathered planes by 128x per chain
    # (measured: 2.4 GB of gathered planes -> device fault at 1024 chains);
    # 8 is the f32 sublane minimum
    b_tile = min(b_tile, ((b + 7) // 8) * 8)
    b_pad = ((b + b_tile - 1) // b_tile) * b_tile
    planes = [_pad_axis(p, b_pad, 0) for p in planes]
    gathered = _gather_tile_planes(planes, tile_src, n_comp)
    pixel3 = [p[:, None, :] for p in (px, py)]
    grid = (t, b_pad // b_tile)
    width = s_max * n_comp
    param_spec = pl.BlockSpec((1, b_tile, width), lambda ti, bi: (ti, bi, 0),
                              memory_space=pltpu.VMEM)
    pixel_spec = pl.BlockSpec((1, 1, pix), lambda ti, bi: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tiled_render_kernel, n_comp=n_comp, s_max=s_max),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, pix), jnp.float32),
        grid=grid,
        in_specs=[param_spec] * 6 + [pixel_spec] * 2,
        out_specs=pl.BlockSpec((1, b_tile, pix), lambda ti, bi: (ti, bi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*gathered, *pixel3)
    return out[:, :b, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _tiled_render_custom(planes, tile_src, px, py, n_comp, s_max, b_tile, interpret):
    return _tiled_render_raw(planes, tile_src, px, py, n_comp, s_max, b_tile,
                             interpret)


def _tiled_render_fwd(planes, tile_src, px, py, n_comp, s_max, b_tile, interpret):
    out = _tiled_render_raw(planes, tile_src, px, py, n_comp, s_max, b_tile,
                            interpret)
    return out, (planes, tile_src, px, py)


def _tiled_render_bwd(n_comp, s_max, b_tile, interpret, residuals, g):
    planes, tile_src, px, py = residuals
    import numpy as _np

    if not interpret:
        d_planes = _tiled_render_bwd_pallas(planes, tile_src, px, py, g,
                                            n_comp, s_max, b_tile, interpret)
        return (d_planes, _np.zeros(tile_src.shape, dtype=jax.dtypes.float0),
                jnp.zeros_like(px), jnp.zeros_like(py))
    b = planes[0].shape[0]
    chunk = _bwd_chain_chunk(b, s_max, n_comp, px.shape[1])

    def one(args):
        planes_c, g_c = args

        def f(p):
            return _tiled_render_jnp(p, tile_src, px, py, n_comp)

        _, vjp = jax.vjp(f, planes_c)
        return vjp(g_c)[0]

    if chunk == b:
        d_planes = one((planes, g))
    else:
        n_chunks = b // chunk
        planes_r = tuple(p.reshape(n_chunks, chunk, -1) for p in planes)
        g_r = jnp.moveaxis(g, 1, 0).reshape(n_chunks, chunk, g.shape[0],
                                            g.shape[2])
        g_r = jnp.moveaxis(g_r, 2, 1)          # [n_chunks, T, chunk, PIX]
        d_r = jax.lax.map(one, (planes_r, g_r))
        d_planes = tuple(d.reshape(b, -1) for d in d_r)
    import numpy as _np
    return (d_planes, _np.zeros(tile_src.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(px), jnp.zeros_like(py))


_tiled_render_custom.defvjp(_tiled_render_fwd, _tiled_render_bwd)


def tiled_field_render(planes, data: TiledStampData, *, n_comp: int,
                       b_tile: int = DEFAULT_B_TILE, interpret: bool | None = None,
                       impl: str = "pallas"):
    """Sky-free lambda tiles [T, B, PIX] for a batched multi-source field —
    the cross-chip building block: shards render their local sources'
    partials, psum over the source axis, add sky, reduce (see
    celeste_tpu.parallel.crowded.sharded_tiled_crowded_loglik)."""
    return tiled_field_render_explicit(
        planes, data.tile_src, data.pixels[0], data.pixels[1],
        n_comp=n_comp, s_max=data.tile_map.s_max, b_tile=b_tile,
        interpret=interpret, impl=impl)


def tiled_field_render_explicit(planes, tile_src, px, py, *, n_comp: int,
                                s_max: int, b_tile: int = DEFAULT_B_TILE,
                                interpret: bool | None = None,
                                impl: str = "pallas"):
    """``tiled_field_render`` with the tile table passed explicitly —
    ``tile_src`` may be a TRACED [T, s_max] array (the source-sharded path
    feeds each shard its own table as data), so everything static the
    kernel needs (``s_max``) is an argument rather than read off a host
    TileMap.  This replaces round 1's duck-typed TiledStampData shim."""
    assert tile_src.shape[1] == s_max, (tile_src.shape, s_max)
    if impl == "jnp":
        return _tiled_render_jnp(planes, tile_src, px, py, n_comp)
    if interpret is None:
        interpret = _interpret_default()
    return _tiled_render_custom(tuple(planes), tile_src, px, py,
                                n_comp, s_max, b_tile, interpret)
