"""Crowded-field joint inference (SURVEY.md §5.7, BASELINE config 5: 10+
overlapping sources, 1024 chains sharded over a slice).

This is the framework's sequence-parallel analog: the additive structure of
the expected image — lambda(m) = sky(m) + sum_s lambda_s(m) — lets the
source catalog shard across a mesh axis.  Each device renders the partial
lambda of ITS sources for a chain block, a ``psum`` over the ``sources``
axis assembles the full lambda, and the Poisson reduction happens after the
collective (the log nonlinearity must see the complete sum; SURVEY.md §7
M6 hard part).  Chains shard over the orthogonal ``chains`` axis and never
communicate.

Single-chip path: the scene flattens into ONE MoG field (concatenated
per-source components) and reuses the fused kernel — no lambda ever
materializes.  The sharded path materializes lambda per chain block only
because it must cross ICI; tiling it block-sparsely is the planned
optimization (§5.7 "block-sparse source->tile mapping").
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from celeste_tpu.kernels.mog_field import (
    _field_planes,
    mog_field_loglik,
    stamp_pixel_data,
)
from celeste_tpu.likelihood._pixel import pixel_loglik
from celeste_tpu.model.params import GalaxyParams, StarParams
from celeste_tpu.model.priors import SourcePriors

STAR_D = lambda b: 2 + b
GAL_D = lambda b: 6 + b


@dataclass(frozen=True)
class CrowdedScene:
    """Static description of a multi-source problem on one stamp.

    kinds: per-source 'star'/'galaxy' tuple (static — determines the flat
    joint vector layout: sources packed in order, star blocks 2+B wide,
    galaxy blocks 6+B wide).
    """

    kinds: Tuple[str, ...]
    n_bands: int = 5

    @property
    def n_sources(self):
        return len(self.kinds)

    def block_slices(self):
        out, off = [], 0
        for k in self.kinds:
            d = STAR_D(self.n_bands) if k == "star" else GAL_D(self.n_bands)
            out.append((off, d, k))
            off += d
        return out, off

    @property
    def dim(self):
        return self.block_slices()[1]

    def unpack(self, vec):
        """Joint [D_total] vector -> list of Star/GalaxyParams."""
        blocks, _ = self.block_slices()
        params = []
        for off, d, kind in blocks:
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            if kind == "star":
                params.append(StarParams.from_vector(v, self.n_bands))
            else:
                params.append(GalaxyParams.from_vector(v, self.n_bands))
        return params

    # -- rectangular (star-padded) layout for the sharded paths ------------
    # Mixed scenes shard over a mesh axis as a rectangular [S, GAL_D] state:
    # every source gets the galaxy width; star rows use the first 2+B slots
    # and carry inert padding after (anchored by crowded_rect_logprior so
    # the joint stays proper under gradient samplers).

    @property
    def rect_dim(self):
        return GAL_D(self.n_bands)

    @property
    def is_star_flags(self):
        return np.asarray([k == "star" for k in self.kinds])

    def to_rect(self, vec):
        """Packed joint [..., D_total] -> rectangular [..., S, GAL_D]."""
        blocks, _ = self.block_slices()
        rows = []
        for off, d, kind in blocks:
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            pad = self.rect_dim - d
            if pad:
                v = jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1)
            rows.append(v)
        return jnp.stack(rows, axis=-2)

    def from_rect(self, rect):
        """Rectangular [..., S, GAL_D] -> packed joint [..., D_total]."""
        blocks, _ = self.block_slices()
        parts = [rect[..., i, :d] for i, (off, d, kind) in enumerate(blocks)]
        return jnp.concatenate(parts, axis=-1)


def scene_field_planes(scene: CrowdedScene, vec, stamp, band):
    """Joint vector -> concatenated per-component planes over all sources
    ([C_total] each)."""
    blocks, _ = scene.block_slices()
    planes = []
    for off, d, kind in blocks:
        v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
        planes.append(_field_planes(v, stamp, band, kind, scene.n_bands))
    return tuple(jnp.concatenate(parts, axis=-1) for parts in zip(*planes))


def make_crowded_logdensity(scene: CrowdedScene, stamps: Sequence, bands: Sequence[int],
                            priors: SourcePriors | None = None,
                            centered: bool = False):
    """Single-chip joint log density over the flat [D_total] vector, running
    the whole scene through the fused kernel path (or jnp off-TPU).

    ``centered=True`` computes every pixel term relative to the saturated
    model (same posterior/gradients; ~1000x smaller fp32 magnitude — the
    difference between HMC energy errors being resolvable or rounding
    noise on multi-band fields; ``likelihood._pixel``)."""
    priors = priors or SourcePriors()
    stamps = list(stamps)
    bands = list(bands)
    pixel_data = [stamp_pixel_data(s) for s in stamps]

    def logdensity(vec):
        ll = 0.0
        for stamp, band, pd in zip(stamps, bands, pixel_data):
            planes = scene_field_planes(scene, vec, stamp, band)
            planes_b = tuple(p[None, :] for p in planes)
            ll = ll + mog_field_loglik(*planes_b, pd, impl="jnp",
                                       centered=centered)[0]
        blocks, _ = scene.block_slices()
        for (off, d, kind), params in zip(blocks, scene.unpack(vec)):
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            if kind == "star":
                ll = ll + priors.star_logpdf(params)
                ll = ll + StarParams.log_det_jacobian(v, scene.n_bands)
            else:
                ll = ll + priors.galaxy_logpdf(params)
                ll = ll + GalaxyParams.log_det_jacobian(v, scene.n_bands)
        return ll

    return logdensity


def make_tiled_crowded_logdensity(scene: CrowdedScene, stamp, band,
                                  positions_px, radii_px=12.0,
                                  priors: SourcePriors | None = None,
                                  s_max: int | None = None,
                                  n_buckets: int = 2, impl: str = "pallas",
                                  centered: bool = False):
    """Joint log density over the flat [D_total] vector using the
    block-sparse tiled kernel (SURVEY.md §5.7) — the production path for
    large fields where dense S x P evaluation is quadratic waste.

    ``positions_px``: approximate source pixel positions (from detection /
    catalog) used ONLY to build the static tile map; the sampled positions
    move freely within the tile radius.  ``stamp``/``band`` may be lists
    for multi-band joint inference (one tile map per band).
    Returns ``(logdensity(vec), data)`` with ``data`` the first band's
    TiledStampData (or the list for multi-band).

    ``centered=True`` evaluates every pixel term relative to the saturated
    model (identical posterior/gradients, ~1000x smaller fp32 magnitude).
    REQUIRED in practice for multi-band joint fields: uncentered, the
    3-band config-5 log-posterior is ~1.65e7 where fp32 resolves only ~2
    nats, so HMC acceptance is rounding noise (``likelihood._pixel``).
    """
    from celeste_tpu.kernels.tiled_field import (
        TiledStampData,
        scene_planes_blocked,
        scene_planes_padded,
        tiled_field_loglik,
    )
    from celeste_tpu.parallel.tiles import build_block_tile_map, build_tile_map

    priors = priors or SourcePriors()
    kinds = set(scene.kinds)
    mixed = len(kinds) > 1
    from celeste_tpu.model.galaxy import N_GAL
    is_multi = isinstance(stamp, (list, tuple))
    stamps = list(stamp) if is_multi else [stamp]
    bands = list(band) if isinstance(band, (list, tuple)) else [band]
    assert len(stamps) == len(bands)
    assert all(s.psf.n_components == stamps[0].psf.n_components for s in stamps), (
        "all bands must share the PSF component count (the per-chain planes "
        "are reshaped with one n_comp)")
    k_psf = stamps[0].psf.n_components
    # mixed scenes go through the component-BLOCK layout (slots of width K;
    # stars own 1 real block, galaxies N_GAL) so per-tile work tracks the
    # true component count instead of padding stars to the galaxy width
    n_comp = (k_psf if mixed or scene.kinds[0] == "star"
              else N_GAL * k_psf)
    # positions_px: one [S, 2] array shared across bands (synthetic scenes,
    # co-registered cutouts) or a per-band list — real multi-band frames
    # have per-band WCS/cutout origins, so pass per-band positions there or
    # the tile maps of the other bands will be misaligned.
    per_band_pos = (isinstance(positions_px, (list, tuple))
                    and len(positions_px) == len(stamps)
                    and np.asarray(positions_px[0]).ndim == 2)
    pos_per_band = (list(positions_px) if per_band_pos
                    else [np.asarray(positions_px)] * len(stamps))
    for pos in pos_per_band:
        assert np.asarray(pos).shape == (scene.n_sources, 2), (
            f"positions must be [{scene.n_sources}, 2] per band; got "
            f"{np.asarray(pos).shape} (a stacked [n_bands, S, 2] ndarray is "
            f"ambiguous — pass a LIST of per-band [S, 2] arrays)")
    datas = []
    for st, pos in zip(stamps, pos_per_band):
        shape = np.asarray(st.counts).shape
        if mixed:
            tm = build_block_tile_map(pos, radii_px, scene.kinds, shape,
                                      n_blocks_gal=N_GAL, s_max=s_max)
        else:
            tm = build_tile_map(pos, radii_px, shape, s_max=s_max)
        datas.append(TiledStampData(tm, st, n_buckets=n_buckets))

    planes_fn = scene_planes_blocked if mixed else scene_planes_padded

    # impl note: per-chain logdensities get vmapped by the samplers; the
    # jnp path (scan-VJP) batches cleanly under vmap, while the pallas path
    # pays an 8-row sublane pad per chain — prefer impl="jnp" when the
    # consumer is a vmapped sampler, impl="pallas" for batched evaluation
    def _prior_part(vec):
        lp = 0.0
        blocks, _ = scene.block_slices()
        for (off, d, kind), params in zip(blocks, scene.unpack(vec)):
            v = jax.lax.dynamic_slice_in_dim(vec, off, d, axis=-1)
            if kind == "star":
                lp = lp + priors.star_logpdf(params)
                lp = lp + StarParams.log_det_jacobian(v, scene.n_bands)
            else:
                lp = lp + priors.galaxy_logpdf(params)
                lp = lp + GalaxyParams.log_det_jacobian(v, scene.n_bands)
        return lp

    def _ll_batch(vecs, ll_impl):
        ll = 0.0
        for st, b, data in zip(stamps, bands, datas):
            planes = planes_fn(scene, vecs, st, b)
            ll = ll + tiled_field_loglik(planes, data, n_comp=n_comp,
                                         impl=ll_impl, centered=centered)
        return ll + jax.vmap(_prior_part)(vecs)

    def logdensity(vec):
        return _ll_batch(vec[None, :], impl)[0]

    def logdensity_batch(vecs):
        """[B, D] -> [B], batch-major through the tiled kernels (the fast
        layout for ensemble work; the scan-VJP backward stays slice/DUS-
        shaped instead of being batched into scatters)."""
        return _ll_batch(vecs, impl)

    # samplers pick this up via value_and_grad_of: vmapped gradients route
    # through ONE vjp of the batch-major program (measured 7x faster than
    # vmap(grad(.)) at B=1024 on v5e; see inference/vg.py).  On TPU that
    # program is the Pallas forward + Pallas backward kernel pair (grad
    # 19.5 ms vs 42.9 ms jnp at B=1024, scripts/tpu_session6); on CPU the
    # jnp mirror avoids interpret-mode kernels in tests.
    from celeste_tpu.inference.vg import batch_aware_value_and_grad

    vg_impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    logdensity.batched = logdensity_batch
    logdensity.value_and_grad = batch_aware_value_and_grad(
        logdensity, lambda vecs: _ll_batch(vecs, vg_impl))

    # return shape mirrors the input shape (a list in -> a list out)
    return logdensity, (datas if is_multi else datas[0])


def crowded_rect_logprior(scene: CrowdedScene, vecs,
                          priors: SourcePriors | None = None):
    """Prior + log|det J| for the rectangular [..., S, GAL_D] crowded state
    used by the sharded paths.  Star rows evaluate the star prior on their
    first 2+B slots; their unused galaxy-shape slots get a standard-normal
    anchor so the joint density stays proper under gradient samplers (the
    likelihood is flat in those directions).  Returns [...] (batch shape).

    Kinds are static here (runs OUTSIDE shard_map, where per-source Python
    structure is fine); priors are negligible next to the pixel work.
    """
    priors = priors or SourcePriors()
    nb = scene.n_bands
    sd, gd = STAR_D(nb), GAL_D(nb)
    lp = 0.0
    for i, kind in enumerate(scene.kinds):
        row = vecs[..., i, :]
        if kind == "star":
            v = row[..., :sd]
            p = StarParams.from_vector(v, nb)
            lp = lp + priors.star_logpdf(p)
            lp = lp + StarParams.log_det_jacobian(v, nb)
            pad = row[..., sd:gd]
            lp = lp - 0.5 * jnp.sum(pad * pad, axis=-1)   # anchor
        else:
            p = GalaxyParams.from_vector(row, nb)
            lp = lp + priors.galaxy_logpdf(p)
            lp = lp + GalaxyParams.log_det_jacobian(row, nb)
    return lp


def sharded_crowded_loglik(scene: CrowdedScene, stamp, band, mesh: Mesh,
                           *, n_bands: int | None = None,
                           centered: bool = False):
    """Build the cross-chip likelihood: chains sharded over ``chains``,
    sources over ``sources``; per-device partial lambdas ``psum``'d over the
    source axis before the Poisson reduction.

    Returns ``f(vecs [B, S, D_s]) -> [B]``.  Uniform-kind scenes take the
    narrow-width fast path (D_s = kind width); MIXED scenes take the
    rectangular layout (D_s = GAL_D, star rows padded; see
    ``CrowdedScene.to_rect``) with a traced per-source is_star flag sharded
    along ``sources`` — the kind pattern differs across shards, so it must
    be data for the program to stay SPMD.
    """
    from celeste_tpu.kernels.mog_field import mixed_field_planes

    kinds = set(scene.kinds)
    mixed = len(kinds) > 1
    kind = scene.kinds[0]
    nb = n_bands or scene.n_bands
    pd = stamp_pixel_data(stamp)
    px, py, counts, sky, mask = pd
    n_src = scene.n_sources
    s_shard = mesh.shape["sources"]
    assert n_src % s_shard == 0, f"{n_src} sources over {s_shard} shards"
    is_star = jnp.asarray(scene.is_star_flags)

    def local_lambda(vecs_local, flags_local, stamp_, pix):
        """[B_loc, S_loc, D] -> partial lambda [B_loc, PIX] (no sky)."""
        px_, py_ = pix

        def chain_lambda(vs):
            def one_source(v, flag):
                if mixed:
                    amp, mx, my, pa, pb, pc = mixed_field_planes(
                        v, stamp_, band, nb, flag)
                else:
                    amp, mx, my, pa, pb, pc = _field_planes(
                        v, stamp_, band, kind, nb)
                dx = px_[0][None, :] - mx[:, None]
                dy = py_[0][None, :] - my[:, None]
                quad = (pa[:, None] * dx * dx + 2.0 * pb[:, None] * dx * dy
                        + pc[:, None] * dy * dy)
                return jnp.sum(amp[:, None] * jnp.exp(-0.5 * quad), axis=0)

            return jnp.sum(jax.vmap(one_source)(vs, flags_local), axis=0)

        return jax.vmap(chain_lambda)(vecs_local)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("chains", "sources", None), P("sources")),
        out_specs=P("chains"),
        check_vma=False,
    )
    def sharded_ll(vecs, flags):
        lam_part = local_lambda(vecs, flags, stamp, (px, py))   # [B_loc, PIX]
        lam = jax.lax.psum(lam_part, axis_name="sources") + sky
        ll = pixel_loglik(lam, counts, centered) * mask
        return jnp.sum(ll, axis=-1)

    return lambda vecs: sharded_ll(vecs, is_star)


def sharded_tiled_crowded_loglik(scene: CrowdedScene, stamp, band, mesh: Mesh,
                                 positions_px, radii_px=12.0,
                                 *, n_bands: int | None = None,
                                 n_buckets: int = 1, impl: str = "pallas",
                                 chain_chunk: int | None = None,
                                 centered: bool = False):
    """The full composition (SURVEY.md §5.7 + §5.8): block-sparse TILING x
    source sharding x chain sharding.

    Each device on the ``sources`` axis holds S/n_shards sources and renders
    ONLY its local sources' sky-free lambda tiles through the tiled render
    kernel (work ~ local_S_MAX * PIX); a ``psum`` over ``sources``
    assembles the full-field lambda; sky is added once and the Poisson
    reduction runs locally.  Chains shard over the orthogonal ``chains``
    axis and never communicate.

    Returns ``f(vecs [B, S, D_s]) -> [B]``.  The per-shard tile maps are
    built host-side from ``positions_px`` with a COMMON s_max so the
    program stays SPMD; the tables are sharded DATA, so they may differ per
    shard even though the program is uniform.  Uniform-kind scenes index
    tiles by source (D_s = kind width); MIXED scenes use the rectangular
    layout (D_s = GAL_D, ``CrowdedScene.to_rect``) with component-BLOCK
    tile tables (tiles.build_block_tile_map) and a traced per-source
    is_star flag — per-tile work tracks the true component count, so stars
    never pay the galaxy width in the kernel.
    """
    from celeste_tpu.kernels.tiled_field import (
        TiledStampData,
        tiled_field_render_explicit,
    )
    from celeste_tpu.kernels.mog_field import _field_planes, mixed_field_planes
    from celeste_tpu.model.galaxy import N_GAL
    from celeste_tpu.parallel.tiles import build_block_tile_map, build_tile_map

    kinds = set(scene.kinds)
    mixed = len(kinds) > 1
    kind = scene.kinds[0]
    nb = n_bands or scene.n_bands
    n_src = scene.n_sources
    s_shard = mesh.shape["sources"]
    assert n_src % s_shard == 0, f"{n_src} sources over {s_shard} shards"
    s_loc = n_src // s_shard
    shape = np.asarray(stamp.counts).shape
    pos = np.asarray(positions_px, np.float64)
    assert pos.shape == (n_src, 2), (
        f"positions_px must be [{n_src}, 2]; got {pos.shape}")
    radii = np.broadcast_to(np.asarray(radii_px, np.float64), (n_src,))
    k_psf = stamp.psf.n_components

    # per-shard tile maps over the SAME tiling (same T); pad every shard's
    # table to the common s_max with its own sentinel so the program stays
    # SPMD without rebuilding the maps
    def shard_tm(i):
        sl = slice(i * s_loc, (i + 1) * s_loc)
        if mixed:
            return build_block_tile_map(pos[sl], radii[sl], scene.kinds[sl],
                                        shape, n_blocks_gal=N_GAL)
        return build_tile_map(pos[sl], radii[sl], shape)

    tms = [shard_tm(i) for i in range(s_shard)]
    s_max = max(tm.s_max for tm in tms)
    sentinel = s_loc * N_GAL if mixed else s_loc
    tables = [np.pad(tm.tile_src, ((0, 0), (0, s_max - tm.s_max)),
                     constant_values=sentinel) for tm in tms]
    px, py, counts_t, sky_t, mask_t = TiledStampData(tms[0], stamp).pixels
    n_tiles = tms[0].n_tiles
    n_comp = k_psf if mixed or kind == "star" else N_GAL * k_psf
    is_star = jnp.asarray(scene.is_star_flags)

    # ---- occupancy bucketing with a COMMON bucket STRUCTURE (VERDICT r1
    # #6): bucket count, per-bucket tile count and s_cap are static and
    # identical on every shard (SPMD); WHICH tiles land in which bucket is
    # per-shard DATA (gather indices).  Shards with fewer tiles in a bucket
    # pad with a scratch tile (index n_tiles, all-sentinel row) whose
    # render is zero and lands in a discarded scatter slot.
    occ = [np.sum(t != sentinel, axis=1) for t in tables]       # per shard [T]
    if n_buckets > 1 and n_tiles >= 2:
        all_occ = np.concatenate(occ)
        qs = np.quantile(all_occ, np.linspace(0, 1, n_buckets + 1)[1:-1])
        caps = sorted(set(max(1, int(np.ceil(q))) for q in qs) | {s_max})
    else:
        caps = [s_max]
    bucket_of = [np.searchsorted(caps, o) for o in occ]         # cap idx per tile
    buckets = []                # (idx [n_shards, T_b], table [n_shards, T_b, cap])
    for b, cap in enumerate(caps):
        sel = [np.where(bo == b)[0] for bo in bucket_of]
        t_b = max(len(s) for s in sel)
        if t_b == 0:
            continue
        idx = np.full((s_shard, t_b), n_tiles, np.int32)        # scratch pad
        tab = np.full((s_shard, t_b, cap), sentinel, np.int32)
        for i, s in enumerate(sel):
            idx[i, : len(s)] = s
            tab[i, : len(s)] = tables[i][s][:, :cap]
        buckets.append((jnp.asarray(idx), jnp.asarray(tab)))
    bucket_caps = tuple(b[1].shape[2] for b in buckets)
    # pixel coords padded with the scratch row
    px_pad = jnp.concatenate([px, jnp.zeros_like(px[:1])], axis=0)
    py_pad = jnp.concatenate([py, jnp.zeros_like(py[:1])], axis=0)

    bucket_specs = tuple((P("sources", None), P("sources", None, None))
                         for _ in buckets)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("chains", "sources", None), bucket_specs, P("sources")),
        out_specs=P("chains"),
        check_vma=False,
    )
    def sharded_ll(vecs, bucket_data, flags):
        # local planes: [B_chunk, S_loc, D] -> [B_chunk, (n_slots+1)*n_comp]
        def one_chain(vs):
            if mixed:
                per = jax.vmap(lambda v, f: mixed_field_planes(
                    v, stamp, band, nb, f))(vs, flags)   # [S_loc, N_GAL*K]
            else:
                per = jax.vmap(
                    lambda v: _field_planes(v, stamp, band, kind, nb))(vs)
            out = []
            for p in per:
                p = p.reshape(-1, n_comp)                # [n_slots, n_comp]
                p = jnp.concatenate([p, jnp.zeros_like(p[:1])], axis=0)
                out.append(p.reshape(-1))
            return tuple(out)

        def chunk_ll(vecs_chunk):
            planes = jax.vmap(one_chain)(vecs_chunk)
            b_c = vecs_chunk.shape[0]
            pix = px.shape[1]
            lam_full = jnp.zeros((n_tiles + 1, b_c, pix), jnp.float32)
            for (idx_s, tab_s), cap in zip(bucket_data, bucket_caps):
                idx, tab = idx_s[0], tab_s[0]
                lam_b = tiled_field_render_explicit(
                    planes, tab, px_pad[idx], py_pad[idx],
                    n_comp=n_comp, s_max=cap, impl=impl)  # [T_b, B_c, PIX]
                lam_full = lam_full.at[idx].add(lam_b)
            lam_part = lam_full[:n_tiles]
            lam = jax.lax.psum(lam_part, axis_name="sources") + sky_t[:, None, :]
            ll = pixel_loglik(lam, counts_t[:, None, :],
                              centered) * mask_t[:, None, :]
            return jnp.sum(ll, axis=(0, 2))                      # [B_c]

        # chunk the chain axis: the [T, B, PIX] lambda tiles must cross ICI
        # but need not all exist at once — unchunked, a 64-src field at
        # B=256 blows the 16 MB VMEM budget (measured: 74.9M scoped alloc)
        b_loc = vecs.shape[0]
        pix = px.shape[1]
        if chain_chunk is None:
            budget = 1 << 21                            # ~2 MB of lambda tiles
            target = max(1, min(b_loc, budget // max(1, n_tiles * pix * 4)))
        else:
            target = min(chain_chunk, b_loc)
        # largest divisor of b_loc not exceeding the target (static shapes)
        chunk = max(d for d in range(1, target + 1) if b_loc % d == 0)
        if chunk == b_loc:
            return chunk_ll(vecs)
        out = jax.lax.map(chunk_ll, vecs.reshape(b_loc // chunk, chunk,
                                                 *vecs.shape[1:]))
        return out.reshape(b_loc)

    bucket_arrays = tuple(buckets)
    return lambda vecs: sharded_ll(vecs, bucket_arrays, is_star)
