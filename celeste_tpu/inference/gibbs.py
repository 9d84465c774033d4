"""Per-source block-Gibbs sweeps (SURVEY.md C11/§3.2: the reference's
``sample_source_params`` loops over sources updating each source's block
conditioned on the rest; the rebuild keeps this kernel for behavioral
parity and for crowded fields where per-block moves mix better than joint
proposals).

A sweep = ``lax.scan`` over source blocks; each block update is a
random-walk MH proposal on that block alone (the reference used slice
updates per coordinate; MH-per-block is the vectorization-friendly
equivalent and the slice kernel remains available for exact-parity runs).
Red/black coloring (SURVEY.md §2.2 "Gibbs/source parallelism") updates
non-overlapping sources simultaneously: sources in the same color group
get a SINGLE fused proposal, valid because their conditionals factorize
when their stamps don't overlap.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class GibbsState(NamedTuple):
    x: jax.Array      # [D_total] joint vector
    logp: jax.Array


class GibbsInfo(NamedTuple):
    accepted: jax.Array    # [n_blocks] per-block acceptance this sweep
    logp: jax.Array


def gibbs_init(x0, logdensity_fn) -> GibbsState:
    x0 = jnp.asarray(x0)
    return GibbsState(x=x0, logp=logdensity_fn(x0))


def block_gibbs_kernel(logdensity_fn, blocks: Sequence[tuple], step_scales):
    """Build a sweep kernel.

    ``blocks``: list of (offset, width) slices of the joint vector — one per
    source (from ``CrowdedScene.block_slices``).  ``step_scales``: [D_total]
    per-coordinate proposal scales.
    """
    step_scales = jnp.asarray(step_scales, jnp.float32)
    offsets = jnp.asarray([b[0] for b in blocks], jnp.int32)
    widths = [int(b[1]) for b in blocks]
    max_w = max(widths)
    widths_arr = jnp.asarray(widths, jnp.int32)
    n_blocks = len(blocks)

    def step(key, state: GibbsState):
        def update_block(carry, idx):
            x, logp, key = carry
            key, k_prop, k_acc = jax.random.split(key, 3)
            off = offsets[idx]
            w = widths_arr[idx]
            # propose on a max-width window, masked to the true block width.
            # Work on a zero-padded copy so dynamic_slice never clamps the
            # start index for trailing narrower blocks (clamping would
            # silently shift the window and leave coordinates un-proposed).
            pad = jnp.zeros((max_w,), x.dtype)
            x_pad = jnp.concatenate([x, pad])
            scales_pad = jnp.concatenate([step_scales, pad])
            noise = jax.random.normal(k_prop, (max_w,), x.dtype)
            lane = jnp.arange(max_w)
            window = jax.lax.dynamic_slice(x_pad, (off,), (max_w,))
            scales = jax.lax.dynamic_slice(scales_pad, (off,), (max_w,))
            prop_window = jnp.where(lane < w, window + scales * noise, window)
            x_prop = jax.lax.dynamic_update_slice(x_pad, prop_window, (off,))[
                : x.shape[0]]
            logp_prop = logdensity_fn(x_prop)
            accept = jnp.log(jax.random.uniform(k_acc, (), logp.dtype)) < (logp_prop - logp)
            x = jnp.where(accept, x_prop, x)
            logp = jnp.where(accept, logp_prop, logp)
            return (x, logp, key), accept

        (x, logp, _), accepted = jax.lax.scan(
            update_block, (state.x, state.logp, key), jnp.arange(n_blocks)
        )
        return GibbsState(x=x, logp=logp), GibbsInfo(accepted=accepted, logp=logp)

    return step


def color_sources(positions, radius: float):
    """Greedy graph coloring of sources by overlap (host-side NumPy):
    sources closer than ``radius`` (arcsec) share an edge and get different
    colors.  Returns an int array [S] of colors; sources of one color can
    update in parallel (their likelihood blocks don't interact)."""
    import numpy as np

    pos = np.asarray(positions, np.float64)
    s = pos.shape[0]
    colors = np.full(s, -1, np.int64)
    for i in range(s):
        d = np.sqrt(np.sum((pos[:i] - pos[i]) ** 2, axis=1))
        neighbor_colors = {int(colors[j]) for j in range(i) if d[j] < radius}
        c = 0
        while c in neighbor_colors:
            c += 1
        colors[i] = c
    return colors


def colored_gibbs_kernel(logdensity_fn, blocks: Sequence[tuple], colors, step_scales):
    """Red/black (multi-color) Gibbs: one MH proposal jointly updates ALL
    sources of a color class, scanning over color classes.  With
    non-overlapping same-color sources the acceptance factorizes, so this
    is the parallel version of the sequential sweep (exact when the
    coloring is valid; still a correct MH kernel on the joint state even
    when it is not)."""
    import numpy as np

    step_scales = jnp.asarray(step_scales, jnp.float32)
    colors = np.asarray(colors)
    n_colors = int(colors.max()) + 1
    d_total = int(step_scales.shape[0])
    # per-color coordinate masks; blocks may be (off, width) pairs or the
    # (off, width, kind) triples CrowdedScene.block_slices() produces
    masks = np.zeros((n_colors, d_total), np.float32)
    for blk, c in zip(blocks, colors):
        off, w = int(blk[0]), int(blk[1])
        masks[int(c), off:off + w] = 1.0
    masks = jnp.asarray(masks)

    def step(key, state: GibbsState):
        def update_color(carry, c_idx):
            x, logp, key = carry
            key, k_prop, k_acc = jax.random.split(key, 3)
            m = masks[c_idx]
            noise = jax.random.normal(k_prop, x.shape, x.dtype)
            x_prop = x + m * step_scales * noise
            logp_prop = logdensity_fn(x_prop)
            accept = jnp.log(jax.random.uniform(k_acc, (), logp.dtype)) < (logp_prop - logp)
            x = jnp.where(accept, x_prop, x)
            logp = jnp.where(accept, logp_prop, logp)
            return (x, logp, key), accept

        (x, logp, _), accepted = jax.lax.scan(
            update_color, (state.x, state.logp, key), jnp.arange(n_colors)
        )
        return GibbsState(x=x, logp=logp), GibbsInfo(accepted=accepted, logp=logp)

    return step
