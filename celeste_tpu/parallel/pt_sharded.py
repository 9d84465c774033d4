"""Cross-device parallel tempering (SURVEY.md §2.2 tempering row + §5.8;
VERDICT r1 #9).

``inference.tempering.pt_kernel`` keeps the whole ladder on one chip (a
vmapped array axis) — right when T replicas of the state fit comfortably
and moves are cheap.  This module distributes the LADDER over a mesh axis:
each device holds T/n_devices replicas, moves run locally, and the even/odd
swap sweep crosses ICI with one tiny ``all_gather`` of the [T] log
densities (the accept decisions are computed redundantly on every device —
they are T-1 scalars) plus one ``ppermute`` edge exchange for the pairs
that straddle a device boundary.  Use it when a single replica's state or
per-move work is big enough that the ladder no longer fits or no longer
saturates one chip (e.g. tempered crowded-field posteriors); use the
in-device ladder otherwise.

Randomness mirrors ``pt_kernel`` exactly (same split structure), so the
sharded ladder is numerically the SAME Markov chain as the in-device one —
the parity test in tests/test_collectives.py asserts it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from celeste_tpu.inference.tempering import PTInfo, PTState
from celeste_tpu.parallel.collectives import ring_shift


def sharded_pt_init(xs, logdensity_fn) -> PTState:
    """Same as pt_init; xs [T, D] may be device_put with the ladder axis
    sharded."""
    logps = jax.vmap(logdensity_fn)(xs)
    return PTState(xs=xs, logps=logps, even_phase=jnp.bool_(True))


def sharded_pt_kernel(logdensity_fn, inner_kernel_fn, betas, mesh: Mesh,
                      axis_name: str = "temps"):
    """Tempered step with the ladder sharded over ``mesh[axis_name]``.

    Same contract as ``pt_kernel``: ``inner_kernel_fn(beta)`` returns a
    kernel bundle targeting ``beta * logdensity``; ``betas`` [T] with
    betas[0] == 1.  Returns ``(key, PTState) -> (PTState, PTInfo)`` where
    ``PTState.xs`` is [T, D] sharded along the ladder axis.
    """
    import inspect

    betas_np = np.asarray(betas, np.float32)
    t = betas_np.shape[0]
    n_dev = mesh.shape[axis_name]
    assert t % n_dev == 0, f"{t} temps over {n_dev} devices"
    t_loc = t // n_dev
    betas_j = jnp.asarray(betas_np)
    takes_idx = len(inspect.signature(inner_kernel_fn).parameters) >= 2

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name), P()),
        out_specs=(P(axis_name, None), P(axis_name), P(), P(), P()),
        check_vma=False,
    )
    def _step(key, xs_l, logps_l, even_phase):
        d_idx = jax.lax.axis_index(axis_name)
        k_move, k_swap = jax.random.split(key)

        # (a) local moves — identical key layout to pt_kernel: the global
        # [T] key split happens (redundantly) everywhere; each device uses
        # its slice, so replica r sees the same key stream as in-device.
        keys = jax.random.split(k_move, t)
        local_keys = jax.lax.dynamic_slice_in_dim(keys, d_idx * t_loc, t_loc)
        local_betas = jax.lax.dynamic_slice_in_dim(betas_j, d_idx * t_loc, t_loc)
        local_idx = d_idx * t_loc + jnp.arange(t_loc)

        def move(beta, idx, key_r, x, lp):
            kern = inner_kernel_fn(beta, idx) if takes_idx else inner_kernel_fn(beta)
            new, _ = kern.step(key_r, kern.init(x, lp))
            return new.x, new.logp / jnp.maximum(beta, 1e-12)

        xs_l, logps_l = jax.vmap(move)(local_betas, local_idx, local_keys,
                                       xs_l, logps_l)

        # (b) swap sweep: the [T] log densities are T scalars — gather them
        # and make every accept decision redundantly on all devices
        all_logps = jax.lax.all_gather(logps_l, axis_name, tiled=True)  # [T]
        i = jnp.arange(t - 1)
        active = (i % 2 == 0) == even_phase
        log_ratio = (betas_j[:-1] - betas_j[1:]) * (all_logps[1:] - all_logps[:-1])
        u = jax.random.uniform(k_swap, (t - 1,))
        accept = jnp.logical_and(active, jnp.log(u) < log_ratio)
        perm = jnp.arange(t)
        perm = perm.at[i].set(jnp.where(accept, i + 1, perm[i]))
        perm = perm.at[i + 1].set(jnp.where(accept, i, perm[i + 1]))

        # apply: adjacent swaps mean row g's source perm[g] is g-1, g, or
        # g+1 — at most the EDGE replica of each neighbor device, fetched
        # with one ppermute each way
        left_edge = ring_shift(xs_l[-1], axis_name, shift=1)   # from device d-1
        right_edge = ring_shift(xs_l[0], axis_name, shift=-1)  # from device d+1
        j = jnp.arange(t_loc)
        g = d_idx * t_loc + j
        pg = perm[g]                                           # [t_loc]
        rows = xs_l[jnp.clip(pg - d_idx * t_loc, 0, t_loc - 1)]
        from_left = (pg == g - 1) & (j == 0)
        from_right = (pg == g + 1) & (j == t_loc - 1)
        rows = jnp.where(from_left[:, None], left_edge[None, :], rows)
        rows = jnp.where(from_right[:, None], right_edge[None, :], rows)
        new_logps = all_logps[pg]
        return rows, new_logps, accept, active, all_logps[perm[0]]

    def kernel(key, state: PTState):
        xs, logps, accept, active, logp_cold = _step(
            key, state.xs, state.logps, state.even_phase)
        new_state = PTState(xs=xs, logps=logps,
                            even_phase=jnp.logical_not(state.even_phase))
        return new_state, PTInfo(swap_accept=accept, swap_active=active,
                                 logp_cold=logp_cold)

    return kernel
