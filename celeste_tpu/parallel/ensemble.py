"""Sharded chain ensembles (SURVEY.md §2.2 "DP row": 1024 vmapped chains
sharded over ICI; BASELINE config 5's chain axis).

The sampler kernels are already pure and vmapped; scaling them across chips
is *sharding annotation only*: chain states get a ``NamedSharding`` over
the ``chains`` mesh axis, the jitted update is identical, and XLA keeps
every per-chain computation chip-local (no communication in the hot loop).
Cross-chip communication happens only in ``ensemble_diagnostics`` — global
R-hat/ESS/acceptance reductions — which XLA lowers to ``psum``-style
collectives over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from celeste_tpu.inference.diagnostics import ess, split_rhat
from celeste_tpu.inference.runner import run_chains


def shard_chains(tree, mesh: Mesh):
    """Place a chain-batched pytree ([n_chains, ...] leaves) on the mesh,
    sharded along the leading axis (scalars replicate)."""

    def place(x):
        spec = P("chains") if jnp.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def run_sharded_ensemble(key, kernel, init_states, n_steps: int, mesh: Mesh,
                         thin: int = 1, collect=lambda s, i: s.x):
    """Like ``run_chains_ensemble`` but with chain states sharded over the
    mesh.  Compiles ONE program; XLA partitions the chain axis across
    devices (each device advances its chains independently — ICI stays idle
    in the hot loop, by construction)."""
    n_chains = jax.tree_util.tree_leaves(init_states)[0].shape[0]
    assert n_chains % mesh.devices.size == 0, (
        f"n_chains={n_chains} must divide over {mesh.devices.size} devices"
    )
    init_states = shard_chains(init_states, mesh)
    keys = jax.device_put(jax.random.split(key, n_chains),
                          NamedSharding(mesh, P("chains")))

    @jax.jit
    def run(keys, states):
        return jax.vmap(
            lambda k, s: run_chains(k, kernel, s, n_steps, thin, collect)
        )(keys, states)

    return run(keys, init_states)


def run_sharded_chees(key, logdensity_fn, xs0, mesh: Mesh,
                      n_warmup: int = 100, n_steps: int = 400, **chees_kw):
    """ChEES-HMC with the chain axis sharded over the mesh.

    Unlike the per-chain kernels above (which keep ICI idle in the hot
    loop), ChEES's adaptation statistics are POOLED across the ensemble —
    the cross-chain means in the ChEES gradient and the pooled accept rate
    become ICI all-reduces under GSPMD.  That is the intended multi-chip
    shape: per-chain leapfrogs stay chip-local, one scalar (eps, T) pair
    is co-adapted from the global ensemble each step, exactly the
    algorithm's estimator at its best (more chips = more chains = lower
    adaptation variance).  No code differs from the single-chip path;
    the sharding is annotation (SURVEY.md §2.2/§5.8).

    Returns (samples [B, n_steps, D], final state, eps, trajectory).
    """
    from celeste_tpu.inference import chees_warmup, run_chees_ensemble

    n_chains = xs0.shape[0]
    assert n_chains % mesh.devices.size == 0
    xs0 = jax.device_put(xs0, NamedSharding(mesh, P("chains")))
    k_warm, k_run = jax.random.split(key)
    state, eps, traj = jax.jit(
        lambda k, x: chees_warmup(k, logdensity_fn, x, n_warmup=n_warmup,
                                  **chees_kw))(k_warm, xs0)
    samples, state, _ = jax.jit(
        lambda k, s, e, t: run_chees_ensemble(
            k, logdensity_fn, s, n_steps=n_steps, step_size=e,
            trajectory_length=t,
            max_leapfrog=chees_kw.get("max_leapfrog", 256))
    )(k_run, state, eps, traj)
    return samples, state, eps, traj


def ensemble_diagnostics(samples, mesh: Mesh | None = None):
    """Global convergence diagnostics over a (possibly sharded) sample
    array [n_chains, n_steps, D].  The reductions are ordinary jnp; when
    the input is sharded over ``chains`` XLA inserts the cross-chip
    collectives (all-reduce of means/variances) automatically."""
    return {
        "rhat": split_rhat(samples),
        "ess": ess(samples),
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
    }
