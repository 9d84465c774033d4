"""Chain runners: ``lax.scan`` over time, ``vmap`` over chains (SURVEY.md
§7: "all samplers are (key, state) -> state pure functions under lax.scan";
ensembles via vmap; sharding via celeste_tpu.parallel wraps these
unchanged)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run_chains(key, kernel, init_state, n_steps: int, thin: int = 1,
               collect=lambda s, i: s.x):
    """Run one chain: scan ``kernel`` for ``n_steps``.

    ``collect(state, info)`` picks what to record at each kept step (default
    the position); with ``thin`` > 1 only every thin-th state is kept (the
    scan runs in blocks of ``thin`` to avoid materializing dropped states).

    Returns (samples pytree stacked over kept steps, final_state, last_info).
    """
    assert n_steps % thin == 0, "n_steps must be divisible by thin"

    def outer(state, key_t):
        keys = jax.random.split(key_t, thin)

        def inner(s, k):
            s, info = kernel(k, s)
            return s, info

        state, infos = jax.lax.scan(inner, state, keys)
        last_info = jax.tree_util.tree_map(lambda a: a[-1], infos)
        return state, (collect(state, last_info), last_info)

    keys = jax.random.split(key, n_steps // thin)
    final_state, (samples, infos) = jax.lax.scan(outer, init_state, keys)
    return samples, final_state, infos


def run_chains_ensemble(key, kernel, init_states, n_steps: int, thin: int = 1,
                        collect=lambda s, i: s.x):
    """vmap ``run_chains`` over a batch of chains.  ``init_states`` is a
    pytree with a leading chain axis; returns samples with shape
    [n_chains, n_kept, ...]."""
    n_chains = jax.tree_util.tree_leaves(init_states)[0].shape[0]
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k, s: run_chains(k, kernel, s, n_steps, thin, collect)
    )(keys, init_states)
