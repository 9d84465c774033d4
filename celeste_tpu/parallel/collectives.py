"""Thin collective-ops layer (SURVEY.md §2.3/§5.8: "all accessed through
one thin ``collectives.py`` so tests can run on CPU host-device meshes").

The reference has no distributed backend at all; these wrappers name the
three communication patterns the rebuild actually uses and keep every
``jax.lax`` collective call in one place:

- ``all_reduce_sum`` / ``all_mean`` — chain-ensemble diagnostics (R-hat,
  acceptance stats) and crowded-field lambda assembly (psum over the
  ``sources`` axis BEFORE the Poisson log);
- ``ring_shift`` — ``ppermute`` neighbor exchange: tempering-ladder swap
  proposals across a device axis, and the rotation primitive for
  ring-style source-block streaming when a catalog doesn't fit per-device;
- ``gather_axis`` — ``all_gather`` of per-device states for host-side
  snapshots/checkpoint fan-in.

All are ordinary named-axis collectives: they run identically under
``shard_map`` over a real ICI mesh axis or a virtual CPU mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_reduce_sum(x, axis_name: str):
    """psum over a mesh axis (ICI all-reduce)."""
    return jax.lax.psum(x, axis_name=axis_name)


def all_mean(x, axis_name: str):
    """pmean over a mesh axis."""
    return jax.lax.pmean(x, axis_name=axis_name)


def ring_shift(x, axis_name: str, shift: int = 1):
    """ppermute ring rotation: device i receives the value held by
    (i - shift) mod n.  perm entries are (source, destination) pairs."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name=axis_name, perm=perm)


def neighbor_exchange(x, axis_name: str):
    """Swap with the paired neighbor (0<->1, 2<->3, ...): the cross-device
    tempering-swap pattern.  Odd-phase pairing composes from ring shifts by
    the caller."""
    n = jax.lax.axis_size(axis_name)
    perm = []
    for i in range(0, n - 1, 2):
        perm += [(i, i + 1), (i + 1, i)]
    if n % 2 == 1:
        perm.append((n - 1, n - 1))
    return jax.lax.ppermute(x, axis_name=axis_name, perm=perm)


def gather_axis(x, axis_name: str, tiled: bool = False):
    """all_gather along a mesh axis."""
    return jax.lax.all_gather(x, axis_name=axis_name, tiled=tiled)


def axis_index(axis_name: str):
    return jax.lax.axis_index(axis_name)
