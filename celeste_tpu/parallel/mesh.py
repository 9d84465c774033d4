"""Device-mesh construction helpers (SURVEY.md §5.8)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict | None = None) -> Mesh:
    """Build a mesh from the available devices.

    ``axis_sizes`` maps axis name -> size; sizes must multiply to at most
    ``len(jax.devices())`` (missing factor goes to the first axis).  Default:
    1-D mesh over all devices on axis ``chains``.
    """
    devices = np.asarray(jax.devices())
    if not axis_sizes:
        return Mesh(devices, axis_names=("chains",))
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    assert n <= devices.size, f"mesh {axis_sizes} needs {n} devices, have {devices.size}"
    return Mesh(devices[:n].reshape(sizes), axis_names=names)


def chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the chain-ensemble axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("chains",))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading chain axis."""
    return NamedSharding(mesh, P("chains"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
