"""Multi-chip scaling layer (SURVEY.md §2.2/§2.3/§5.7/§5.8).

The reference is a single NumPy process; its TPU-native replacement scales
two ways, both expressed as mesh axes rather than processes:

- ``chains``: embarrassingly-parallel chain ensembles sharded over ICI
  (data-parallel analog) with ``psum``-based cross-chip diagnostics;
- ``sources``: crowded-field source catalogs sharded over ICI with additive
  lambda partials reduced BEFORE the Poisson log nonlinearity (the
  sequence-parallel analog, SURVEY.md §5.7).

All collective use goes through ``collectives.py`` so tests exercise the
identical code on a virtual 8-device CPU mesh.
"""

from celeste_tpu.parallel.mesh import chain_mesh, make_mesh  # noqa: F401
from celeste_tpu.parallel.ensemble import (  # noqa: F401
    shard_chains,
    run_sharded_ensemble,
    run_sharded_chees,
    ensemble_diagnostics,
)
from celeste_tpu.parallel.crowded import (  # noqa: F401
    CrowdedScene,
    crowded_rect_logprior,
    make_crowded_logdensity,
    make_tiled_crowded_logdensity,
    sharded_crowded_loglik,
    sharded_tiled_crowded_loglik,
)
from celeste_tpu.parallel import collectives  # noqa: F401
from celeste_tpu.parallel.pt_sharded import (  # noqa: F401
    sharded_pt_init,
    sharded_pt_kernel,
)
from celeste_tpu.parallel.tiles import build_block_tile_map, build_tile_map  # noqa: F401
