"""Generative model layer (SURVEY.md L2): pytrees for stamps, sources, PSFs,
galaxy profiles, and the differentiable jnp renderer.

The hot-path fused kernels live in ``celeste_tpu.kernels``; this package
defines the math they implement and the reference (autodiff-default) path.
"""

from celeste_tpu.model.stamp import Stamp, HostWcs  # noqa: F401
from celeste_tpu.model.params import StarParams, GalaxyParams  # noqa: F401
from celeste_tpu.model.render import (  # noqa: F401
    field_mog,
    expected_image,
    star_unit_mog,
    galaxy_unit_mog,
)
