"""Pure-NumPy golden-model oracle (SURVEY.md §4 item 1).

An independent, deliberately simple reimplementation of the reference's
forward model and samplers (C1-C11), written directly from the papers' math
with explicit loops — no JAX, no vectorization cleverness.  Every JAX/Pallas
path is unit-tested against this module; it also provides the measured CPU
baseline numbers standing in for the unreadable reference
(``BASELINE.md``).
"""

from celeste_tpu.oracle.forward import (  # noqa: F401
    oracle_star_lambda,
    oracle_galaxy_lambda,
    oracle_poisson_loglik,
)
from celeste_tpu.oracle.samplers import oracle_mh, oracle_slice_sample  # noqa: F401
