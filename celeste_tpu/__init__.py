"""celeste_tpu — TPU-native Bayesian inference for astronomical survey images.

A from-scratch JAX/Pallas rebuild of the capabilities of HIPS/DESI-MCMC
(the Celeste generative model of Regier et al. ICML 2015 and the quasar
photo-z SED model of Miller et al. NIPS 2015), designed TPU-first:

- mixture-of-Gaussians PSF + galaxy-profile rendering as fused Pallas
  kernels (``celeste_tpu.kernels``),
- per-pixel Poisson log-likelihood as an on-chip reduction,
- gradient-based HMC/NUTS chain ensembles via ``vmap`` + ``lax.scan``
  (``celeste_tpu.inference``),
- multi-chip scaling via ``jax.sharding`` meshes and ICI collectives
  (``celeste_tpu.parallel``).

Provenance note: the read-only reference mount at /root/reference was empty
during both the survey and build sessions (SURVEY.md §0), so no reference
file:line citations are possible; component-level parity targets are cited
as SURVEY.md §2.4 inventory IDs (C1..C18) and the behavioral contract in
BASELINE.json. Correctness is gated on the independent NumPy oracle in
``celeste_tpu.oracle``.
"""

__version__ = "0.1.0"

from celeste_tpu.mog import MoG2D  # noqa: F401
