"""Pallas TPU kernels (SURVEY.md §7 M2): the fused render + Poisson
log-likelihood hot path.  The reference's NumPy per-source bounded-stamp
loops (its entire compute budget, SURVEY.md §3.1) map onto ONE kernel here:
a batched mixture-of-Gaussians field evaluation with the Poisson reduction
fused in-register, gridded over the chain axis."""

from celeste_tpu.kernels.mog_field import (  # noqa: F401
    mog_field_loglik,
    mog_field_render,
    stamp_pixel_data,
    batched_stamp_loglik,
)
from celeste_tpu.kernels.mog_field_sep import (  # noqa: F401
    mog_field_loglik_isotropic,
    stamp_pixel_data_2d,
)
