"""Likelihood layer (SURVEY.md L3/C8): per-pixel Poisson log-likelihood."""

from celeste_tpu.likelihood.poisson import (  # noqa: F401
    poisson_loglik,
    stamp_loglik,
    multi_stamp_loglik,
)
