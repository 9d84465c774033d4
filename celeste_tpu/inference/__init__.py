"""Inference layer (SURVEY.md L4, C10/C11): MCMC transition kernels and
chain-ensemble runners, all TPU-first.

Design (SURVEY.md §7 stances): every kernel is a pure
``(key, state) -> (state, info)`` function over a flat [D] parameter
vector; ensembles come from ``vmap`` (never Python loops over chains);
time comes from ``lax.scan``; cross-device scaling comes from
``celeste_tpu.parallel`` sharding the chain axis.  The reference's
gradient-free MH/slice kernels are reimplemented (for posterior parity,
C10/C11) alongside the gradient-based HMC/NUTS upgrades the north-star
mandates.
"""

from celeste_tpu.inference.mh import mh_init, mh_kernel  # noqa: F401
from celeste_tpu.inference.slice_ import slice_init, slice_kernel  # noqa: F401
from celeste_tpu.inference.hmc import (  # noqa: F401
    hmc_init,
    hmc_kernel,
    hmc_warmup,
    hmc_warmup_finish,
    hmc_warmup_init,
    hmc_warmup_window,
)
from celeste_tpu.inference.vg import batch_aware_value_and_grad, value_and_grad_of  # noqa: F401
from celeste_tpu.inference.whiten import ensemble_covariance, whiten_logdensity  # noqa: F401
from celeste_tpu.inference.nuts import nuts_kernel  # noqa: F401
from celeste_tpu.inference.chees import (  # noqa: F401
    chees_init,
    chees_warmup,
    chees_warmup_finish,
    chees_warmup_init,
    chees_warmup_window,
    run_chees_ensemble,
)
from celeste_tpu.inference.runner import run_chains, run_chains_ensemble  # noqa: F401
from celeste_tpu.inference.diagnostics import ess, split_rhat, summarize  # noqa: F401
