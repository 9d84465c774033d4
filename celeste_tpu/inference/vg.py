"""Batch-aware value-and-grad plumbing.

Samplers here are written per-chain and scaled with ``vmap`` (SURVEY.md §7
design stance).  That composition has one measured performance hole: for
likelihoods whose custom VJP is built from ``lax.scan`` over source slots
(the tiled crowded-field path), ``vmap(grad(logd))`` batches each scan
step's dynamic-slice/update into gather/scatter ops — measured 360 ms per
grad batch at B=1024 on v5e vs 51 ms for the SAME gradients computed
batch-natively as one ``jax.vjp`` of the [B]-major program (7x;
scripts/tpu_session5_results.json).

``batch_aware_value_and_grad`` closes the hole without giving up the
per-chain sampler style: it returns a per-chain ``vg(x) -> (logp, grad)``
whose ``custom_vmap`` batch rule routes through the batched program, so
the 7x shows up automatically wherever the sampler is vmapped.

Samplers consume it via ``value_and_grad_of(logdensity_fn)``, which honors
a precomputed ``.value_and_grad`` attribute on the logdensity (attached by
``make_tiled_crowded_logdensity``) and falls back to plain
``jax.value_and_grad`` otherwise.

Caveat: ``custom_vmap`` does not compose with differentiation of the vg
outputs — fine for HMC/NUTS/MAP (gradients are data to them), not for
Hessian-through-the-sampler uses.  ``laplace_evidence`` takes plain
logdensities and is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def batch_aware_value_and_grad(logd_chain, logd_batch):
    """Per-chain ``vg(x [D]) -> (logp, grad [D])`` that computes batched
    calls through ``logd_batch([B, D]) -> [B]`` (one vjp of the batch-major
    program).  ``logd_chain`` is used for the unbatched call.

    Closure handling: ``custom_vmap`` forbids BATCHED closure constants,
    and NUTS wraps its leapfrog in ``lax.cond`` with a per-chain predicate
    — whose batching rule promotes every branch input (including hoisted
    closure consts) to batched.  So the per-chain function is
    ``jax.closure_convert``-ed per input shape: its captured arrays become
    explicit arguments (legal to promote), and the batch rule ignores them
    in favor of ``logd_batch``'s own (always-unbatched) closure."""

    @functools.lru_cache(maxsize=8)
    def _build(shape, dtype):
        x_spec = jax.ShapeDtypeStruct(shape, dtype)
        # hoist ALL array constants to explicit args (jax.closure_convert
        # only hoists tracers; concrete captures — stamp pixels, tile
        # tables, prior constants — stay jaxpr consts, and a batched-pred
        # lax.cond would re-capture them broadcast-batched)
        closed = jax.make_jaxpr(lambda x: jax.value_and_grad(logd_chain)(x))(
            x_spec)
        jaxpr, consts = closed.jaxpr, tuple(closed.consts)

        @custom_vmap
        def vg_conv(x, *cs):
            logp, grad = jax.core.eval_jaxpr(jaxpr, cs, x)
            return logp, grad

        @vg_conv.def_vmap
        def _vg_batched(axis_size, in_batched, x, *cs):  # noqa: ANN001
            # Batched calls compute through logd_batch's OWN closure and
            # ignore *cs.  That is correct when the consts are replicated
            # (incl. lax.cond's batching rule promoting them to broadcast-
            # batched alongside a batched x — indistinguishable here from
            # genuinely batched data, documented limitation).  The case
            # that IS cleanly detectable — consts batched while x is NOT
            # (an outer vmap over per-chain closure data only) — would
            # silently differentiate against the wrong data; fail loudly
            # instead (ADVICE r2).
            if not in_batched[0] and any(in_batched[1:]):
                raise ValueError(
                    "batch_aware_value_and_grad: the logdensity's closure "
                    "constants are vmapped but x is not; gradients would "
                    "be computed against the unbatched closure of "
                    "logd_batch. Pass per-chain data as explicit sampler "
                    "state instead of closing over a batched tracer.")
            if not in_batched[0]:
                # x constant across the batch: one chain's vg (the consts'
                # content is replicated whether or not they were promoted)
                logp, grad = jax.value_and_grad(logd_chain)(x)
                return (logp, grad), (False, False)
            if x.ndim > 2:
                # nested vmap (e.g. chains x temperatures): flatten the
                # leading axes through the batch program and restore
                lead = x.shape[:-1]
                vals, pullback = jax.vjp(logd_batch,
                                         x.reshape(-1, x.shape[-1]))
                (grads,) = pullback(jnp.ones_like(vals))
                return (vals.reshape(lead), grads.reshape(x.shape)), (True, True)
            vals, pullback = jax.vjp(logd_batch, x)
            (grads,) = pullback(jnp.ones_like(vals))
            return (vals, grads), (True, True)

        return vg_conv, consts

    def vg(x):
        x = jnp.asarray(x)
        f, consts = _build(tuple(x.shape), jnp.result_type(x))
        return f(x, *consts)

    return vg


def value_and_grad_of(logdensity_fn):
    """The value-and-grad a sampler should use for ``logdensity_fn``:
    the function's own ``.value_and_grad`` if it carries one (batch-aware),
    else ``jax.value_and_grad``."""
    vg = getattr(logdensity_fn, "value_and_grad", None)
    return vg if vg is not None else jax.value_and_grad(logdensity_fn)
