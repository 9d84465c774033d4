"""Dense-metric (whitened-space) sampling.

HMC/NUTS here carry a DIAGONAL inverse mass — the right default for the
stamp posteriors.  Crowded fields break it: overlapping sources couple
fluxes and positions across sources, the diagonal metric leaves the
posterior strongly anisotropic, dual averaging answers with a tiny step
size, and every NUTS step runs to max depth (measured on BASELINE config
5: step 0.02 at D=44, ~63 grads/step).

The TPU-native cure is a pooled dense metric: with O(1e3) vmapped chains,
the ensemble itself estimates the posterior covariance after a short
diagonal warmup — no long single-chain adaptation windows.  Sampling then
runs in the whitened space x = m + L z (L = chol(cov)), where the
posterior is ~isotropic, the diagonal-metric samplers are optimal, and
nothing inside them changes.

``whiten_logdensity`` wraps a logdensity for z-space, composing with the
batch-aware value-and-grad (inference/vg.py) so the tiled crowded-field
gradients keep their batch-major fast path.  The constant log|det L| is
dropped (samplers only need the density up to a constant).

Matmul note: the 44x44 whitening products run at ``Precision.HIGHEST`` —
TPU default matmul precision is bf16, which costs sub-pixel astrometry
(DESIGN.md §2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celeste_tpu.inference.vg import batch_aware_value_and_grad

_HI = jax.lax.Precision.HIGHEST


def ensemble_covariance(xs, ridge: float = 1e-6):
    """Pooled covariance from ensemble states.

    ``xs``: [n_chains, D] (chain endpoints) or [n_chains, n_steps, D]
    (pooled windows).  Returns (mean [D], cov [D, D]) with a relative ridge
    on the diagonal so the Cholesky below is always defined.
    """
    xs = jnp.asarray(xs)
    flat = xs.reshape(-1, xs.shape[-1]).astype(jnp.float32)
    m = jnp.mean(flat, axis=0)
    c = flat - m[None, :]
    cov = jnp.dot(c.T, c, precision=_HI) / (flat.shape[0] - 1)
    d = jnp.diagonal(cov)
    return m, cov + (ridge * jnp.maximum(jnp.max(d), 1e-20)) * jnp.eye(
        cov.shape[0], dtype=cov.dtype)


def whiten_logdensity(logdensity_fn, mean, cov):
    """Wrap ``logdensity_fn`` for the whitened space x = mean + L @ z.

    Returns ``(logd_z, to_x, to_z)``: the z-space logdensity (carrying a
    batch-aware ``.value_and_grad`` built from the wrapped function's
    ``.batched`` variant when it has one), and the affine maps between the
    spaces (both handle leading batch axes).
    """
    mean = jnp.asarray(mean, jnp.float32)
    cov = jnp.asarray(cov, jnp.float32)
    chol = jnp.linalg.cholesky(cov)
    # precompute L^-1 once (D is small); the per-call maps are then plain
    # matmuls that broadcast over any leading batch axes
    chol_inv = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(chol.shape[0], dtype=chol.dtype), lower=True)

    def to_x(z):
        return mean + jnp.matmul(z, chol.T, precision=_HI)

    def to_z(x):
        diff = jnp.asarray(x, jnp.float32) - mean
        return jnp.matmul(diff, chol_inv.T, precision=_HI)

    def logd_z(z):
        return logdensity_fn(to_x(z))

    batched = getattr(logdensity_fn, "batched", None)
    if batched is not None:
        def logd_z_batch(zs):
            return batched(to_x(zs))
        logd_z.batched = logd_z_batch
        logd_z.value_and_grad = batch_aware_value_and_grad(logd_z, logd_z_batch)
    return logd_z, to_x, to_z


def whitened_chees_run(key, logdensity_fn, probe_samples, states_x,
                       n_warmup: int = 100, n_steps: int = 400,
                       init_step_size: float = 0.3, max_leapfrog: int = 64,
                       ridge: float = 1e-4):
    """The standard dense-metric ChEES recipe, in ONE place (used by the
    bench crowded arm and the pipeline's joint sampler; the config-5 bench
    keeps its own segmented variant in bench/config5.py because its device
    calls must stay under the axon kill budget — constants here and there
    are intentionally the same).

    probe_samples: [B, n, D] samples that pool the dense metric (typically
    a short diagonal-metric NUTS probe).  states_x: [B, D] current chain
    positions.  Returns (samples_x [B, n_steps, D], infos, aux dict with
    eps/traj/to_x/logd_z).
    """
    from celeste_tpu.inference.chees import chees_warmup, run_chees_ensemble

    m_hat, cov_hat = ensemble_covariance(probe_samples, ridge=ridge)
    logd_z, to_x, to_z = whiten_logdensity(logdensity_fn, m_hat, cov_hat)
    k_warm, k_run = jax.random.split(key)
    st, eps, traj = chees_warmup(k_warm, logd_z, to_z(states_x),
                                 n_warmup=n_warmup,
                                 init_step_size=init_step_size,
                                 max_leapfrog=max_leapfrog)
    eps, traj = float(eps), float(traj)
    samples_z, st, infos = run_chees_ensemble(k_run, logd_z, st,
                                              n_steps=n_steps, step_size=eps,
                                              trajectory_length=traj,
                                              max_leapfrog=max_leapfrog)
    aux = {"eps": eps, "traj": traj, "to_x": to_x, "to_z": to_z,
           "logd_z": logd_z, "final_state": st}
    return to_x(samples_z), infos, aux
