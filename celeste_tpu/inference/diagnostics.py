"""Convergence diagnostics, computable on-device (SURVEY.md §5.5): split-R̂
(Gelman-Rubin), effective sample size via FFT autocorrelation (Geyer initial
positive sequence), and acceptance summaries.  These are the quantities the
north-star ESS/sec metric is built on (BASELINE.md)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_rhat(samples):
    """Split-chain potential scale reduction factor.

    ``samples``: [n_chains, n_steps, ...].  Each chain is split in half,
    doubling the chain count.  Returns R̂ per parameter dimension [...] .
    """
    c, n = samples.shape[0], samples.shape[1]
    half = n // 2
    s = jnp.concatenate([samples[:, :half], samples[:, half:2 * half]], axis=0)
    m = 2 * c
    chain_mean = jnp.mean(s, axis=1)                     # [m, ...]
    chain_var = jnp.var(s, axis=1, ddof=1)               # [m, ...]
    grand_mean = jnp.mean(chain_mean, axis=0)
    b = half * jnp.var(chain_mean, axis=0, ddof=1)       # between
    w = jnp.mean(chain_var, axis=0)                      # within
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / w)


def _autocov_fft(x):
    """Autocovariance of [n] (or batched [..., n]) series via FFT."""
    n = x.shape[-1]
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    nfft = _next_pow2(2 * n)
    f = jnp.fft.rfft(x, n=nfft, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=-1)[..., :n]
    return acov / n


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def ess(samples):
    """Effective sample size combining chains (Vehtari et al. 2021 style:
    multi-chain autocorrelation with Geyer initial monotone sequence,
    simplified to the initial-positive-sequence truncation).

    ``samples``: [n_chains, n_steps] (single scalar parameter) or
    [n_chains, n_steps, D] -> returns scalar or [D].
    """
    if samples.ndim == 2:
        samples = samples[..., None]
    c, n, d = samples.shape
    acov = _autocov_fft(jnp.moveaxis(samples, 1, -1))        # [c, d, n]
    chain_var = acov[..., 0] * n / (n - 1.0)
    w = jnp.mean(chain_var, axis=0)                          # [d]
    mean_acov = jnp.mean(acov, axis=0)                       # [d, n]
    chain_means = jnp.mean(samples, axis=1)                  # [c, d]
    b_over_n = jnp.var(chain_means, axis=0, ddof=1) if c > 1 else jnp.zeros(d)
    var_plus = w * (n - 1.0) / n + b_over_n
    rho = 1.0 - (w - mean_acov.T) / var_plus                 # [n, d]
    # pair sums rho_{2t} + rho_{2t+1}; truncate at first negative pair
    n_pairs = (n - 1) // 2
    pair = rho[1:1 + 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)   # [P, d]
    positive = pair > 0.0
    keep = jnp.cumprod(positive, axis=0).astype(rho.dtype)
    # tau = 1 + 2 sum_{t>=1} rho_t, pairs (rho_1+rho_2), (rho_3+rho_4), ...
    # truncated at the first non-positive pair (initial positive sequence)
    tau = 1.0 + 2.0 * jnp.sum(pair * keep, axis=0)
    out = c * n / jnp.maximum(tau, 1e-3)
    return out[0] if d == 1 else out


def summarize(samples):
    """Per-dimension posterior summary dict for [n_chains, n_steps, D]."""
    flat = samples.reshape(-1, samples.shape[-1])
    return {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "rhat": split_rhat(samples),
        "ess": ess(samples),
    }
