"""MAP fitting for initialization (SURVEY.md C11/§3.3: the reference's
``celeste_em`` computes a MAP/EM fit to seed MCMC).

The rebuild replaces coordinate-wise EM with direct gradient ascent on the
same differentiable log-posterior (SURVEY.md §3.3: "optax/L-BFGS MAP on the
same differentiable loglik — simpler and gradient-native").  Batched over
starts via vmap, so multi-restart initialization is one device call.

Also provides ``detect_peaks``: a cheap matched-filter detection on the
counts image to produce starting positions when no catalog seed exists —
needed because the Poisson likelihood is flat once a source leaves the
stamp (gradients vanish; see tests/test_map_fit.py probes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from celeste_tpu.inference.vg import value_and_grad_of


def map_fit(logdensity_fn, x0, n_steps: int = 300, learning_rate: float = 0.05):
    """Adam ascent on ``logdensity_fn`` from ``x0`` [D].  Returns (x_map,
    logp_trace).  vmap over a [N, D] batch for multi-restart."""

    opt = optax.adam(learning_rate)
    vg = value_and_grad_of(logdensity_fn)

    def step(carry, _):
        x, opt_state = carry
        logp, grad = vg(x)
        updates, opt_state = opt.update(jax.tree_util.tree_map(jnp.negative, grad), opt_state)
        x = optax.apply_updates(x, updates)
        return (x, opt_state), logp

    (x, _), trace = jax.lax.scan(step, (jnp.asarray(x0), opt.init(jnp.asarray(x0))),
                                 None, length=n_steps)
    return x, trace


def map_fit_batch(logdensity_fn, x0_batch, n_steps: int = 300, learning_rate: float = 0.05):
    """Multi-restart MAP: [N, D] starts -> best [D] point by final logp."""
    xs, traces = jax.vmap(lambda x: map_fit(logdensity_fn, x, n_steps, learning_rate))(x0_batch)
    final = jax.vmap(logdensity_fn)(xs)
    best = jnp.argmax(final)
    return xs[best], final[best], xs, final


def detect_peaks(stamp, n_peaks: int = 4, min_separation: int | None = None):
    """Host-side matched-filter peak detection on a Stamp's counts (the
    detection step the reference outsources to the SDSS photoObj catalog).

    Proper matched-filter SNR: numerator = k * (counts - sky) (Gaussian k
    at the PSF core width), variance = (k^2) * var with var = counts-noise
    variance ~ max(sky, counts).  Peaks greedily selected with an exclusion
    radius defaulting to ~3 sigma of the smoothing kernel.  Returns
    ([n_peaks, 2] pixel (x, y), SNR per peak).  NumPy; runs once per stamp.
    """
    counts = np.asarray(stamp.counts, np.float64)
    sky = np.asarray(stamp.sky, np.float64)
    resid = counts - sky
    # Poisson variance ~ the larger of sky and observed counts: using sky
    # alone would overstate SNR by ~sqrt(counts/sky) on and around bright
    # sources (phantom detections in the CLEAN residual loop)
    var = np.maximum(np.maximum(sky, counts), 1.0)
    var0 = float(np.asarray(stamp.psf.cov)[0, 0, 0])
    sig = max(np.sqrt(var0), 0.8)
    if min_separation is None:
        min_separation = max(3, int(round(3 * sig)))
    r = int(3 * sig) + 1
    xk = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (xk / sig) ** 2)
    k /= k.sum()

    def sep_conv(img, kern):
        out = np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 0, img)
        return np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 1, out)

    num = sep_conv(resid, k)
    den = np.sqrt(np.maximum(sep_conv(var, k * k), 1e-9))
    snr = num / den

    peaks, snrs = [], []
    work = snr.copy()
    h, w = work.shape
    for _ in range(n_peaks):
        ij = np.unravel_index(np.argmax(work), work.shape)
        if not np.isfinite(work[ij]):
            break
        peaks.append((float(ij[1]), float(ij[0])))  # (x, y)
        snrs.append(float(work[ij]))
        y0, y1 = max(0, ij[0] - min_separation), min(h, ij[0] + min_separation + 1)
        x0, x1 = max(0, ij[1] - min_separation), min(w, ij[1] + min_separation + 1)
        work[y0:y1, x0:x1] = -np.inf
    return np.asarray(peaks), np.asarray(snrs)
