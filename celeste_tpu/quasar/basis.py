"""Quasar rest-frame SED basis (SURVEY.md C13: the reference's
``quasar_fit_basis`` fits a nonnegative K-spectrum basis to BOSS spectra by
MAP optimization with a logistic/softmax reparameterization).

Rebuild: same model —
  f_rest_i(lam) = m_i * sum_b softmax(omega_i)_b B_b(lam),  B_b >= 0 —
optimized with optax Adam on device over {log B, omega_i, log m_i} with a
Gaussian spectro likelihood and a second-difference smoothness prior on
log B.  No BOSS data exists in this environment (SURVEY.md §7 M5), so
``synthetic_quasar_spectra`` fabricates realistic quasar spectra
(power-law continuum + broad emission lines at the classic rest-frame
wavelengths) used for tests and for shipping a default basis artifact; a
real basis .npz drops in via ``QuasarBasis.load``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# classic quasar broad emission lines, rest-frame nm: (center, width, strength)
QUASAR_LINES = [
    (121.6, 1.5, 8.0),    # Ly-alpha
    (154.9, 2.5, 3.0),    # C IV
    (190.9, 3.0, 1.5),    # C III]
    (279.8, 4.0, 1.8),    # Mg II
    (486.1, 5.0, 1.2),    # H-beta
    (500.7, 1.5, 0.8),    # [O III]
    (656.3, 7.0, 2.5),    # H-alpha
]


class QuasarBasis(NamedTuple):
    lam_rest: jnp.ndarray   # [L] rest-frame wavelength grid (nm)
    b: jnp.ndarray          # [K, L] nonnegative basis spectra

    @property
    def n_basis(self):
        return self.b.shape[0]

    @classmethod
    def default(cls):
        """The shipped basis artifact (fit on synthetic spectra by
        scripts; a BOSS-trained .npz drops in via ``load``)."""
        import os

        path = os.path.join(os.path.dirname(__file__), "artifacts",
                            "default_basis.npz")
        return cls.load(path)

    def save(self, path):
        np.savez(path, lam_rest=np.asarray(self.lam_rest), b=np.asarray(self.b))

    @classmethod
    def load(cls, path):
        d = np.load(path)
        return cls(lam_rest=jnp.asarray(d["lam_rest"], jnp.float32),
                   b=jnp.asarray(d["b"], jnp.float32))


def synthetic_template_basis(n_grid: int = 1024, lam_min: float = 80.0,
                             lam_max: float = 1000.0):
    """Ground-truth templates for synthetic experiments: K=4 components =
    {blue continuum, red continuum, strong-line spectrum, weak-line
    spectrum}, unit-normalized.  Returns a QuasarBasis."""
    lam = np.geomspace(lam_min, lam_max, n_grid)

    def lines(strength_scale, width_scale=1.0):
        out = np.zeros_like(lam)
        for c, w, s in QUASAR_LINES:
            out += s * strength_scale * np.exp(-0.5 * ((lam - c) / (w * width_scale)) ** 2)
        return out

    cont_blue = (lam / 250.0) ** (-1.7)
    cont_red = (lam / 250.0) ** (-0.3)
    tpl = np.stack([
        cont_blue,
        cont_red,
        0.15 * cont_blue + lines(1.0) * cont_blue.mean(),
        0.3 * cont_red + lines(0.25, 1.6) * cont_red.mean(),
    ])
    # Lyman break: suppress flux blueward of Ly-alpha (IGM absorption)
    supp = 1.0 / (1.0 + np.exp(-(lam - 115.0) / 3.0))
    tpl = tpl * supp[None, :]
    tpl = tpl / np.trapezoid(tpl, lam, axis=1)[:, None]
    return QuasarBasis(lam_rest=jnp.asarray(lam, jnp.float32),
                       b=jnp.asarray(tpl, jnp.float32))


def synthetic_quasar_spectra(n_spec: int, basis: QuasarBasis | None = None, seed: int = 0,
                             snr: float = 20.0):
    """Draw synthetic rest-frame spectra from random simplex weights over a
    template basis, with Gaussian noise.  Returns (spectra [N, L],
    ivar [N, L], true weights [N, K], true scales [N])."""
    basis = basis or synthetic_template_basis()
    rng = np.random.default_rng(seed)
    k = basis.n_basis
    w = rng.dirichlet(np.full(k, 0.7), size=n_spec)
    m = np.exp(rng.normal(0.0, 0.5, size=n_spec))
    clean = m[:, None] * (w @ np.asarray(basis.b))
    sigma = np.maximum(clean, 1e-12).mean(axis=1, keepdims=True) / snr
    noisy = clean + rng.normal(size=clean.shape) * sigma
    ivar = np.broadcast_to(1.0 / sigma**2, clean.shape)
    return (jnp.asarray(noisy, jnp.float32), jnp.asarray(ivar, jnp.float32),
            jnp.asarray(w, jnp.float32), jnp.asarray(m, jnp.float32))


def fit_basis(spectra, ivar, lam_rest, n_basis: int = 4, n_steps: int = 2000,
              learning_rate: float = 0.02, smoothness: float = 10.0, seed: int = 0):
    """MAP basis fit (the reference's LBFGS objective, run with Adam):

      max over {log B [K,L], omega [N,K], log m [N]} of
        -0.5 sum ivar * (spec - m softmax(omega) exp(log B))^2
        - smoothness * sum (d^2 log B / d index^2)^2

    Returns (QuasarBasis, losses [n_steps])."""
    n, l = spectra.shape
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    mean_spec = jnp.clip(jnp.mean(spectra, axis=0), 1e-8, None)
    params = {
        "log_b": jnp.log(mean_spec)[None, :] + 0.1 * jax.random.normal(k1, (n_basis, l)),
        "omega": 0.1 * jax.random.normal(k2, (n, n_basis)),
        "log_m": jnp.zeros((n,)),
    }

    def loss_fn(p):
        b = jnp.exp(p["log_b"])                      # [K, L] nonneg
        w = jax.nn.softmax(p["omega"], axis=-1)      # [N, K] simplex
        model = jnp.exp(p["log_m"])[:, None] * (w @ b)
        data_term = 0.5 * jnp.sum(ivar * (spectra - model) ** 2)
        d2 = p["log_b"][:, 2:] - 2.0 * p["log_b"][:, 1:-1] + p["log_b"][:, :-2]
        smooth_term = smoothness * jnp.sum(d2 * d2)
        return (data_term + smooth_term) / n

    opt = optax.adam(learning_rate)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None,
                                       length=n_steps)
    b = jnp.exp(params["log_b"])
    # normalize each basis spectrum to unit integral (scale absorbed by m)
    norm = jnp.trapezoid(b, jnp.asarray(lam_rest), axis=1)
    b = b / norm[:, None]
    return QuasarBasis(lam_rest=jnp.asarray(lam_rest, jnp.float32), b=b), losses
