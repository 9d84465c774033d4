"""CPU-scale ChEES-vs-NUTS shootout on the config-5 crowded field.

Wall time on CPU is not the decision metric (the TPU bench is); what IS
hardware-independent is min-ESS per GRADIENT EVALUATION.  Vmapped NUTS at
max_depth=5 pays 31 grads/step for every chain; ChEES pays
mean(round(u*T/eps)) grads/step.  If ChEES's ESS-per-grad beats NUTS's,
it wins on the chip too (both run the identical batch-aware vg path).

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/chees_config5_cpu.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from celeste_tpu.bench.config5 import build_config5
from celeste_tpu.inference import (
    chees_init, chees_warmup, ensemble_covariance, hmc_init,
    hmc_warmup_finish, hmc_warmup_init, hmc_warmup_window, nuts_kernel,
    run_chains_ensemble, run_chees_ensemble, whiten_logdensity,
)
from celeste_tpu.inference.diagnostics import ess

N_CHAINS = 128
N_STEPS = 96


def main():
    logd, logd_dense, vec, _info = build_config5()
    d = int(vec.shape[0])
    x0 = vec[None, :] + 0.01 * jax.random.normal(jax.random.key(1), (N_CHAINS, d))

    # ---- shared: diagonal warmup -> probe -> pooled dense metric (bench flow)
    n_warmup = 150
    chain_keys = jax.random.split(jax.random.key(3), N_CHAINS)
    wkeys = jax.vmap(lambda k: jax.random.split(k, n_warmup))(chain_keys)
    carry = jax.jit(jax.vmap(lambda x: hmc_warmup_init(x, logd)))(x0)
    window = jax.jit(lambda ks, c: jax.vmap(
        lambda k, ci: hmc_warmup_window(k, logd, ci, n_warmup=n_warmup,
                                        n_leapfrog=8))(ks, c))
    t = time.time()
    for off in range(0, n_warmup, 50):
        carry = window(wkeys[:, off:off + 50], carry)
        jax.block_until_ready(carry)
    states, ss, im = jax.jit(jax.vmap(hmc_warmup_finish))(carry)
    step_size = float(jnp.median(ss))
    inv_mass = jnp.mean(im, axis=0)
    print(f"diag warmup: eps={step_size:.4f} ({time.time()-t:.0f}s)")

    kern = nuts_kernel(logd, step_size=step_size, inv_mass=inv_mass, max_depth=6)
    run = jax.jit(lambda k, s: run_chains_ensemble(k, kern, s, n_steps=16))
    s_probe, _, _ = run(jax.random.key(0), states)
    jax.block_until_ready(s_probe)
    m_hat, cov_hat = ensemble_covariance(s_probe, ridge=1e-4)
    logd_z, to_x, to_z = whiten_logdensity(logd, m_hat, cov_hat)
    z0 = to_z(states.x)

    # ---- arm 1: whitened NUTS (the current bench sampler)
    zcarry = jax.jit(jax.vmap(
        lambda z: hmc_warmup_init(z, logd_z, init_step_size=0.3)))(z0)
    n_zwarm = 30
    zkeys = jax.vmap(lambda k: jax.random.split(k, n_zwarm))(
        jax.random.split(jax.random.key(5), N_CHAINS))
    zcarry = jax.jit(lambda ks, c: jax.vmap(
        lambda k, ci: hmc_warmup_window(k, logd_z, ci, n_warmup=n_zwarm,
                                        n_leapfrog=8))(ks, zcarry))(zkeys, zcarry)
    states_z, ss_z, _ = jax.jit(jax.vmap(hmc_warmup_finish))(zcarry)
    step_z = float(jnp.median(ss_z))
    print(f"dense-metric eps={step_z:.3f}")
    kern_z = nuts_kernel(logd_z, step_size=step_z,
                         inv_mass=jnp.ones((d,), jnp.float32), max_depth=5)
    run_z = jax.jit(lambda k, s: run_chains_ensemble(k, kern_z, s, n_steps=N_STEPS))
    t = time.time()
    samples_z, _, info_z = run_z(jax.random.key(2),
                                 jax.jit(jax.vmap(lambda z: hmc_init(z, logd_z)))(to_z(states.x)))
    jax.block_until_ready(samples_z)
    dt_nuts = time.time() - t
    xs = to_x(samples_z)[:, N_STEPS // 4:]
    e = np.asarray(ess(np.asarray(xs)))
    grads_nuts = N_STEPS * (2 ** 5 - 1)   # per chain
    depth = float(jnp.mean(info_z.tree_depth.astype(jnp.float32)))
    print(f"NUTS(z): {dt_nuts:.1f}s  min ESS {e.min():.1f}  "
          f"minESS/grad {e.min()/grads_nuts:.4f}  mean depth {depth:.2f}  "
          f"div {float(jnp.mean(info_z.diverged.astype(jnp.float32))):.4f}")

    # ---- arm 2: whitened ChEES
    t = time.time()
    st_c, eps_c, traj_c = jax.jit(
        lambda k, z: chees_warmup(k, logd_z, z, n_warmup=150,
                                  init_step_size=0.3, max_leapfrog=64)
    )(jax.random.key(7), to_z(states.x))
    eps_cf, traj_cf = float(eps_c), float(traj_c)
    print(f"chees warmup: eps={eps_cf:.3f} traj={traj_cf:.3f} "
          f"({time.time()-t:.0f}s)")
    n_steps_c = N_STEPS * 4   # cheaper steps; use more of them
    t = time.time()
    samples_c, _, info_c = jax.jit(lambda k, s: run_chees_ensemble(
        k, logd_z, s, n_steps=n_steps_c, step_size=eps_cf,
        trajectory_length=traj_cf, max_leapfrog=64))(jax.random.key(8), st_c)
    jax.block_until_ready(samples_c)
    dt_chees = time.time() - t
    xc = to_x(samples_c)[:, n_steps_c // 4:]
    ec = np.asarray(ess(np.asarray(xc)))
    grads_chees = float(jnp.sum(info_c.n_leapfrog))  # shared across chains
    acc = float(jnp.mean(info_c.accept_rate))
    print(f"ChEES(z): {dt_chees:.1f}s  min ESS {ec.min():.1f}  "
          f"minESS/grad {ec.min()/grads_chees:.4f}  accept {acc:.3f}  "
          f"mean n_leap {grads_chees/n_steps_c:.1f}")
    print(f"RATIO minESS/grad chees/nuts: "
          f"{(ec.min()/grads_chees)/(e.min()/grads_nuts):.2f}")


if __name__ == "__main__":
    main()
