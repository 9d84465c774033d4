"""No-U-Turn Sampler, iterative and fixed-shape for TPU (SURVEY.md §7 hard
part 4: "use fixed-shape iterative tree building; do not attempt recursive
NUTS under jit").

Algorithm: multinomial NUTS with biased progressive sampling (Hoffman &
Gelman 2014; Betancourt 2017 §A.3), restructured for XLA:

- the trajectory lives in a ring buffer of 2^max_depth states (time t maps
  to slot t mod 2^max_depth, exact because the trajectory never exceeds
  2^max_depth states) — for the small parameter dimensions of this model
  family (D ~ 7-130) full storage is cheap and removes the recursive
  checkpoint stack entirely;
- each doubling round simulates 2^j leapfrog steps under ``lax.scan`` with
  streaming multinomial proposal selection (Gumbel-free: candidate swap
  with probability w_i / W_sub);
- the balanced-subtree U-turn checks of the recursive algorithm become ONE
  vectorized pass per level: reshape the new subtree's stored states into
  [blocks, blocklen, D] and evaluate the start/end U-turn criterion for all
  blocks at once;
- rounds after termination are masked no-ops (``lax.cond``), keeping every
  chain in lockstep for ``vmap``.

U-turn criterion: the original position-difference form, dot(x+ - x-, v±)<0
with velocity v = M^-1 p, applied at every complete subtree (what the
reference-era samplers would compare against; Stan's rho-based variant can
be swapped in behind the same interface).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from celeste_tpu.inference.hmc import HMCState
from celeste_tpu.inference.vg import value_and_grad_of

_DIVERGENCE_THRESHOLD = 1000.0


class NUTSInfo(NamedTuple):
    logp: jax.Array
    accept_prob: jax.Array     # mean Metropolis stat over generated leaves
    diverged: jax.Array
    tree_depth: jax.Array
    n_leapfrog: jax.Array


def nuts_kernel(logdensity_fn, step_size, inv_mass, max_depth: int = 8):
    """Build a NUTS step over HMCState (x, logp, grad).  ``inv_mass`` is the
    [D] diagonal inverse mass; ``step_size`` scalar (may be a traced value,
    e.g. during dual-averaging warmup)."""
    vg = value_and_grad_of(logdensity_fn)
    inv_mass = jnp.asarray(inv_mass, jnp.float32)
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)
    size = 2 ** max_depth

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p)

    def leapfrog(x, p, grad, eps):
        p_half = p + 0.5 * eps * grad
        x_new = x + eps * inv_mass * p_half
        logp_new, grad_new = vg(x_new)
        p_new = p_half + 0.5 * eps * grad_new
        return x_new, p_new, logp_new, grad_new

    def is_turning(x_minus, x_plus, p_minus, p_plus):
        dx = x_plus - x_minus
        v_minus = inv_mass * p_minus
        v_plus = inv_mass * p_plus
        return jnp.logical_or(jnp.sum(dx * v_minus) < 0.0, jnp.sum(dx * v_plus) < 0.0)

    def step(key, state: HMCState):
        d = state.x.shape[0]
        k_mom, k_loop = jax.random.split(key)
        p0 = sqrt_mass * jax.random.normal(k_mom, state.x.shape, state.x.dtype)
        energy0 = -state.logp + kinetic(p0)

        xs0 = jnp.zeros((size, d), state.x.dtype).at[0].set(state.x)
        ps0 = jnp.zeros((size, d), state.x.dtype).at[0].set(p0)

        # -- one doubling round (closure over energy0) ----------------------
        def _round(c, j):
            length = 2 ** j
            key, k_dir, k_leaf, k_merge = jax.random.split(c["key"], 4)
            go_right = jax.random.bernoulli(k_dir)
            eps = jnp.where(go_right, step_size, -step_size).astype(c["x_left"].dtype)

            x_e = jnp.where(go_right, c["x_right"], c["x_left"])
            p_e = jnp.where(go_right, c["p_right"], c["p_left"])
            g_e = jnp.where(go_right, c["grad_right"], c["grad_left"])

            def leaf(scan_carry, i):
                x_c, p_c, g_c, xs, ps, lsw_sub, xp, lpp, gp, div, sm, nm = scan_carry
                x_n, p_n, logp_n, g_n = leapfrog(x_c, p_c, g_c, eps)
                energy_n = -logp_n + kinetic(p_n)
                log_w = energy0 - energy_n
                log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
                # negated <= so NaN energies (blown-up leapfrog) also count
                # as divergences (NaN > x and NaN <= x are both False)
                div_n = jnp.logical_not(
                    (energy_n - energy0) <= _DIVERGENCE_THRESHOLD)
                t = jnp.where(go_right, c["hi"] + 1 + i, c["lo"] - 1 - i)
                slot = jnp.mod(t, size)
                xs = xs.at[slot].set(x_n)
                ps = ps.at[slot].set(p_n)
                # streaming multinomial candidate within the new subtree
                lsw_new = jnp.logaddexp(lsw_sub, log_w)
                take = jnp.log(jax.random.uniform(jax.random.fold_in(k_leaf, i))) < (
                    log_w - lsw_new
                )
                xp = jnp.where(take, x_n, xp)
                lpp = jnp.where(take, logp_n, lpp)
                gp = jnp.where(take, g_n, gp)
                sm = sm + jnp.minimum(1.0, jnp.exp(log_w))
                nm = nm + 1.0
                return (x_n, p_n, g_n, xs, ps, lsw_new, xp, lpp, gp,
                        jnp.logical_or(div, div_n), sm, nm), None

            init = (x_e, p_e, g_e, c["xs"], c["ps"], jnp.float32(-jnp.inf),
                    c["x_prop"], c["logp_prop"], c["grad_prop"], jnp.bool_(False),
                    c["sum_metro"], c["n_metro"])
            (x_f, p_f, g_f, xs, ps, lsw_sub, xp_sub, lpp_sub, gp_sub, div_sub, sm, nm), _ = (
                jax.lax.scan(leaf, init, jnp.arange(length))
            )

            # vectorized balanced-subtree U-turn checks over the stored leaves
            t0 = jnp.where(go_right, c["hi"] + 1, c["lo"] - length)
            times = t0 + jnp.arange(length)
            slots = jnp.mod(times, size)
            turning_sub = jnp.bool_(False)
            if length >= 2:
                xs_sub = xs[slots]            # [L, D] in ascending-time order
                ps_sub = ps[slots]
                for level in range(1, j + 1):
                    bl = 2 ** level
                    nb = length // bl
                    xb = xs_sub.reshape(nb, bl, -1)
                    pb = ps_sub.reshape(nb, bl, -1)
                    dx = xb[:, -1] - xb[:, 0]
                    vm = inv_mass[None, :] * pb[:, 0]
                    vp = inv_mass[None, :] * pb[:, -1]
                    bad = jnp.logical_or(jnp.sum(dx * vm, -1) < 0.0,
                                         jnp.sum(dx * vp, -1) < 0.0)
                    turning_sub = jnp.logical_or(turning_sub, jnp.any(bad))

            ok = jnp.logical_not(jnp.logical_or(turning_sub, div_sub))

            # merge (biased progressive sampling): proposal <- subtree
            # candidate with prob min(1, W_sub / W_old)
            take_sub = jnp.log(jax.random.uniform(k_merge)) < (lsw_sub - c["log_sum_w"])
            take_sub = jnp.logical_and(take_sub, ok)
            x_prop = jnp.where(take_sub, xp_sub, c["x_prop"])
            logp_prop = jnp.where(take_sub, lpp_sub, c["logp_prop"])
            grad_prop = jnp.where(take_sub, gp_sub, c["grad_prop"])

            lo = jnp.where(jnp.logical_and(ok, jnp.logical_not(go_right)),
                           c["lo"] - length, c["lo"])
            hi = jnp.where(jnp.logical_and(ok, go_right), c["hi"] + length, c["hi"])
            keep_left = jnp.logical_or(go_right, jnp.logical_not(ok))
            keep_right = jnp.logical_or(jnp.logical_not(go_right), jnp.logical_not(ok))
            x_left = jnp.where(keep_left, c["x_left"], x_f)
            p_left = jnp.where(keep_left, c["p_left"], p_f)
            g_left = jnp.where(keep_left, c["grad_left"], g_f)
            x_right = jnp.where(keep_right, c["x_right"], x_f)
            p_right = jnp.where(keep_right, c["p_right"], p_f)
            g_right = jnp.where(keep_right, c["grad_right"], g_f)

            turning_full = is_turning(x_left, x_right, p_left, p_right)
            done = jnp.logical_or(jnp.logical_not(ok), turning_full)

            return dict(
                xs=xs, ps=ps, lo=lo, hi=hi,
                x_left=x_left, p_left=p_left, grad_left=g_left,
                x_right=x_right, p_right=p_right, grad_right=g_right,
                x_prop=x_prop, logp_prop=logp_prop, grad_prop=grad_prop,
                log_sum_w=jnp.where(ok, jnp.logaddexp(c["log_sum_w"], lsw_sub),
                                    c["log_sum_w"]),
                done=done, diverged=jnp.logical_or(c["diverged"], div_sub),
                sum_metro=sm, n_metro=nm,
                depth=jnp.where(ok, c["depth"] + 1, c["depth"]),
                n_leapfrog=c["n_leapfrog"] + length,
                key=key,
            )

        carry = dict(
            xs=xs0, ps=ps0,
            lo=jnp.int32(0), hi=jnp.int32(0),
            x_left=state.x, p_left=p0, grad_left=state.grad,
            x_right=state.x, p_right=p0, grad_right=state.grad,
            x_prop=state.x, logp_prop=state.logp, grad_prop=state.grad,
            log_sum_w=jnp.float32(0.0),       # weight of initial state = exp(0)
            done=jnp.bool_(False), diverged=jnp.bool_(False),
            sum_metro=jnp.float32(0.0), n_metro=jnp.float32(0.0),
            depth=jnp.int32(0), n_leapfrog=jnp.int32(0),
            key=k_loop,
        )

        for j in range(max_depth):
            carry = jax.lax.cond(carry["done"], lambda c: c, lambda c: _round(c, j), carry)

        new_state = HMCState(x=carry["x_prop"], logp=carry["logp_prop"],
                             grad=carry["grad_prop"])
        info = NUTSInfo(
            logp=carry["logp_prop"],
            accept_prob=carry["sum_metro"] / jnp.maximum(carry["n_metro"], 1.0),
            diverged=carry["diverged"],
            tree_depth=carry["depth"],
            n_leapfrog=carry["n_leapfrog"],
        )
        return new_state, info

    return step
