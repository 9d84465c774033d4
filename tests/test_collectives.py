"""Collectives layer on the virtual 8-device mesh (SURVEY.md §5.8) +
cross-device tempering exchange pattern + tiled crowded logdensity."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from celeste_tpu.parallel import chain_mesh, collectives

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), axis_names=("t",))


def test_all_reduce_and_mean():
    mesh = _mesh()

    @functools.partial(shard_map, mesh=mesh, in_specs=P("t"), out_specs=P("t"))
    def f(x):
        s = collectives.all_reduce_sum(jnp.sum(x), "t")
        m = collectives.all_mean(jnp.sum(x), "t")
        return (s + 0 * m) * jnp.ones_like(x)

    x = jnp.arange(8.0)
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, np.full(8, 28.0))


def test_ring_shift():
    mesh = _mesh()

    @functools.partial(shard_map, mesh=mesh, in_specs=P("t"), out_specs=P("t"))
    def f(x):
        return collectives.ring_shift(x, "t", shift=1)

    x = jnp.arange(8.0)
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, np.roll(np.arange(8.0), 1))


def test_neighbor_exchange():
    mesh = _mesh()

    @functools.partial(shard_map, mesh=mesh, in_specs=P("t"), out_specs=P("t"))
    def f(x):
        return collectives.neighbor_exchange(x, "t")

    x = jnp.arange(8.0)
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, [1, 0, 3, 2, 5, 4, 7, 6])


def test_cross_device_tempering_swap():
    """The tempering ladder sharded over devices: one even-phase swap sweep
    with the Metropolis exchange criterion, computed redundantly on both
    pair members via neighbor_exchange (deterministic test posterior)."""
    mesh = _mesh()
    betas = jnp.geomspace(1.0, 0.05, 8)
    # a state per temperature; logp(x) = -x^2/2
    xs = jnp.asarray([0.1, 0.4, 0.2, 2.0, 0.3, 1.5, 0.1, 3.0])
    logps = -0.5 * xs * xs

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("t"), P("t"), P("t"), P("t")),
                       out_specs=(P("t"), P("t")))
    def swap(xs, logps, betas, u):
        x_n = collectives.neighbor_exchange(xs, "t")
        lp_n = collectives.neighbor_exchange(logps, "t")
        b_n = collectives.neighbor_exchange(betas, "t")
        # both members compute the same acceptance for their pair
        log_ratio = (betas - b_n) * (lp_n - logps)
        i = collectives.axis_index("t")
        is_lower = (i % 2) == 0
        # pair-consistent uniform: share the lower member's u
        u_shared = jnp.where(is_lower, u, collectives.neighbor_exchange(u, "t"))
        accept = jnp.log(u_shared) < jnp.where(is_lower, log_ratio, -log_ratio) * \
            jnp.where(is_lower, 1.0, -1.0)
        # accept criterion is symmetric: (b_i - b_j)(lp_j - lp_i) for the
        # pair; recompute symmetrically
        lr_pair = jnp.where(is_lower, (betas - b_n) * (lp_n - logps),
                            (b_n - betas) * (logps - lp_n))
        accept = jnp.log(u_shared) < lr_pair
        xs_out = jnp.where(accept, x_n, xs)
        lp_out = jnp.where(accept, lp_n, logps)
        return xs_out, lp_out

    u = jnp.full(8, 0.5)
    xs2, lp2 = swap(xs, logps, betas, u)
    xs2, lp2 = np.asarray(xs2), np.asarray(lp2)
    # pairs either swapped together or not at all
    for i in range(0, 8, 2):
        swapped = xs2[i] == np.asarray(xs)[i + 1]
        if swapped:
            assert xs2[i + 1] == np.asarray(xs)[i]
        else:
            assert xs2[i] == np.asarray(xs)[i] and xs2[i + 1] == np.asarray(xs)[i + 1]
    # logp payload stays consistent with x
    np.testing.assert_allclose(lp2, -0.5 * xs2 * xs2, rtol=1e-6)


def test_tiled_crowded_logdensity_end_to_end():
    """make_tiled_crowded_logdensity: finite, differentiable, and peaked
    near truth on a 48x256 field."""
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.parallel import CrowdedScene, make_tiled_crowded_logdensity

    rng = np.random.default_rng(9)
    cosd = np.cos(np.deg2rad(10.0))
    srcs = []
    for i in range(8):
        px, py = rng.uniform(15, 240), rng.uniform(8, 40)
        de, dn = (px - 127.5) * 0.396, (py - 23.5) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=20 + 4 * i))
    sd = make_synthetic_stamp(srcs, shape=(48, 256), bands=(2,), seed=66)
    scene = CrowdedScene(kinds=("star",) * 8, n_bands=5)
    stamp = sd.stamps[0]
    pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    logd, data = make_tiled_crowded_logdensity(scene, stamp, band=2,
                                               positions_px=pos_px, radii_px=12.0)
    vec = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]), np.log(s["flux"])]) for s in srcs]),
        jnp.float32)
    val, grad = jax.value_and_grad(logd)(vec)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))
    # perturbing one source position lowers the log density
    v2 = vec.at[0].add(1.0)
    assert float(logd(v2)) < float(val)


@pytest.mark.slow
def test_tiled_crowded_multiband():
    """Multi-band tiled joint logdensity: finite, differentiable, and equal
    to the sum of per-band single-band versions."""
    from celeste_tpu.data.synthetic import make_synthetic_stamp, star_source
    from celeste_tpu.parallel import CrowdedScene, make_tiled_crowded_logdensity

    rng = np.random.default_rng(13)
    cosd = np.cos(np.deg2rad(10.0))
    srcs = []
    for i in range(5):
        px, py = rng.uniform(12, 240), rng.uniform(8, 40)
        de, dn = (px - 127.5) * 0.396, (py - 23.5) * 0.396
        srcs.append(star_source(u=(30 + de / 3600 / cosd, 10 + dn / 3600),
                                flux_r=22 + 4 * i))
    sd = make_synthetic_stamp(srcs, shape=(48, 256), bands=(1, 2, 3), seed=67)
    scene = CrowdedScene(kinds=("star",) * 5, n_bands=3)
    st0 = sd.stamps[0]
    pos = np.stack([np.asarray(st0.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    logd_mb, _ = make_tiled_crowded_logdensity(
        scene, list(sd.stamps), band=[0, 1, 2], positions_px=pos, radii_px=12.0)
    vec = jnp.asarray(np.concatenate(
        [np.concatenate([sd.wcs.equa2duas(s["u"]),
                         np.log([s["flux"][b] for b in (1, 2, 3)])]) for s in srcs]),
        jnp.float32)
    val, grad = jax.value_and_grad(logd_mb)(vec)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))
    # equals sum of single-band likelihood parts + one prior set: compute
    # per-band logdensities and correct for the double-counted priors
    vals = []
    for k in range(3):
        logd_k, _ = make_tiled_crowded_logdensity(
            scene, sd.stamps[k], band=k, positions_px=pos, radii_px=12.0)
        vals.append(float(logd_k(vec)))
    from celeste_tpu.model.priors import SourcePriors
    from celeste_tpu.model.params import StarParams
    pri = SourcePriors()
    prior_total = sum(
        float(pri.star_logpdf(p)) + float(StarParams.log_det_jacobian(
            vec[off:off + d], 3))
        for (off, d, kind), p in zip(scene.block_slices()[0], scene.unpack(vec)))
    want = sum(vals) - 2 * prior_total
    assert abs(float(val) - want) < 2.0, (float(val), want)


@pytest.mark.slow
def test_sharded_pt_kernel_matches_in_device_ladder():
    """VERDICT r1 #9: the ladder sharded over a mesh axis is numerically the
    SAME Markov chain as the in-device vmapped ladder — identical key
    layout, moves, swap decisions, and states, step for step."""
    import functools

    from celeste_tpu.inference.tempering import (
        geometric_ladder, mh_at_beta, pt_init, pt_kernel,
    )
    from celeste_tpu.parallel import make_mesh, sharded_pt_init, sharded_pt_kernel

    # bimodal 2-D target: tempering actually matters
    def logd(x):
        a = -0.5 * jnp.sum((x - 2.0) ** 2) / 0.3
        b = -0.5 * jnp.sum((x + 2.0) ** 2) / 0.3
        return jnp.logaddexp(a, b)

    t, d = 8, 2
    betas = geometric_ladder(t, beta_min=0.05)
    inner = mh_at_beta(logd, step_scales=jnp.full(d, 0.4))
    xs0 = jax.random.normal(jax.random.key(0), (t, d))

    kern_ref = pt_kernel(logd, inner, betas)
    s_ref = pt_init(xs0, logd)

    mesh = make_mesh({"temps": 4})
    kern_sh = sharded_pt_kernel(logd, inner, betas, mesh, axis_name="temps")
    s_sh = sharded_pt_init(xs0, logd)

    # ONE jitted scan per path (VERDICT r4 Next #3: the eager host loop
    # dispatched 80 sharded programs at ~8 s each on the CPU mesh — 330+ s
    # of wall for the identical gate; the scan keeps all 40 steps and every
    # per-step swap decision)
    keys = jax.random.split(jax.random.key(7), 40)

    def run(kern, s0):
        def body(s, k):
            s, info = kern(k, s)
            return s, info.swap_accept
        return jax.lax.scan(body, s0, keys)

    with mesh:
        s_ref, acc_ref = jax.jit(lambda s: run(kern_ref, s))(s_ref)
        jax.block_until_ready(s_ref.xs)
        s_sh, acc_sh = jax.jit(lambda s: run(kern_sh, s))(s_sh)
        jax.block_until_ready(s_sh.xs)
    np.testing.assert_allclose(np.asarray(s_sh.xs), np.asarray(s_ref.xs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sh.logps), np.asarray(s_ref.logps),
                               rtol=1e-4, atol=1e-4)
    # every step's swap decisions, both parities, bitwise equal
    np.testing.assert_array_equal(np.asarray(acc_sh), np.asarray(acc_ref))
    # swaps actually happened across the run (the pattern is exercised)
    assert np.asarray(acc_ref).any()


def test_run_photo_z_sharded_recovers_z():
    """The sharded-ladder photo-z variant produces a usable posterior on the
    virtual mesh (end-to-end wiring, not just the kernel)."""
    from celeste_tpu.parallel import make_mesh
    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photo_z import PhotoZConfig, run_photo_z_sharded
    from celeste_tpu.quasar.photometry import project_to_bands

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    z_true = 2.4
    w_true = jnp.ones(basis.n_basis) / basis.n_basis
    flux = project_to_bands(basis, filters, w_true, 1.0, z_true)
    err = 0.02 * jnp.abs(flux) + 1e-4
    cfg = PhotoZConfig(n_temps=8, n_steps=300, n_warmup=100, n_systems=1,
                       inner="slice")
    mesh = make_mesh({"temps": 4})
    out = run_photo_z_sharded(jax.random.key(5), basis, filters, flux, err,
                              mesh, cfg)
    z = np.asarray(out["z"]).ravel()
    assert np.isfinite(z).all()
    assert float(out["swap_rate"]) > 0.05
    # the cold chain finds the true-z mode region
    assert abs(np.median(z) - z_true) < 0.6, np.median(z)


def test_run_photo_z_sharded_hmc_adaptive_matches_in_device():
    """VERDICT r2 Weak #4 / Next #9: the sharded ladder accepts the
    ``hmc_adaptive`` inner (per-replica warmed step sizes threaded through
    ``sharded_pt_kernel``) and stays numerically the same chain as the
    in-device adaptive ladder."""
    from celeste_tpu.parallel import make_mesh
    from celeste_tpu.quasar.basis import QuasarBasis
    from celeste_tpu.quasar.filters import sdss_like_filterbank
    from celeste_tpu.quasar.photo_z import (
        PhotoZConfig, run_photo_z, run_photo_z_sharded,
    )
    from celeste_tpu.quasar.photometry import project_to_bands

    basis = QuasarBasis.default()
    filters = sdss_like_filterbank(n_pts=64)
    w_true = jnp.ones(basis.n_basis) / basis.n_basis
    flux = project_to_bands(basis, filters, w_true, 1.0, 2.0)
    err = 0.02 * jnp.abs(flux) + 1e-4
    # flux_grid_n=0: this test pins the SHARDED-PT MACHINERY (warmed step
    # sizes threaded through sharded_pt_kernel) as the same chain, which
    # needs a logdensity that lowers identically under vmap and shard_map.
    # The grid-table projection's gather+einsum reduction differs between
    # the two contexts at ~1e-7 — correct (both are valid fp summation
    # orders) but trajectory chaos amplifies it past any fixed tolerance
    # within ~20 steps (measured: 7e-5 at the first kept step, a flipped
    # swap by step 15).  The grid path on the sharded ladder is covered
    # functionally by test_run_photo_z_sharded_recovers_z.
    cfg = PhotoZConfig(n_temps=4, n_steps=25, n_warmup=5, n_systems=1,
                       inner="hmc_adaptive", pt_warmup_steps=15,
                       flux_grid_n=0)
    mesh = make_mesh({"temps": 4})
    r_in = run_photo_z(jax.random.key(7), basis, filters, flux, err, cfg)
    r_sh = run_photo_z_sharded(jax.random.key(7), basis, filters, flux, err,
                               mesh, cfg)
    np.testing.assert_allclose(np.asarray(r_sh["vec"]),
                               np.asarray(r_in["vec"]), rtol=2e-4, atol=2e-5)
