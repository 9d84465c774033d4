"""BASELINE config-5 benchmark scene, shared by bench.py and the TPU
bisect scripts (scripts/tpu_session*.py): 12 overlapping sources (10 stars
+ 2 galaxies), 48x128 field, block-sparse tiled likelihood.

Kept in the package so the driver benchmark and the hardware-debug probes
measure the IDENTICAL program (SURVEY.md §6 north-star; BASELINE.json
configs[4]).
"""

import numpy as np

import jax
import jax.numpy as jnp


def build_config5(n_buckets: int = 2, impl: str = "jnp"):
    """Returns ``(logd_tiled, logd_dense, vec, scene_info)`` where ``vec``
    is the ground-truth unconstrained state ([D] fp32) and ``scene_info``
    carries the pieces probes need (CrowdedScene, stamp, positions)."""
    from celeste_tpu.data.synthetic import (
        galaxy_source, make_synthetic_stamp, star_source,
    )
    from celeste_tpu.parallel import CrowdedScene, make_crowded_logdensity
    from celeste_tpu.parallel.crowded import make_tiled_crowded_logdensity

    rng = np.random.default_rng(11)
    cosd = np.cos(np.deg2rad(10.0))
    h, w = 48, 128
    n_src = 12
    kinds = tuple("galaxy" if i in (3, 8) else "star" for i in range(n_src))
    srcs = []
    # overlapping: 12 sources in a 30x15-arcsec core, mean sep ~3 px
    for i in range(n_src):
        px_, py_ = rng.uniform(34, 94), rng.uniform(12, 36)
        de, dn = (px_ - (w - 1) / 2) * 0.396, (py_ - (h - 1) / 2) * 0.396
        u = (30 + de / 3600 / cosd, 10 + dn / 3600)
        if kinds[i] == "star":
            srcs.append(star_source(u=u, flux_r=20 + 10 * rng.random()))
        else:
            srcs.append(galaxy_source(u=u, flux_r=60.0, sigma=0.8, ab=0.6))
    sd = make_synthetic_stamp(srcs, shape=(h, w), bands=(2,), seed=55)
    cs = CrowdedScene(kinds=kinds, n_bands=1)
    stamp = sd.stamps[0]
    pos_px = np.stack([np.asarray(stamp.duas2pixel(jnp.asarray(
        sd.wcs.equa2duas(s["u"]), jnp.float32))) for s in srcs])
    # per-BLOCK support radii: each galaxy component block truncated at its
    # own scale+amplitude instead of one 14 px halo for all 16 blocks
    # (model.galaxy.block_support_radii; sigma upper bound = 1.5x truth)
    from celeste_tpu.model.galaxy import block_support_radii

    psf_sig = float(np.sqrt(np.max(np.linalg.eigvalsh(
        np.asarray(stamp.psf.cov)))))
    radii = block_support_radii(kinds, psf_sigma_px=psf_sig,
                                gal_sigma_px=1.5 * 0.8 / 0.396)
    # impl="jnp": the sampler vmaps this per-chain logdensity; the tiled
    # jnp path (scan-VJP) batches cleanly under vmap while the pallas path
    # pays a sublane pad per chain (see make_tiled_crowded_logdensity)
    logd, data = make_tiled_crowded_logdensity(cs, stamp, band=0,
                                               positions_px=pos_px,
                                               radii_px=radii,
                                               n_buckets=n_buckets,
                                               impl=impl)
    logd_dense = make_crowded_logdensity(cs, [stamp], bands=[0])

    parts = []
    for s, kind in zip(srcs, kinds):
        du = sd.wcs.equa2duas(s["u"])
        if kind == "star":
            parts.append(np.concatenate([du, [np.log(s["flux"][2])]]))
        else:
            th, ab = s["theta_dev"], s["ab"]
            parts.append(np.concatenate(
                [du, [np.log(s["flux"][2]), np.log(th / (1 - th)),
                      np.log(s["sigma"]), np.log(ab / (1 - ab)), s["phi"]]]))
    vec = jnp.asarray(np.concatenate(parts), jnp.float32)
    info = {"scene": cs, "stamp": stamp, "positions_px": pos_px,
            "tiled_data": data, "wcs": sd.wcs, "sources": srcs}
    return logd, logd_dense, vec, info
