"""On-device image-stamp pytree — TPU-side equivalent of the reference's
``FitsImage`` (SURVEY.md C1/C12: loads SDSS frames, exposes photon counts
``nelec``, WCS ra/dec<->pixel, gain/calibration ``iota``, sky ``epsilon``).

Design departures from the reference (deliberate, TPU-first):

1. The reference keeps a full FITS frame object and re-derives per-source
   bounded stamps inside the likelihood loop.  Here a ``Stamp`` is a
   static-shape pytree of device arrays produced once by the ingest layer.
   Static shapes keep XLA happy; bounded-support rendering returns as
   *tiling* in the crowded-field path (``celeste_tpu.parallel``).

2. The reference does WCS math on absolute ra/dec in float64.  fp64 is
   poison on TPU, and absolute equatorial degrees in fp32 quantize source
   positions at the ~0.03 px level (catastrophic cancellation in ``u-u0``).
   So device-side source positions are **arcsecond offsets** from a
   per-scene reference point: the host converts absolute fp64 (ra, dec) to
   ``du = ((ra-ra0)*3600*cos(dec0), (dec-dec0)*3600)`` once (see
   ``HostWcs``), and the stamp stores the fp32 affine
   ``pixel = wcs_p0 + wcs_A @ du`` with ``wcs_A`` in px/arcsec.  fp32
   error on a <1 arcmin offset is ~1e-5 arcsec — far below survey
   astrometric precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from celeste_tpu.mog import MoG2D

ARCSEC_PER_DEG = 3600.0
SDSS_PIXEL_SCALE_ARCSEC = 0.396


@jax.tree_util.register_pytree_node_class
class Stamp:
    """One band's cutout with everything the forward model needs.

    Fields
    ------
    counts : [H, W] float32 — observed photo-electron counts (the reference's
        ``nelec``; Poisson-distributed under the model).
    sky : [H, W] float32 — expected background counts per pixel (the
        reference's ``epsilon``).
    iota : scalar float32 — photo-electrons per nanomaggie (the reference's
        gain/calibration ``kappa``/``iota``).
    mask : [H, W] float32 — 1 for valid pixels, 0 for masked.
    psf : MoG2D — zero-centered PSF mixture in pixel coordinates.
    wcs_A : [2, 2] float32 — d(pixel)/d(arcsec-offset) Jacobian.
    wcs_p0 : [2] float32 — pixel coordinates (x, y) of the scene reference
        point (du = 0).
    band : int32 array — band index (u,g,r,i,z = 0..4); an array child (not
        static aux) so stamps of different bands stack/vmap cleanly.
    """

    def __init__(self, counts, sky, iota, mask, psf: MoG2D, wcs_A, wcs_p0, band=2):
        self.counts = counts
        self.sky = sky
        self.iota = iota
        self.mask = mask
        self.psf = psf
        self.wcs_A = wcs_A
        self.wcs_p0 = wcs_p0
        self.band = band

    def tree_flatten(self):
        children = (self.counts, self.sky, self.iota, self.mask, self.psf,
                    self.wcs_A, self.wcs_p0, self.band)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)

    # ------------------------------------------------------------------
    @property
    def shape(self):
        return self.counts.shape

    def duas2pixel(self, du):
        """arcsec offset from the scene reference -> (x, y) pixel (the
        device-side half of the reference's ``equa2pixel``, C12).

        Written elementwise, NOT with ``@``: on TPU the default matmul
        precision is bf16, which would quantize source positions at the
        ~0.4% level.  Elementwise VPU math stays fp32-exact.
        """
        du = jnp.asarray(du)
        a = self.wcs_A
        x = a[..., 0, 0] * du[..., 0] + a[..., 0, 1] * du[..., 1]
        y = a[..., 1, 0] * du[..., 0] + a[..., 1, 1] * du[..., 1]
        return self.wcs_p0 + jnp.stack([x, y], axis=-1)

    def pixel2duas(self, p):
        a = self.wcs_A
        det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
        d = jnp.asarray(p) - self.wcs_p0
        x = (a[..., 1, 1] * d[..., 0] - a[..., 0, 1] * d[..., 1]) / det
        y = (-a[..., 1, 0] * d[..., 0] + a[..., 0, 0] * d[..., 1]) / det
        return jnp.stack([x, y], axis=-1)

    def pixel_grid(self):
        """Flat pixel-center coordinate arrays (px[PIX], py[PIX]) plus the
        flat counts/sky/mask, in C order.  Pixel centers are at integer
        coordinates (pixel (i, j) covers [i-.5, i+.5) x [j-.5, j+.5))."""
        h, w = self.counts.shape
        py_grid, px_grid = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
        )
        return px_grid.ravel(), py_grid.ravel()

    def sky_jacobian_arcsec(self):
        """d(pixel)/d(arcsec) — maps on-sky galaxy shape covariances into
        pixel coordinates.  Identical to wcs_A under the offset convention."""
        return self.wcs_A


class HostWcs:
    """Host-side (fp64 NumPy) tangent-plane WCS: absolute (ra, dec) degrees
    <-> pixels, and the fp32 offset affine handed to ``Stamp``.  The fp64
    half of the reference's ``equa2pixel``/``pixel2equa`` (C12).

    ``u_ref`` (deg) is the scene reference point; arcsec offsets are
    du = ((ra-ra0) * 3600 * cos(dec0), (dec-dec0) * 3600).
    """

    def __init__(self, pixel_scale_arcsec: float = SDSS_PIXEL_SCALE_ARCSEC,
                 u_ref=(0.0, 0.0), p_ref=(0.0, 0.0), rot_deg: float = 0.0):
        self.u_ref = np.asarray(u_ref, np.float64)
        self.p_ref = np.asarray(p_ref, np.float64)
        self.cosd = np.cos(np.deg2rad(self.u_ref[1]))
        c, s = np.cos(np.deg2rad(rot_deg)), np.sin(np.deg2rad(rot_deg))
        # px per arcsec of (east, north) offset
        self.A_as = np.array([[c, -s], [s, c]], np.float64) / pixel_scale_arcsec

    def equa2duas(self, u):
        u = np.asarray(u, np.float64)
        return np.array([
            (u[..., 0] - self.u_ref[0]) * ARCSEC_PER_DEG * self.cosd,
            (u[..., 1] - self.u_ref[1]) * ARCSEC_PER_DEG,
        ]).T if u.ndim > 1 else np.array([
            (u[0] - self.u_ref[0]) * ARCSEC_PER_DEG * self.cosd,
            (u[1] - self.u_ref[1]) * ARCSEC_PER_DEG,
        ])

    def duas2equa(self, du):
        du = np.asarray(du, np.float64)
        return np.array([
            self.u_ref[0] + du[0] / (ARCSEC_PER_DEG * self.cosd),
            self.u_ref[1] + du[1] / ARCSEC_PER_DEG,
        ])

    def equa2pixel(self, u):
        return self.p_ref + self.A_as @ self.equa2duas(u)

    def pixel2equa(self, p):
        du = np.linalg.solve(self.A_as, np.asarray(p, np.float64) - self.p_ref)
        return self.duas2equa(du)

    def device_affine(self):
        """(wcs_A [2,2] fp32 px/arcsec, wcs_p0 [2] fp32) for ``Stamp``."""
        return (jnp.asarray(self.A_as, jnp.float32), jnp.asarray(self.p_ref, jnp.float32))


def stack_stamps(stamps):
    """Stack a list of same-shape Stamps into one batched Stamp pytree with a
    leading band axis (for ``vmap`` over bands)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stamps)
