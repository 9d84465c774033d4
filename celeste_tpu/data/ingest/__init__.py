"""Offline host-side ingest (SURVEY.md C1/C12/C16): FITS parsing, SDSS
frame -> photon-count stamps, PSF fitting.  Pure NumPy; no astropy/fitsio
dependency (none exists in this image) — ``fits_lite`` implements the
subset of FITS needed for SDSS frame files, tested by round-trip against
its own writer."""

from celeste_tpu.data.ingest.fits_lite import read_fits, write_fits_image, write_fits_table  # noqa: F401
from celeste_tpu.data.ingest.sdss import frame_to_stamp, TanWcs  # noqa: F401
