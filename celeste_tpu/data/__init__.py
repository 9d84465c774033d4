"""Data layer (SURVEY.md L1/C1/C16): synthetic stamp generation and offline
SDSS FITS ingest.  Everything device-side consumes ``Stamp`` pytrees; all
file I/O stays on the host in this package."""

from celeste_tpu.data.synthetic import make_synthetic_stamp, SyntheticScene  # noqa: F401
