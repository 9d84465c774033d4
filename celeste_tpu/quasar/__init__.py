"""Quasar SED photo-z subsystem (SURVEY.md C13-C15; BASELINE config 4).

The reference's ``quasar_fit_basis`` / ``quasar_infer_photometry`` pipeline
(Miller et al. NIPS 2015): a nonnegative rest-frame SED basis fitted from
spectra, projection through broadband filter curves, and a parallel-tempered
sampler over the multimodal redshift posterior.  TPU rebuild: the filter
projection is a batched interpolation + small matmul, the basis fit is
optax on device, and the tempering ladder is a vmapped array axis.
"""

from celeste_tpu.quasar.filters import FilterBank, sdss_like_filterbank  # noqa: F401
from celeste_tpu.quasar.basis import (  # noqa: F401
    QuasarBasis,
    fit_basis,
    synthetic_quasar_spectra,
    synthetic_template_basis,
)
from celeste_tpu.quasar.photometry import (  # noqa: F401
    BandMatrixGrid,
    band_matrix_grid,
    project_to_bands,
    project_to_bands_grid,
)
from celeste_tpu.quasar.photo_z import (  # noqa: F401
    make_photo_z_logdensity,
    run_photo_z,
    run_photo_z_batch,
    run_photo_z_batch_segmented,
    run_photo_z_sharded,
    PhotoZConfig,
)
