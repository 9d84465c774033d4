"""Real-TPU config-5 shootout: whitened NUTS vs whitened ChEES at bench
scale (1024 chains).  Run with the default axon env (TPU):

    python scripts/tpu_chees_run.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from celeste_tpu.bench.config5 import (  # noqa: E402
    build_config5, config5_warmup_and_whiten, measure_chees_z, measure_nuts_z,
)


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    logd, logd_dense, vec, _ = build_config5()
    prep = config5_warmup_and_whiten(logd, vec, n_chains=1024, n_warmup=150,
                                     warmup_window=50)
    nuts = measure_nuts_z(prep, n_steps=96, run_segment=16)
    chees = measure_chees_z(prep)
    print("RESULT nuts_min_ess_per_sec", nuts[0])
    print("RESULT chees_min_ess_per_sec", chees[0])


if __name__ == "__main__":
    main()
