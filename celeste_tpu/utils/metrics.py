"""Structured metrics / observability (SURVEY.md §5.5).

The reference logged with print statements and matplotlib; the rebuild
emits machine-readable JSONL: one object per window with step counter,
acceptance statistics, step sizes, R-hat/ESS, log-likelihood quantiles.
On-device code reports through ``device_log`` (a ``jax.debug.callback``
wrapper invoked at low frequency, e.g. every adaptation window) so the hot
loop stays jitted; host code uses ``MetricsLogger`` directly.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics stream (file or stderr)."""

    def __init__(self, path: str | None = None, stream=None):
        self._fh = open(path, "a") if path else (stream or sys.stderr)
        self._owns = path is not None
        self._t0 = time.time()

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.time() - self._t0, 3)}
        for k, v in fields.items():
            if isinstance(v, (np.ndarray, jax.Array)):
                v = np.asarray(v)
                v = v.item() if v.ndim == 0 else np.round(v, 6).tolist()
            rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        if self._owns:
            self._fh.close()


_DEFAULT_LOGGER: MetricsLogger | None = None


def get_logger() -> MetricsLogger:
    global _DEFAULT_LOGGER
    if _DEFAULT_LOGGER is None:
        _DEFAULT_LOGGER = MetricsLogger()
    return _DEFAULT_LOGGER


def device_log(event: str, **traced_fields):
    """Emit a metrics record from inside jitted code.  Fields are traced
    arrays; the callback fires on the host without blocking the device
    stream.  Use sparingly (per adaptation window, not per step)."""

    def _emit(**vals):
        get_logger().log(event, **{k: np.asarray(v) for k, v in vals.items()})

    jax.debug.callback(_emit, **traced_fields)
