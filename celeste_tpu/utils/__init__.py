"""Auxiliary subsystems (SURVEY.md §5): checkpointing, structured metrics,
profiling, and numerical guards."""

from celeste_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from celeste_tpu.utils.metrics import MetricsLogger, device_log  # noqa: F401
from celeste_tpu.utils.profiling import trace_context, timed  # noqa: F401
from celeste_tpu.utils.guards import checked_logdensity  # noqa: F401
