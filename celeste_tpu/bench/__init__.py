"""Benchmark harnesses (SURVEY.md §1.2 ``bench/`` + §4 item 5:
performance-regression gating against recorded numbers)."""

from celeste_tpu.bench.regression import check_regression, RECORDS_PATH  # noqa: F401
