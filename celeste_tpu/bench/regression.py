"""Performance-regression gate (SURVEY.md §4 item 5: "bench/ asserts
evals/sec/chip doesn't regress >10% vs recorded numbers").

``bench_records.json`` at the repo root holds the best measured numbers per
(metric, backend).  ``check_regression`` compares a fresh measurement and
fails loudly on >tolerance regression; run ``python -m
celeste_tpu.bench.regression`` after ``bench.py`` on hardware to gate, or
pass ``update=True`` to record an improvement.
"""

from __future__ import annotations

import json
import os

RECORDS_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "bench_records.json")


def _load():
    if not os.path.exists(RECORDS_PATH):
        return {}
    with open(RECORDS_PATH) as fh:
        return json.load(fh)


def check_regression(metric: str, value: float, backend: str, tolerance: float = 0.10,
                     update: bool = False):
    """Returns (ok, reference_value).  ``ok`` is False when ``value`` is
    more than ``tolerance`` below the recorded best for this backend."""
    records = _load()
    key = f"{metric}::{backend}"
    ref = records.get(key)
    ok = True
    if ref is not None and value < ref * (1.0 - tolerance):
        ok = False
    if update and (ref is None or value > ref):
        records[key] = value
        with open(RECORDS_PATH, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
    return ok, ref


def main():
    """Gate the current bench.py output against the records."""
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True)
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    ok, ref = check_regression(rec["metric"], rec["value"], rec["backend"],
                               update="--update" in sys.argv)
    print(json.dumps({"ok": ok, "value": rec["value"], "recorded_best": ref}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
