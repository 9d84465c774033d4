"""CLI entry point (SURVEY.md §1.2: ``python -m celeste_tpu.run
config=<name> key=value ...``).  See ``celeste_tpu.experiments`` for the
config registry and override syntax."""

from __future__ import annotations

import copy
import sys

from celeste_tpu.experiments import CONFIGS, parse_overrides, run_experiment


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    name = "star_single"
    for a in argv:
        if a.startswith("config="):
            name = a.split("=", 1)[1]
    if name not in CONFIGS:
        raise SystemExit(f"unknown config {name!r}; available: {sorted(CONFIGS)}")
    cfg = parse_overrides(copy.deepcopy(CONFIGS[name]), argv)
    result = run_experiment(cfg)
    return result


if __name__ == "__main__":
    main()
