#!/usr/bin/env python3
"""Build the per-query quiet-band manifest from one or more quiet bench
legs (r12 VERDICT task 1).

Usage: make_quiet_band.py LEG.json [LEG.json ...] > tools/quiet_band.json

Each input is a Bench JSON line (BENCH_FULL.json / BENCH_LAST.json).
The manifest records, per query, the MIN across the given legs — the
best evidence of what the plan costs on this box when the hypervisor
is not stealing cycles — plus each leg's calibration preamble so a
future reader can judge how quiet "quiet" was. classify_bench.py
consumes this to label driver-leg spikes weather vs regression.
"""
import json
import sys


def main(paths):
    legs = []
    for p in paths:
        with open(p) as f:
            legs.append(json.load(f))
    band = {}
    for leg in legs:
        for q, rec in leg["queries"].items():
            t = rec["min"] if isinstance(rec, dict) else rec
            if t is None or t < 0:
                continue
            if q not in band or t < band[q]:
                band[q] = t
    out = {
        "n_legs": len(legs),
        "legs": [
            {
                "sf": leg.get("sf"),
                "total": leg.get("value"),
                "n_queries": leg.get("n_queries"),
                "calibration": leg.get("calibration"),
            }
            for leg in legs
        ],
        "band": dict(sorted(band.items())),
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
