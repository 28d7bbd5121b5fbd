"""Host-phase probe: measure the box's CURRENT mem/alu scaling ceilings.

The sandbox host's effective CPU speed and DRAM-bandwidth scaling drift
widely between runs (recorded range for the 4→16-cpu mem ceiling:
0.43–0.84); scaling measurements are only meaningful against adjacent
calibrations (BASELINE.md §4).  This probe runs ONLY the calibration
children from bench.py — ~1 minute — so a round can cheaply decide
whether the host is in a phase worth spending a 30-minute scaling run
on.

Usage: python tools/phase_probe.py [lo_cpus hi_cpus]
Prints one JSON line: {"mem_eff": ..., "alu_eff": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"lo_cpus": lo, "hi_cpus": hi}
    for kind in ("mem", "alu"):
        a = bench._calibration_child(kind, lo)
        b = bench._calibration_child(kind, hi)
        out[f"{kind}_lo"] = round(a, 3)
        out[f"{kind}_hi"] = round(b, 3)
        out[f"{kind}_eff"] = round((b / a) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
