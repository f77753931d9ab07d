"""Standalone no-Spark kernel-ceiling probe — prints ONE JSON line.

Runs tools.run_scaling.kernel_ceiling (the spawn-pinned pure-python
recognition forward pass at 1/4/8/16/32 concurrent processes) and
reports the aggregate crops/s per level plus the derived 4->16 and
8->32 hardware efficiencies. Run this BEFORE any scaling window on a
new/co-tenant host: if the box itself stops delivering cores past ~16
heavy processes (8->32 well under 0.8), the deliverable N -> 4N pair
for the engine measurement is 4->16, and the probe output is the
artifact that says so.

Must be a real script file (multiprocessing 'spawn' re-imports
__main__; running this body via stdin/-c breaks the child bootstrap).

Usage:  python tools/probe_ceiling.py [--seconds 8] [--sweeps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_scaling import kernel_ceiling  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--sweeps", type=int, default=3)
    args = ap.parse_args()

    load_start = os.getloadavg()
    ceil = kernel_ceiling(seconds=args.seconds, sweeps=args.sweeps)
    load_end = os.getloadavg()
    print(
        json.dumps(
            {
                "kernel_ceiling_agg_crops_per_s": {
                    str(k): v for k, v in ceil.items()
                },
                "hw_efficiency_4_to_16": round(ceil[16] / ceil[4] / 4, 3),
                "hw_efficiency_8_to_32": round(ceil[32] / ceil[8] / 4, 3),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
            }
        )
    )


if __name__ == "__main__":
    main()
