"""End-to-end panoptic forecast benchmark with per-stage breakdown.

Thin wrapper over bench.py (which owns the stage definitions): prints
the staged per-stage milliseconds + e2e fps, then the fused single-jit
forecast time. Run:  python scripts/bench_e2e.py [--no-fused]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import measure_fused, measure_tpu_stages  # noqa: E402


def main():
    results = measure_tpu_stages()
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))
    if "--no-fused" not in sys.argv:
        fused_ms = measure_fused()
        print(json.dumps({
            "fused_ms": round(fused_ms, 3),
            "fused_fps": round(1000.0 / fused_ms, 3),
        }))


if __name__ == "__main__":
    main()
