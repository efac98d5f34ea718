"""End-to-end panoptic forecast benchmark with per-stage breakdown.

Thin wrapper over bench.measure_tpu_stages (the repo-root bench.py owns
the stage definitions); prints the per-stage milliseconds and e2e fps.
Run:  python scripts/bench_e2e.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import measure_tpu_stages  # noqa: E402


def main():
    results = measure_tpu_stages()
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
