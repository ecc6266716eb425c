"""Run only bench.py's scaling section (north-rule N vs 4N evidence) and
append the result to BENCH_SCALING_CLEAN.json — the clean-window hunt
log. Lets a session retry the scaling measurement opportunistically
without re-running the headline/Gibbs sections each time.

Run: env PYTHONPATH=/root/repo python scripts/run_scaling_only.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    t0 = time.perf_counter()
    hw = bench._hw_ceiling()
    print(f"[scaling-only] pre-run hw ceiling {hw}", file=sys.stderr)
    res = bench.scaling_run(hw)
    res["wall_sec"] = round(time.perf_counter() - t0, 1)
    res["stamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    log = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_CLEAN.json")
    try:
        with open(log) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {"note": "clean-window scaling hunt log"}
    slim = {
        k: v for k, v in res.items()
        if k not in ("pairs", "trials_sec", "map_trials_sec",
                     "hw_ceiling_samples", "method")
    }
    doc.setdefault("round5_runs", []).append(slim)
    with open(log, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(slim))


if __name__ == "__main__":
    main()
