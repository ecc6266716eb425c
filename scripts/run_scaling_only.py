"""Run only bench.py's scaling section (north-rule N vs 4N evidence) and
append the result to BENCH_SCALING_CLEAN.json — the clean-window hunt
log. Lets a session retry the scaling measurement opportunistically
without re-running the headline/Gibbs sections each time.

Run: env PYTHONPATH=/root/repo python scripts/run_scaling_only.py

Optional gate: SCALING_MIN_PREPROBE=0.93 aborts (exit 3, nothing
logged) when the pre-run hardware-ceiling probe reads below the
threshold — i.e. tenant load is already eating the box at launch.
A watcher loop can then fire this script on every quiet loadavg poll
and only pay the ~30-minute measurement when the window is real:
loadavg is a trailing indicator (runs 9/13/14 fired at loadavg
0.02-0.06 and were still overtaken), while the probe measures the
actual 4-vs-16-core headroom at this instant.
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
    # Max over a few probes, the same max-estimator discipline
    # _ceiling_sample itself uses: the FIRST probe in a fresh process
    # systematically under-reads (measured on an idle, freshly booted
    # box: 0.803/0.811 cold vs 0.92-0.97 on immediate re-probe — cold
    # fork/page-fault cost hits the 16-worker leg 4x harder). Gating on
    # a single cold probe would park forever on a genuinely clean box.
    gate = float(os.environ.get("SCALING_MIN_PREPROBE", "0") or 0)
    hw = 0.0
    for i in range(3):
        hw = max(hw, bench._hw_ceiling())
        print(f"[scaling-only] pre-run hw ceiling probe {i}: {hw}",
              file=sys.stderr)
        if not gate or hw >= gate:
            break
    if hw < gate:
        print(f"[scaling-only] ABORT: pre-probe {hw} < gate {gate} "
              "(window already contended); nothing logged", file=sys.stderr)
        sys.exit(3)
    res = bench.scaling_run(hw)
    res["wall_sec"] = round(time.perf_counter() - t0, 1)
    res["stamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    log = os.environ.get("SCALING_LOG_PATH") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING_CLEAN.json")
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
