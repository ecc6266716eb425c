"""Idle-window watcher for the scaling hunt.

Polls /proc/loadavg; when the 1-minute load has been below LOAD_BAR for
two consecutive polls and no test/bench/Spark work is running, fires
scripts/run_scaling_only.py with SCALING_MIN_PREPROBE so a contended
launch instant is abandoned after the ~1-minute pre-probe instead of
wasting the full ~30-minute measurement (loadavg is a trailing
indicator: runs 9/13/14 fired at loadavg 0.02-0.06 and were still
overtaken — the probe measures actual 4-vs-16-core headroom NOW).

Run:  env PYTHONPATH=/root/repo nohup python scripts/watch_scaling.py &
Env:  SCALING_WATCH_DEADLINE_S (default 14400), SCALING_WATCH_MAX_RUNS
      (default 2, completed runs), SCALING_MIN_PREPROBE (default 0.93),
      SCALING_WATCH_LOAD_BAR (default 0.5).

pgrep patterns are written so they cannot match this watcher's own
command line or its shell wrapper (see BENCH.md's methodology notes).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def busy() -> str | None:
    """Something that must not overlap a measurement is running."""
    # Bracketed first letters so the pattern never matches its own
    # wrapper's echo of this source.
    for pat, what in ((r"[p]ytest", "pytest"),
                      (r"[b]ench\.py", "bench"),
                      (r"[r]un_scaling_only", "scaling-run")):
        r = subprocess.run(["pgrep", "-f", pat], capture_output=True)
        if r.returncode == 0:
            return what
    return None


def main() -> None:
    deadline = time.time() + float(
        os.environ.get("SCALING_WATCH_DEADLINE_S", "14400"))
    max_runs = int(os.environ.get("SCALING_WATCH_MAX_RUNS", "2"))
    bar = float(os.environ.get("SCALING_WATCH_LOAD_BAR", "0.5"))
    gate = os.environ.get("SCALING_MIN_PREPROBE", "0.93")
    quiet_polls = 0
    done = 0
    while time.time() < deadline and done < max_runs:
        l1 = load1()
        b = busy()
        if b:
            quiet_polls = 0
            print(f"[watch] {time.strftime('%H:%M:%S')} busy({b}), "
                  f"load {l1}", file=sys.stderr, flush=True)
            time.sleep(120)
            continue
        quiet_polls = quiet_polls + 1 if l1 < bar else 0
        print(f"[watch] {time.strftime('%H:%M:%S')} load {l1} "
              f"quiet_polls {quiet_polls}", file=sys.stderr, flush=True)
        if quiet_polls >= 2:
            quiet_polls = 0
            env = dict(os.environ,
                       PYTHONPATH=REPO, SCALING_MIN_PREPROBE=gate)
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "run_scaling_only.py")],
                env=env)
            if r.returncode == 0:
                done += 1
                print(f"[watch] run completed ({done}/{max_runs})",
                      file=sys.stderr, flush=True)
            elif r.returncode == 3:
                print("[watch] pre-probe gate aborted the launch",
                      file=sys.stderr, flush=True)
            else:
                print(f"[watch] run failed rc={r.returncode}; stopping",
                      file=sys.stderr, flush=True)
                return
        time.sleep(60)
    print(f"[watch] exit: {done} completed run(s)", file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
