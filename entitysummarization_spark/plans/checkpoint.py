"""Checkpoint / resume for the iterative sampler (north_rule requirement).

The reference's resume story is file-rename markers (`*_done`,
PatternMatchingMachine.java:2570) plus Java-serialized matrices
(EntSumModel.java:598-701). Ours: the sampler's z-state (one row per doc)
is written to a Parquet checkpoint every k sweeps together with a lineage
table; resume reads the latest checkpoint, rebuilds global counts exactly
from the z-state (they are a pure function of it), and continues the
sweep schedule. Because RNG is seeded per (base_seed, sweep, doc),
run(10) and run(5)+checkpoint+resume+run(5) on one partition produce
bit-identical states.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..models.gibbs import DistributedGibbs, GibbsConfig


def save_checkpoint(gibbs: DistributedGibbs, path: str) -> str:
    """Write state + lineage + meta under path/sweep=<n>. Idempotent
    overwrite (re-running a failed save is safe)."""
    sweep = gibbs.sweeps_done
    d = os.path.join(path, f"sweep={sweep:05d}")
    # base columns only: a sweep's delta columns are already aggregated
    # into the driver counts and would only bloat the checkpoint
    gibbs.state.select("doc_id", "words", "zs").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "state"))
    lineage = gibbs.state.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("words")).alias("n_tokens"),
    )
    lineage.write.mode("overwrite").parquet(os.path.join(d, "lineage"))
    meta = {
        "sweeps_done": sweep,
        "n_preds": gibbs.cfg.n_preds,
        "n_words": gibbs.cfg.n_words,
        "alpha": gibbs.cfg.alpha,
        "beta": gibbs.cfg.beta,
        "base_seed": gibbs.cfg.base_seed,
        "n_partitions": gibbs.cfg.n_partitions,
        # recorded for provenance; both kernels are bit-identical so a
        # resume under either continues the same z-chain
        "kernel": gibbs.cfg.kernel,
    }
    tmp = os.path.join(d, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))  # atomic commit marker
    return d


def latest_checkpoint(path: str) -> str | None:
    if not os.path.isdir(path):
        return None
    done = [
        d for d in sorted(os.listdir(path))
        if d.startswith("sweep=")
        and os.path.exists(os.path.join(path, d, "meta.json"))
    ]
    return os.path.join(path, done[-1]) if done else None


def load_checkpoint(
    spark: SparkSession,
    ckpt_dir: str,
    corpus,
    obj_pred,
    lam_df,
    kernel: str | None = None,
) -> DistributedGibbs:
    """Rebuild a DistributedGibbs positioned at the checkpointed sweep.

    ``kernel`` overrides the checkpoint's recorded kernel — every kernel
    is bit-identical, so a chain checkpointed under one may resume under
    another (e.g. native on the cluster, fast on a compiler-less box);
    test_gibbs.py asserts the cross-kernel resume equality."""
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    cfg = GibbsConfig(
        n_preds=meta["n_preds"], n_words=meta["n_words"], alpha=meta["alpha"],
        beta=meta["beta"], base_seed=meta["base_seed"],
        n_partitions=meta["n_partitions"],
        kernel=kernel or meta.get("kernel", "fast"),
    )
    g = DistributedGibbs(spark, corpus, obj_pred, lam_df, cfg)
    state = spark.read.parquet(os.path.join(ckpt_dir, "state"))
    g.state = (
        state.repartition(cfg.n_partitions, "doc_id")
        .sortWithinPartitions("doc_id")
        .persist()
    )
    g.state.count()
    g._refresh_global_counts()
    g.sweeps_done = meta["sweeps_done"]
    return g
