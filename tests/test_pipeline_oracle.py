"""Multi-partition pipeline bit-parity vs the independent pandas/NumPy
oracle (models/pipeline_oracle.py) — the hard signal behind the
kg_pipeline_summaries golden-VALUES oracle.

Round 2 gated multi-partition runs only by NDCG (rank quality above a
calibrated noise floor); with Spark's murmur3 doc→partition assignment
replicated in pure Python (functions/murmur3.py), the 4-partition AD-LDA
run is now checkable BIT-FOR-BIT against a single-process implementation.
"""

import numpy as np
import pyspark.sql.functions as F

from entitysummarization_spark.fixtures import make_fixture
from entitysummarization_spark.functions.murmur3 import (
    hash_long,
    partition_of_long,
)
from entitysummarization_spark.models.pipeline_oracle import (
    java_round,
    pipeline_oracle,
)
from entitysummarization_spark.plans.pipeline import run_pipeline


def test_murmur3_matches_spark_hash_and_partitioning(spark):
    vals = list(range(-3, 97)) + [2**40 + 5, -(2**40), 2**62, -1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for r in df.select("v", F.hash("v").alias("h")).collect():
        assert r.h == hash_long(r.v), r.v
    got = df.repartition(5, "v").select(
        "v", F.spark_partition_id().alias("pid")
    ).collect()
    for r in got:
        assert r.pid == partition_of_long(r.v, 5), r.v


def test_java_round_half_up_vs_spark(spark):
    # half-way cases where banker's rounding (np.round) diverges
    xs = [0.00005, 0.00015, 0.123450001, 0.12345, 2.5e-4, 0.99995]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select("x", F.round("x", 4).alias("r")).collect()
    for r in rows:
        assert r.r == java_round(r.x, 4), (r.x, r.r, java_round(r.x, 4))
    assert java_round(0.00005, 4) == 0.0001  # np.round would give 0.0


def test_pipeline_4_partitions_bit_identical_to_oracle(spark):
    fx = make_fixture(n_files=40, seed=42)
    res = run_pipeline(
        spark, spark.createDataFrame(fx.repos), vocab=fx.vocab,
        n_sweeps=2, k=3, n_partitions=4,
    )
    po = pipeline_oracle(n_files=40, seed=42, n_sweeps=2, k=3, n_partitions=4)

    # z-state parity: every token's predicate assignment identical
    z_spark = res.gibbs.z_state()
    assert set(z_spark) == set(po["z"])
    for d in z_spark:
        assert np.array_equal(z_spark[d], po["z"][d]), d

    # end-to-end summary parity, floats bit-equal
    got = (
        res.summaries.toPandas()
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    exp = po["summaries"].sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    got_t = [tuple(r) for r in got[list(exp.columns)].itertuples(index=False)]
    exp_t = [tuple(r) for r in exp.itertuples(index=False)]
    assert got_t == exp_t
