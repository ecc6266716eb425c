"""Bucketed-table materialization: co-bucketed tables must join without
an Exchange (the pay-the-shuffle-once-at-write-time contract of
plans/pipeline.write_bucketed)."""

import pyspark.sql.functions as F
import pytest

from entitysummarization_spark.plans.pipeline import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force a real join strategy so the test proves bucket co-location,
    not broadcast avoidance."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    a = spark.range(0, 500).select(
        F.concat(F.lit("e"), F.col("id") % 50).alias("subj"),
        F.col("id").alias("freq"),
    )
    b = spark.range(0, 200).select(
        F.concat(F.lit("e"), F.col("id") % 50).alias("subj"),
        (F.col("id") * 2).alias("score"),
    )
    try:
        write_bucketed(a, "tb_canon", "subj", 8, path=str(tmp_path / "a"))
        write_bucketed(b, "tb_summ", "subj", 8, path=str(tmp_path / "b"))
        ta, tb = spark.table("tb_canon"), spark.table("tb_summ")
        joined = ta.join(tb, "subj")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"co-bucketed join shuffled:\n{plan}"
        # values identical to the unbucketed join
        assert joined.count() == a.join(b, "subj").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_canon")
        spark.sql("DROP TABLE IF EXISTS tb_summ")


def test_bucketed_agg_reads_preclustered(spark, tmp_path, no_broadcast):
    # aggregation on the bucket key over ONE bucketed table also plans
    # without a shuffle (bucketed scan satisfies the required hash
    # distribution)
    a = spark.range(0, 500).select(
        F.concat(F.lit("e"), F.col("id") % 50).alias("subj"),
        F.col("id").alias("freq"),
    )
    try:
        write_bucketed(a, "tb_agg", "subj", 8, path=str(tmp_path / "agg"))
        agg = spark.table("tb_agg").groupBy("subj").agg(
            F.sum("freq").alias("tot")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed groupBy shuffled:\n{plan}"
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_agg")
