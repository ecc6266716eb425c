"""M2 type-gating and the sha256 content invariant."""

import pyspark.sql.functions as F

from entitysummarization_spark.operators.corpus import constrain_by_types
from entitysummarization_spark.plans.pipeline import content_invariant


def test_constrain_by_types_gates_and_falls_back(spark):
    obj_pred = spark.createDataFrame(
        [(0, [0, 1, 2]), (1, [0, 1]), (2, [2])],
        "word_id long, pred_ids array<long>",
    )
    obj_types = spark.createDataFrame(
        [(0, 100), (1, 200)], "word_id long, type_id long"
    )
    pred_range = spark.createDataFrame(
        [(0, 100), (1, 300)], "pred_id long, type_id long"
    )
    got = {
        r["word_id"]: list(r["pred_ids"])
        for r in constrain_by_types(obj_pred, obj_types, pred_range).collect()
    }
    assert got[0] == [0]          # gated: only pred 0's range matches type 100
    assert got[1] == [0, 1]       # type 200 matches nothing → fallback observed
    assert got[2] == [2]          # no type rows → fallback observed


def test_content_invariant_sha256(spark, fixture_small):
    import hashlib

    repos = spark.createDataFrame(fixture_small.repos)
    inv = content_invariant(repos)
    row = inv.orderBy("repo", "path").first()
    src = fixture_small.repos.sort_values(["repo", "path"]).iloc[0]
    expect = hashlib.sha256(src["content"].encode()).hexdigest()
    assert row["content_sha256"] == expect
    assert inv.count() == len(fixture_small.repos)
    # round-trip through the extraction pipeline leaves the scan unchanged
    again = content_invariant(repos)
    assert (
        inv.join(again, ["repo", "path", "commit", "content_sha256"]).count()
        == len(fixture_small.repos)
    )


def test_sources_read_text_dir(spark, tmp_path):
    from entitysummarization_spark.sources.readers import read_table, read_text_dir

    (tmp_path / "a.txt").write_text("alpha doc")
    (tmp_path / "b.txt").write_text("beta doc")
    rows = read_text_dir(spark, str(tmp_path)).collect()
    got = {r["path"].rsplit("/", 1)[-1]: r["content"] for r in rows}
    assert got == {"a.txt": "alpha doc", "b.txt": "beta doc"}
    # read_table re-splits to the session parallelism
    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    df.write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    rt = read_table(spark, str(tmp_path / "t.parquet"))
    assert rt.count() == 100
    assert rt.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
