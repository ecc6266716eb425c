"""Golden classification test for the char-trigram language-ID operator.

The driver oracle (`lang_id_ngram` in __spark_entry__) checks the
*computation* cross-engine on the synthetic corpus; this test checks the
*classifier* on real multilingual sentences — the synthetic documents all
share one vocabulary, so only hand-written text exercises the profiles.
"""

import pyspark.sql.functions as F

from entitysummarization_spark.operators import textstats

GOLDEN = [
    ("en", "The quick brown fox jumped over the lazy dog and kept running "
           "to the edge of the woods."),
    ("de", "Ich habe einen schönen Hund und die Kinder spielen in der "
           "Schule mit einer Übung."),
    ("es", "La casa de mi amigo está cerca de la playa y una canción "
           "sonaba en la radio del pueblo."),
    ("fr", "Le chat est sur le toit et les enfants jouent dans le jardin "
           "avec une balle aux couleurs vives."),
    ("zh", "我们今天去公园散步然后一起吃晚饭再回家休息"),
    ("und", "zzz qqq xyzzy 12345"),
]


def test_golden_sentences(spark):
    df = spark.createDataFrame(
        [(lang, text) for lang, text in GOLDEN], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["lang_pred"], r["n_hits"], r["cjk_ratio"])
        for r in textstats.lang_id_ngram(df).collect()
    }
    for expected, _ in GOLDEN:
        assert out[expected][0] == expected, (expected, out[expected])
    assert out["zh"][2] >= textstats.CJK_RATIO_THRESHOLD
    assert out["und"][1] == 0


def test_empty_and_pad(spark):
    # empty text → 0 hits, und; leading-space pad catches sentence-initial
    # word grams ('Le ...' must still count ' le')
    df = spark.createDataFrame(
        [("empty", ""), ("fr0", "Le jardin est aux enfants")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in textstats.lang_id_ngram(df).collect()}
    assert rows["empty"]["lang_pred"] == "und"
    assert rows["empty"]["cjk_ratio"] == 0.0
    assert rows["fr0"]["lang_pred"] == "fr"


def test_scan_only_plan(spark, sf_dir):
    # one stage, no shuffle: the plan must contain no Exchange
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = textstats.lang_id_ngram(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
