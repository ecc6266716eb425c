"""W7 PMI topic labeling — closed-form checks (OntLDA.java:177-230 analog)."""

import pytest

from entitysummarization_spark.operators.labeling import pmi_topic_labels


def test_pmi_labels_closed_form(spark):
    topic_word = spark.createDataFrame(
        [(0, "a", 3.0), (0, "b", 1.0)], "topic long, word string, weight double"
    )
    doc_word = spark.createDataFrame(
        [(1, "a"), (2, "a"), (1, "b"), (3, "c"), (4, "c")],
        "doc_id long, word string",
    )
    label_doc = spark.createDataFrame(
        [("L1", 1), ("L1", 2), ("L1", 3), ("L2", 4)],
        "label string, doc_id long",
    )
    rows = pmi_topic_labels(
        topic_word, doc_word, label_doc, n_top_words=2, top_k=5
    ).collect()
    got = {(r["topic"], r["label"]): r for r in rows}
    # N=4; P(a|t)=.75, P(b|t)=.25; df_a=2, df_b=1, df_L1=3
    # score = .75*2*4/(2*3) + .25*1*4/(1*3) = 1 + 1/3
    assert got[(0, "L1")]["score"] == pytest.approx(round(1 + 1 / 3, 6))
    assert got[(0, "L1")]["rnk"] == 1
    # L2 never co-occurs with a topic word → zero terms → no row at all
    assert (0, "L2") not in got


def test_pmi_labels_rank_and_topk(spark):
    # two labels, label Y co-occurs with the heavier word → ranks first
    topic_word = spark.createDataFrame(
        [(0, "w1", 9.0), (0, "w2", 1.0)], "topic long, word string, weight double"
    )
    doc_word = spark.createDataFrame(
        [(1, "w1"), (2, "w2")], "doc_id long, word string"
    )
    label_doc = spark.createDataFrame(
        [("Y", 1), ("X", 2)], "label string, doc_id long"
    )
    rows = sorted(
        pmi_topic_labels(topic_word, doc_word, label_doc, 2, top_k=1).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(rows) == 1 and rows[0]["label"] == "Y"
