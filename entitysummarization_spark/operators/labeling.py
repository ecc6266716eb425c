"""W7/M8 — PMI-based topic labeling (SURVEY §2.5 W7, §2.8 M8).

Re-expresses OntLDA.computeExpectationOfPmiForLabels
(/root/reference/TextProcessing/src/cs/uga/edu/topicmodel/OntLDA.java:177-230):

    score(t, l) = Σ_{w ∈ topWords(t)}  P(w|t) · P(w,l|C) / (P(w|C)·P(l|C))

with P(w|t) = topic-word weight / per-topic normalization constant
(:196-199 via createTopicWordProbabilityMatrix) and the collection
probabilities P(·|C) = Lucene document-frequency counts / |C|
(:197-202). Terms with P(w|t)·P(w,l|C) == 0 contribute nothing (:204-206)
— relationally: only co-occurring (word, label) pairs produce rows. The
top labels per topic come from repeated max extraction (:212-219); we
rank with the deterministic (score desc, label asc) tiebreak instead of
the reference's first-index-wins.

NB the reference calls this "expectation of PMI" but the code computes
the RATIO P(w,l)/(P(w)P(l)) — pointwise lift, no log (:206). We match
the code, not the name.

Spark-first: the Lucene index becomes three doc-frequency aggregations
(df_w restricted to the tiny top-word set, df_l over the label dim,
df_wl from a doc_id equi-join) — no per-document probing, one shuffle
each. The (topic × label) score table is small by construction
(#topics × #labels), so the final per-topic rank window is cheap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pmi_topic_labels(
    topic_word: DataFrame,   # topic, word, weight  (unnormalized P(w|t))
    doc_word: DataFrame,     # doc_id, word         (distinct presence pairs)
    label_doc: DataFrame,    # label, doc_id        (distinct presence pairs)
    n_top_words: int = 10,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """(topic, label, score, rnk): top-k labels per topic by expected
    doc-frequency lift over the topic's top words."""
    norm = topic_word.groupBy("topic").agg(F.sum("weight").alias("_norm"))
    pw = topic_word.join(norm, "topic").select(
        "topic", "word", (F.col("weight") / F.col("_norm")).alias("pr_wt")
    )
    w_top = Window.partitionBy("topic").orderBy(F.desc("pr_wt"), F.asc("word"))
    top_words = (
        pw.withColumn("_rn", F.row_number().over(w_top))
        .filter(F.col("_rn") <= n_top_words)
        .select("topic", "word", "pr_wt")
    )
    # the distinct top-word set is tiny (#topics × n_top_words) — broadcast
    # it so the collection-wide df scans never shuffle on the fact side
    tw_set = top_words.select("word").distinct()
    n_docs = doc_word.select("doc_id").distinct().count()
    wd = doc_word.join(F.broadcast(tw_set), "word")
    df_w = wd.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df_w")
    )
    df_l = label_doc.groupBy("label").agg(
        F.countDistinct("doc_id").alias("df_l")
    )
    df_wl = (
        wd.join(label_doc, "doc_id")
        .groupBy("word", "label")
        .agg(F.countDistinct("doc_id").alias("df_wl"))
    )
    scored = (
        top_words.join(df_wl, "word")
        .join(F.broadcast(df_w), "word")
        .join(F.broadcast(df_l), "label")
        .withColumn(
            "_term",
            (F.col("pr_wt") * F.col("df_wl") * F.lit(float(n_docs)))
            / (F.col("df_w") * F.col("df_l")),
        )
        .groupBy("topic", "label")
        .agg(F.round(F.sum("_term"), round_to).alias("score"))
    )
    w_lbl = Window.partitionBy("topic").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_lbl))
        .filter(F.col("rnk") <= top_k)
        .select("topic", "label", "score", "rnk")
    )
