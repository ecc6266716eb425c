"""Entity summary = top-k ranked facts per entity (W6, the flagship query).

The reference sorts each θ row descending and exports ranked facts to CSV
(src/cs/uga/edu/esum/EntSumModel.java:338-406, θ at :550-557). Here: join
observed facts with θ and φ, score = θ[d,p]·φ[p,w], rank with a
partitioned window — ties broken deterministically by (pred_id, word_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_facts(
    facts: DataFrame,   # doc_id, pred_id, word_id, subj, pred, obj
    theta: DataFrame,   # doc_id, pred_id, theta
    phi: DataFrame,     # pred_id, word_id, phi
    k: int = 5,
) -> DataFrame:
    scored = (
        facts.join(theta, ["doc_id", "pred_id"])
        .join(phi, ["pred_id", "word_id"])
        .withColumn("score", F.round(F.col("theta") * F.col("phi"), 8))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("pred_id"), F.asc("word_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "subj", "rank", "pred", "obj", "theta", "phi", "score")
    )
