"""M8 — unconstrained parallel-LDA fast path (SURVEY §2.8 M8).

The reference's OntLDA front half hands the corpus to Mallet's
``ParallelTopicModel`` (a multi-threaded unconstrained collapsed Gibbs,
/root/reference/TextProcessing/src/cs/uga/edu/topicmodel/OntLDA.java:100-114)
and then labels the fitted topics with the PMI-lift labeler (W7,
operators/labeling.py). Spark-first, the fast path is
``pyspark.ml.clustering.LDA`` with the online variational-Bayes optimizer
(Hoffman et al. 2010) — mini-batch EM over the executors, no token-level
state on the driver — feeding the same labeler.

Relationship to the constrained sampler (models/gibbs.py): M1/M3/M5/M6
implement the paper's *constrained* samplers (candidate-topic sets, λ
weights, SR-smoothed α) with bit-parity oracles; M8 is the deliberately
unconstrained "just give me topics fast" configuration, so it uses the
stock estimator rather than re-deriving VB from scratch.

Pipeline (all JVM-side until the k-row describeTopics result):
  corpus (doc_id, word_id, freq)
    → per-doc token array (tokens_from_corpus, same layout as Gibbs)
    → CountVectorizer (sparse count vectors; its vocabulary gives the
      index→word_id map back)
    → LDA(online VB, seeded)
    → topic_word (topic, word_id, weight = P(w|t)) and
      doc_topic (topic distribution per doc, via vector_to_array).

Scale: doc vectors stay sparse and distributed; only the P×W topics
matrix (bounded by the F10 vocabulary prune, same budget as the Gibbs
count refresh) and the W-entry vocabulary ever reach the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .gibbs import tokens_from_corpus


def fast_lda(
    corpus: DataFrame,
    k: int,
    max_iter: int = 30,
    seed: int = 7,
    optimizer: str = "online",
) -> tuple[DataFrame, DataFrame]:
    """Fit unconstrained LDA over a (doc_id, word_id, freq) corpus.

    Returns ``(topic_word, doc_topic)``:
      - topic_word: (topic int, word_id long, weight double) — normalized
        P(w|t) rows (each topic sums to 1);
      - doc_topic: (doc_id long, topic int, theta double) — per-doc topic
        distribution.
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    spark = corpus.sparkSession
    # same deterministic token layout the Gibbs sampler consumes; word ids
    # become string tokens so CountVectorizer (JVM, sparse output) builds
    # the doc-term vectors — no Python in the vectorization path
    toks = tokens_from_corpus(corpus).select(
        "doc_id",
        F.transform(F.col("words"), lambda w: w.cast("string")).alias("toks"),
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features")
    cv_model = cv.fit(toks)
    vecs = cv_model.transform(toks).select("doc_id", "features")

    lda = LDA(
        k=k,
        maxIter=max_iter,
        seed=seed,
        optimizer=optimizer,
        featuresCol="features",
    )
    model = lda.fit(vecs)

    # CountVectorizer's vocabulary maps its internal term index back to our
    # word_id — W entries, bounded by the F10 prune (same driver budget as
    # the Gibbs P×W refresh)
    vocab = spark.createDataFrame(
        [(i, int(w)) for i, w in enumerate(cv_model.vocabulary)],
        "term_idx int, word_id long",
    )
    n_terms = len(cv_model.vocabulary)
    topic_word = (
        model.describeTopics(maxTermsPerTopic=n_terms)
        .select(
            "topic",
            F.explode(
                F.arrays_zip(
                    F.col("termIndices").alias("term_idx"),
                    F.col("termWeights").alias("weight"),
                )
            ).alias("tw"),
        )
        .select(
            "topic",
            F.col("tw.term_idx").alias("term_idx"),
            F.col("tw.weight").alias("weight"),
        )
        .join(F.broadcast(vocab), "term_idx")
        .select("topic", "word_id", "weight")
    )
    doc_topic = (
        model.transform(vecs)
        .select(
            "doc_id", vector_to_array(F.col("topicDistribution")).alias("td")
        )
        .select("doc_id", F.posexplode("td").alias("topic", "theta"))
    )
    return topic_word, doc_topic


def lda_with_labels(
    corpus: DataFrame,
    label_doc: DataFrame,
    k: int,
    max_iter: int = 30,
    seed: int = 7,
    n_top_words: int = 10,
    top_k_labels: int = 5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The full M8 flow: fast unconstrained LDA + PMI-lift topic labels
    (OntLDA.java:100-114 model fit, :177-230 labeling).

    ``label_doc`` is the (label, doc_id) presence table (the reference's
    category↔document index). Returns (topic_word, doc_topic, labels)
    where labels = (topic, label, score, rnk).
    """
    from ..operators.labeling import pmi_topic_labels

    topic_word, doc_topic = fast_lda(corpus, k, max_iter=max_iter, seed=seed)
    doc_word = corpus.select(
        "doc_id", F.col("word_id").alias("word")
    ).distinct()
    labels = pmi_topic_labels(
        topic_word.select("topic", F.col("word_id").alias("word"), "weight"),
        doc_word,
        label_doc,
        n_top_words=n_top_words,
        top_k=top_k_labels,
    )
    return topic_word, doc_topic, labels
