"""Unit tests for graph operators (G4/G5/G7/O3/W3) and TF-IDF (A10/G14)."""

import math

import numpy as np
import pytest

import pyspark.sql.functions as F

from entitysummarization_spark.operators import graph, tfidf


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_connected_components_two_comps(spark):
    # comp A: 1-2-3 chain; comp B: 10-11; isolated-with-self: none
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    out = {
        r["node"]: r["component"]
        for r in graph.connected_components(e, n_iter=5).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pagerank_matches_numpy(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    out = {
        r["node"]: r["rank"]
        for r in graph.pagerank(_edges(spark, pairs), n_iter=10).collect()
    }
    # NumPy reference: same fixed-iteration scheme
    nodes = [1, 2, 3]
    idx = {n: i for i, n in enumerate(nodes)}
    outdeg = {1: 2, 2: 1, 3: 1}
    r = np.full(3, 1 / 3)
    for _ in range(10):
        nxt = np.full(3, 0.15 / 3)
        for s, d in pairs:
            nxt[idx[d]] += 0.85 * r[idx[s]] / outdeg[s]
        r = nxt
    for n in nodes:
        assert out[n] == pytest.approx(round(float(r[idx[n]]), 6), abs=2e-6)


def test_hits_chain(spark):
    # 1→2, 3→2: node 2 is the only authority; 1 and 3 equal hubs
    out = {
        r["node"]: (r["hub"], r["auth"])
        for r in graph.hits(_edges(spark, [(1, 2), (3, 2)]), n_iter=3).collect()
    }
    assert out[2][1] == pytest.approx(1.0, abs=1e-6)
    assert out[1][0] == pytest.approx(out[3][0], abs=1e-9)
    assert out[1][0] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert out[2][0] == 0.0 and out[1][1] == 0.0


def test_ancestors_chain_depths(spark):
    cp = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], "child long, parent long"
    )
    rows = {
        (r["node"], r["ancestor"]): r["depth"]
        for r in graph.ancestors(cp, max_depth=10).collect()
    }
    assert rows[(4, 3)] == 1 and rows[(4, 2)] == 2 and rows[(4, 1)] == 3
    assert rows[(2, 1)] == 1
    assert (1, 1) not in rows


def test_ancestors_cycle_safe(spark):
    cp = spark.createDataFrame([(1, 2), (2, 1)], "child long, parent long")
    rows = graph.ancestors(cp, max_depth=6).collect()
    # cycle: each node has the other as ancestor, never itself
    got = {(r["node"], r["ancestor"]) for r in rows}
    assert got == {(1, 2), (2, 1)}


def test_textrank_deterministic_topk(spark):
    docs = spark.createDataFrame(
        [(1, "hub spoke1 hub spoke2 hub spoke3")], "doc_id long, text string"
    )
    rows = graph.textrank_words(docs, top_k=2).collect()
    assert [r["word"] for r in sorted(rows, key=lambda r: r["rnk"])][0] == "hub"
    assert all(r["doc_id"] == 1 for r in rows) and len(rows) == 2


def test_per_doc_core_entities(spark):
    # doc 1: star 10→{11,12,13} plus detached pair 20→21; doc 2: 5→6
    e = spark.createDataFrame(
        [(1, 10, 11), (1, 10, 12), (1, 10, 13), (1, 20, 21), (2, 5, 6)],
        "doc_id long, src long, dst long",
    )
    rows = graph.per_doc_core_entities(e, k_core=2).collect()
    d1 = {r["node"]: r for r in rows if r["doc_id"] == 1}
    assert {n for n, r in d1.items() if r["in_largest_cc"]} == {10, 11, 12, 13}
    assert not d1[20]["in_largest_cc"] and not d1[21]["in_largest_cc"]
    assert d1[10]["hub"] == pytest.approx(1.0, abs=1e-6)  # the only hub
    # closeness: 10 is 1 hop from all 3; leaves are 1+2+2=5 total
    assert d1[10]["closeness"] == pytest.approx(1 / 3, abs=1e-6)
    assert d1[11]["closeness"] == pytest.approx(1 / 5, abs=1e-6)
    assert d1[10]["is_core"]
    d2 = {r["node"]: r for r in rows if r["doc_id"] == 2}
    assert d2[5]["is_core"] and d2[6]["is_core"]


def test_top_k_core_nodes_union(spark):
    scores = spark.createDataFrame(
        [(1, 0.9, 0.1), (2, 0.1, 0.9), (3, 0.5, 0.5)],
        "node long, hub double, auth double",
    )
    got = {r["node"] for r in graph.top_k_core_nodes(scores, 1, 1).collect()}
    assert got == {1, 2}


def test_category_scores_blend(spark):
    # chain 4→3→2→1 as (child, parent): ancestor 1 covers 3 nodes
    cp = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1)], "child long, parent long"
    )
    closure = graph.ancestors(cp, max_depth=10)
    rows = {r["category"]: r for r in graph.category_scores(closure).collect()}
    assert rows[1]["coverage"] == 3
    # score(1) = 3^-1 (from 2) + 3^-2 (from 3) + 3^-3 (from 4)
    assert rows[1]["score"] == pytest.approx(
        round(1 / 3 + 1 / 9 + 1 / 27, 6)
    )
    assert rows[1]["final"] == pytest.approx(
        round(0.6 * rows[1]["score"] + 0.4 * 3, 6)
    )
    assert rows[2]["rnk"] < rows[3]["rnk"] or rows[2]["final"] >= rows[3]["final"]


def test_tfidf_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["word"]): r for r in tfidf.tfidf(docs).collect()
    }
    assert rows[(1, "a")]["tf"] == 2 and rows[(1, "a")]["df"] == 2
    assert rows[(1, "a")]["tfidf"] == pytest.approx(
        round(2 * math.log(2 / 2), 4)
    )  # = 0: ubiquitous word
    assert rows[(1, "b")]["tfidf"] == pytest.approx(round(math.log(2), 4))


def test_tfidf_cosine_identical_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "q r s")], "doc_id long, text string"
    )
    rows = tfidf.tfidf_cosine_pairs(docs, top_k=5).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}
    assert by_pair[(1, 2)] == pytest.approx(1.0, abs=1e-4)
    assert (1, 3) not in by_pair  # no shared words → no pair row


def test_valid_names_filters(spark):
    docs = spark.createDataFrame(
        [(1, "abc ab 123 a+b 'bad good%x fine")], "doc_id long, text string"
    )
    got = {r["word"] for r in tfidf.valid_names(docs).collect()}
    assert got == {"abc", "fine"}
