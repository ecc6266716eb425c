"""Driver-contract mirror: every queries() entry runs and matches its
oracle_sql() on DuckDB (sf0.001 for speed; the driver re-runs at sf0.01)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from oracle_harness import compare, duck_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_registry_order_protects_flagship():
    """The driver certifies the FIRST 50 registered queries (r03 checked
    exactly positions 1-50 of 55), so the flagship pipeline and the four
    queries that lacked a driver row must stay inside the window and only
    double-covered twins may sit past position 50."""
    keys = list(QUERIES)
    assert keys[:5] == [
        "kg_pipeline_summaries", "kg_pipeline_invariants",
        "m8_lda_invariants", "ann_ivf_topk", "simhash",
    ]
    twins = {"lang_id_ngram", "sessions", "g14_tfidf_cosine_capped",
             "g4_cc_star", "g7_pagerank"}
    assert set(keys[50:]) <= twins


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sp = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sp) >= 0  # rows-only contract
        return
    con = duck_con(sf_dir)
    dk = con.execute(ORACLES[name]).fetchdf()
    errs = compare(name, sp, dk)
    assert not errs, errs[:3]
