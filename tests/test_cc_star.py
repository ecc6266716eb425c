"""Large-star/small-star CC (corpus-scale path) — agreement with the
min-label operator and the logarithmic-round guarantee the round-2
verdict asked for (min-label is O(diameter); star is O(log n))."""

import numpy as np

from entitysummarization_spark.operators import graph

CHAIN_N = 64  # diameter 63: min-label would need 63 rounds


def test_star_matches_min_label_random_graph(spark):
    rng = np.random.RandomState(17)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, 120, size=(200, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    ml = {
        r["node"]: r["component"]
        for r in graph.connected_components(df, n_iter=40).collect()
    }
    st = {
        r["node"]: r["component"]
        for r in graph.connected_components_star(df).collect()
    }
    assert ml == st


def test_star_long_chain_logarithmic_rounds(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "src long, dst long"
    )
    stats: dict = {}
    labels = graph.connected_components_star(chain, stats=stats)
    rows = labels.collect()
    assert len(rows) == CHAIN_N
    assert all(r["component"] == 0 for r in rows)
    # min-label needs diameter (=63) rounds for the far end to learn 0;
    # the star alternation must collapse the chain geometrically
    assert stats["rounds"] <= 12, stats


def test_star_isolated_and_singleton_components(spark):
    df = spark.createDataFrame(
        [(5, 9), (9, 5), (3, 3), (7, 8)], "src long, dst long"
    )
    out = {
        r["node"]: r["component"]
        for r in graph.connected_components_star(df).collect()
    }
    assert out[5] == 5 and out[9] == 5
    assert out[7] == 7 and out[8] == 7
    assert out[3] == 3  # self-loop only → its own component
