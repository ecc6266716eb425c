"""M3 option: SR-graph-smoothed per-doc α — oracle bit-parity and effect."""

import numpy as np
import pytest

from entitysummarization_spark.models.gibbs import DistributedGibbs, GibbsConfig
from entitysummarization_spark.models.oracle import (
    GibbsOracle,
    alpha_from_neighbors,
)
from entitysummarization_spark.operators.canonicalize import canonical_triples
from entitysummarization_spark.operators.corpus import build_corpus
from entitysummarization_spark.operators.extraction import extract_triples


@pytest.fixture(scope="module")
def bundle(spark, fixture_small):
    fx = fixture_small
    repos = spark.createDataFrame(fx.repos.head(24))
    canon = canonical_triples(extract_triples(spark, repos, fx.vocab)).persist()
    b = build_corpus(canon)
    return b, int(b.preds.count()), int(b.words.count())


def _oracle_inputs(b, P, W):
    cp = b.corpus.toPandas()
    corpus = {
        int(d): (g["word_id"].to_numpy(np.int64), g["freq"].to_numpy(np.int64))
        for d, g in cp.groupby("doc_id")
    }
    op = b.obj_pred.toPandas()
    cand = {
        int(w): np.asarray(sorted(ps), dtype=np.int64)
        for w, ps in zip(op["word_id"], op["pred_ids"])
    }
    lamp = b.lam.toPandas()
    lam = np.ones((P, W))
    lam[lamp["pred_id"].to_numpy(), lamp["word_id"].to_numpy()] = (
        lamp["weight"].to_numpy()
    )
    return corpus, cand, lam


from entitysummarization_spark.fixtures.samplers import (  # noqa: E402
    ring_edges as _ring_edges,  # shared with the driver m3_invariants query
)


def test_alpha_from_neighbors_no_nbrs():
    av = alpha_from_neighbors([], P=4, alpha0=0.5, epsilon=0.9)
    assert np.allclose(av, 0.05)


def test_alpha_from_neighbors_closed_form():
    # one neighbor: nd=2, npd = {0: 2}, P=2, alpha0=1.0
    nbrs = [(7, 2, np.array([0]), np.array([2]))]
    av = alpha_from_neighbors(nbrs, P=2, alpha0=1.0, epsilon=0.9)
    theta = np.round(np.array([(2 + 1) / 4, 1 / 4]), 4)
    expect = 0.1 * 1.0 + 0.9 * 2.0 * theta
    assert np.allclose(av, expect)


@pytest.mark.filterwarnings("ignore:kernel='numba'")  # expected degrade
@pytest.mark.parametrize("kernel", ["native", "fast", "numba"])
def test_m3_single_partition_bit_parity(spark, bundle, kernel):
    """The M3 per-doc-alpha path must hold bit-parity under EVERY kernel
    (the per-doc alpha vector takes a different code path in the
    compiled kernels than the scalar M1 alpha does)."""
    b, P, W = bundle
    corpus, cand, lam = _oracle_inputs(b, P, W)
    edges = _ring_edges(corpus)
    doc_nbrs = {}
    for a_, b_ in edges:
        doc_nbrs.setdefault(a_, []).append(b_)

    oracle = GibbsOracle(corpus, cand, P, W, lam=lam, base_seed=11,
                         doc_nbrs=doc_nbrs)
    oracle.run(4)

    sr = spark.createDataFrame(edges, "doc_a long, doc_b long")
    cfg = GibbsConfig(n_preds=P, n_words=W, base_seed=11, n_partitions=1,
                      kernel=kernel)
    g = DistributedGibbs(spark, b.corpus, b.obj_pred, b.lam, cfg, doc_sr=sr)
    g.run(4)

    zs = g.z_state()
    for d in oracle.state.doc_ids:
        assert np.array_equal(zs[d], oracle.state.z[d]), f"doc {d} diverged"


def test_m3_changes_assignments_vs_m1(spark, bundle):
    b, P, W = bundle
    corpus, cand, lam = _oracle_inputs(b, P, W)
    edges = _ring_edges(corpus)
    sr = spark.createDataFrame(edges, "doc_a long, doc_b long")
    cfg = GibbsConfig(n_preds=P, n_words=W, base_seed=11, n_partitions=2)
    g1 = DistributedGibbs(spark, b.corpus, b.obj_pred, b.lam, cfg)
    g1.run(3)
    g3 = DistributedGibbs(spark, b.corpus, b.obj_pred, b.lam, cfg, doc_sr=sr)
    g3.run(3)
    z1, z3 = g1.z_state(), g3.z_state()
    # same shapes; the smoothed prior must actually alter the trajectory
    assert set(z1) == set(z3)
    assert any(not np.array_equal(z1[d], z3[d]) for d in z1)
