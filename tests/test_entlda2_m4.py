"""M4 EntLDA2 — joint (entity, topic) collapsed Gibbs
(enttopicmodel/EntLDA2.java:143-165 intended semantics; the reference's
neighbour-indexing and int-division quirks are documented in
models/entlda2.py and not reproduced). Verified by 1-partition
bit-parity against the NumPy oracle — through the full burn-in /
optimizeParameter / computeAlpha schedule — and by AD-LDA invariants on
a multi-partition run."""

import numpy as np
import pytest

from entitysummarization_spark.fixtures.samplers import (
    M4_D as D,
    M4_E as E,
    M4_T as T,
    M4_W as W,
    grouped_corpus,
    m4_corpus_rows,
    m4_ent_rows,
)
from entitysummarization_spark.models.entlda2 import (
    DistributedEntLda2,
    EntLda2Config,
    EntLda2Oracle,
    nbrs_from_rows,
)

SWEEPS = 4       # burn_in=2 default → exercises pre- and post-burn-in


@pytest.fixture(scope="module")
def m4_inputs(spark):
    corpus_df = spark.createDataFrame(
        m4_corpus_rows(), "doc_id long, word_id long, freq int"
    )
    doc_ent = spark.createDataFrame(
        m4_ent_rows(), "doc_id long, ent_id long, rel_ent_id long, sr double"
    )
    return corpus_df, doc_ent


def _doc_cands():
    cands = {}
    for d, e, _r, _s in m4_ent_rows():
        cands.setdefault(d, set()).add(e)
    return {
        d: np.asarray(sorted(es), dtype=np.int64) for d, es in cands.items()
    }


def _oracle(cfg=None):
    cfg = cfg or EntLda2Config(n_topics=T, n_entities=E, n_words=W,
                               n_partitions=1)
    nbrs, srs = nbrs_from_rows(m4_ent_rows(), E)
    return EntLda2Oracle(
        grouped_corpus(m4_corpus_rows()), _doc_cands(), nbrs, srs, cfg
    )


def test_m4_one_partition_bit_parity(spark, m4_inputs):
    corpus_df, doc_ent = m4_inputs
    orc = _oracle()
    orc.run(SWEEPS)
    cfg = EntLda2Config(n_topics=T, n_entities=E, n_words=W, n_partitions=1)
    dist = DistributedEntLda2(spark, corpus_df, doc_ent, cfg)
    dist.run(SWEEPS)
    zs = dist.z_state()
    assert set(zs) == set(orc.doc_ids)
    for d in orc.doc_ids:
        np.testing.assert_array_equal(zs[d][0], orc.es[d])
        np.testing.assert_array_equal(zs[d][1], orc.zs[d])
    np.testing.assert_array_equal(dist.nte, orc.nte)
    np.testing.assert_array_equal(dist.ne, orc.ne)
    assert dist.nwte == orc.nwte
    # θ/α schedule state is bit-identical too (shared functions over
    # identical counts — this asserts the schedules fired identically)
    np.testing.assert_array_equal(dist.theta, orc.theta)
    np.testing.assert_array_equal(dist.alpha_mat, orc.alpha_mat)
    np.testing.assert_array_equal(dist.sum_alpha, orc.sum_alpha)
    np.testing.assert_array_equal(dist.phi(), orc.phi())


def test_m4_delta_refresh_matches_absolute(spark, m4_inputs):
    """The per-sweep integer-delta refresh must equal the absolute
    explode-and-aggregate recompute (exactness by induction)."""
    corpus_df, doc_ent = m4_inputs
    cfg = EntLda2Config(n_topics=T, n_entities=E, n_words=W, n_partitions=3)
    dist = DistributedEntLda2(spark, corpus_df, doc_ent, cfg)
    dist.run(SWEEPS)
    nte_d, ne_d = dist.nte.copy(), dist.ne.copy()
    nwte_d = {w: dict(s) for w, s in dist.nwte.items()}
    dist._refresh_global_counts()
    np.testing.assert_array_equal(nte_d, dist.nte)
    np.testing.assert_array_equal(ne_d, dist.ne)
    assert {w: s for w, s in nwte_d.items() if s} == dist.nwte


def test_m4_multi_partition_invariants(spark, m4_inputs):
    corpus_df, doc_ent = m4_inputs
    cfg = EntLda2Config(n_topics=T, n_entities=E, n_words=W, n_partitions=3)
    dist = DistributedEntLda2(spark, corpus_df, doc_ent, cfg)
    dist.run(SWEEPS)
    n_tokens = sum(f for _, _, f in m4_corpus_rows())
    # token conservation across every count structure
    assert int(dist.nte.sum()) == n_tokens
    assert int(dist.ne.sum()) == n_tokens
    assert sum(c for s in dist.nwte.values() for c in s.values()) == n_tokens
    assert (dist.nte >= 0).all()
    assert all(c > 0 for s in dist.nwte.values() for c in s.values())
    np.testing.assert_array_equal(dist.ne, dist.nte.sum(axis=1))
    # after a full sweep every token of a candidate-bearing doc sits on a
    # candidate entity; the candidate-less doc keeps its init assignment
    cands = _doc_cands()
    zs = dist.z_state()
    for d, (es, _ts) in zs.items():
        if d in cands:
            assert set(es.tolist()) <= set(cands[d].tolist())
    assert D - 1 not in cands and D - 1 in zs  # skip-branch exercised


def test_m4_posteriors(spark, m4_inputs):
    corpus_df, doc_ent = m4_inputs
    cfg = EntLda2Config(n_topics=T, n_entities=E, n_words=W, n_partitions=2)
    dist = DistributedEntLda2(spark, corpus_df, doc_ent, cfg)
    dist.run(SWEEPS)
    theta = dist.theta_matrix()
    assert theta.shape == (E, T)
    assert (theta >= 0).all() and (theta <= 1).all()
    phi = dist.phi()
    assert phi.shape == (T, W)
    assert (phi >= 0).all()
    # ζ row-sums ≈ 1 under the sparse + fill-value completion
    zeta = dist.zeta().toPandas()
    nd_pdf = dist.state.select("doc_id", "words").toPandas()
    nd_by_doc = {
        int(d): len(ws) for d, ws in zip(nd_pdf["doc_id"], nd_pdf["words"])
    }
    for d, grp in zeta.groupby("doc_id"):
        nnz_sum = grp["zeta"].sum()
        fill = dist.zeta_fill_value(nd_by_doc[int(d)])
        total = nnz_sum + (E - len(grp)) * fill
        assert abs(total - 1.0) < 5e-3


def test_m4_alpha_moves_after_burn_in(spark, m4_inputs):
    """Before burn-in α stays flat ALPHA; after, the SR smoothing must
    actually change it (EPSILON=0.9 pulls hard toward neighbour θ)."""
    corpus_df, doc_ent = m4_inputs
    cfg = EntLda2Config(n_topics=T, n_entities=E, n_words=W,
                        n_partitions=1, burn_in=3)
    dist = DistributedEntLda2(spark, corpus_df, doc_ent, cfg)
    dist.run(2)        # itr+1 ∈ {1, 2} < burn_in=3
    assert (dist.alpha_mat == cfg.alpha).all()
    dist.run(1)        # itr+1 == 3 → computeAlpha fires
    assert not (dist.alpha_mat == cfg.alpha).all()


def test_m4_optimize_theta_monotone():
    """optimizeParameter only ever raises θ cells (EntLDA2.java:259)."""
    orc = _oracle()
    orc.run(2)         # reaches burn-in → θ computed
    before = orc.theta.copy()
    orc.run(1)
    # θ was recomputed then optimized; the optimize step itself is
    # monotone — check directly on a copy
    from entitysummarization_spark.models.entlda2 import _optimize_theta
    t2 = orc.theta.copy()
    _optimize_theta(t2, orc.ent_nbrs, orc.ent_srs, orc.cfg.gamma)
    assert (t2 >= orc.theta - 1e-12).all()
    assert before.shape == t2.shape
