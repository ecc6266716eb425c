"""Fused multi-sweep blocks for M6 ontoPart
(OntoPartConfig.sweeps_per_job > 1) — the same scheme and exactness
anchors as the M1 fusion in test_gibbs_fused.py:

  1. n_partitions=1 → BIT-IDENTICAL to the unfused chain (and therefore
     to the sequential NumPy oracle);
  2. any partitioning → the delta-maintained global count matrices equal
     a full recompute from the final (ts, cs) state at every block
     boundary, and conserve the token total;
  3. a compiler-less executor runs the interpreted per-token twin inside
     the same fused runner — identical chain mid-block.
"""

import numpy as np
import pytest

from entitysummarization_spark.fixtures.samplers import (
    M6_C as C,
    M6_T as T,
    M6_W as W,
    m6_class_rows,
    m6_corpus_rows,
)
from entitysummarization_spark.models import native_kernel
from entitysummarization_spark.models.ontopart import (
    DistributedOntoPart,
    OntoPartConfig,
    _onto_arrow_batches,
    _onto_fused_arrow_batches,
)

needs_cc = pytest.mark.skipif(
    not native_kernel.native_available(), reason="no C compiler"
)


@pytest.fixture(scope="module")
def m6_inputs(spark):
    corpus_df = spark.createDataFrame(
        m6_corpus_rows(), "doc_id long, word_id long, freq int"
    )
    class_word = spark.createDataFrame(
        m6_class_rows(), "class_id long, word_id long"
    )
    return corpus_df, class_word


def _run(spark, m6_inputs, n_partitions, sweeps, sweeps_per_job):
    corpus_df, class_word = m6_inputs
    cfg = OntoPartConfig(
        n_topics=T, n_classes=C, n_words=W, n_partitions=n_partitions,
        kernel="native", sweeps_per_job=sweeps_per_job,
    )
    m = DistributedOntoPart(spark, corpus_df, class_word, cfg)
    m.run(sweeps)
    return m


@needs_cc
def test_fused_bit_identical_single_partition(spark, m6_inputs):
    mf = _run(spark, m6_inputs, n_partitions=1, sweeps=6, sweeps_per_job=3)
    mu = _run(spark, m6_inputs, n_partitions=1, sweeps=6, sweeps_per_job=1)
    zf, zu = mf.z_state(), mu.z_state()
    assert set(zf) == set(zu)
    for d in zu:
        np.testing.assert_array_equal(zf[d][0], zu[d][0])
        np.testing.assert_array_equal(zf[d][1], zu[d][1])
    np.testing.assert_array_equal(mf.nct, mu.nct)
    np.testing.assert_array_equal(mf.nwc, mu.nwc)
    mf.close()
    mu.close()


@needs_cc
def test_fused_counts_exact_at_block_boundary(spark, m6_inputs):
    m = _run(spark, m6_inputs, n_partitions=3, sweeps=4, sweeps_per_job=2)
    n_tokens = int(m.nct.sum())
    nct_delta, nwc_delta = m.nct.copy(), m.nwc.copy()
    m._refresh_global_counts()  # absolute recompute — the arbiter
    np.testing.assert_array_equal(nct_delta, m.nct)
    np.testing.assert_array_equal(nwc_delta, m.nwc)
    assert int(m.nct.sum()) == int(m.nwc.sum()) == n_tokens
    m.close()


@needs_cc
def test_fused_remainder_and_sweep_count(spark, m6_inputs):
    m = _run(spark, m6_inputs, n_partitions=2, sweeps=5, sweeps_per_job=2)
    assert m.sweeps_done == 5
    m.close()


def test_fused_rejects_python_kernel(spark, m6_inputs):
    corpus_df, class_word = m6_inputs
    cfg = OntoPartConfig(n_topics=T, n_classes=C, n_words=W,
                         n_partitions=1, kernel="python", sweeps_per_job=3)
    m = DistributedOntoPart(spark, corpus_df, class_word, cfg)
    m.init_state()
    with pytest.raises(ValueError, match="fused"):
        m.sweep(n_fused=2)
    with pytest.warns(UserWarning, match="sweeps_per_job"):
        m.run(2)
    assert m.sweeps_done == 2
    m.close()


def _tiny_problem():
    """Driver-side micro problem for the fused runner: 2 docs, W=4
    words, T=2 topics, C=3 classes, full candidate sets."""
    import pyarrow as pa

    t_, c_, w_ = 2, 3, 4
    cand = {w: np.arange(c_, dtype=np.int64) for w in range(w_)}
    csr = native_kernel.cand_to_csr(cand, w_)
    words = [[0, 1, 1, 2, 3, 0], [2, 2, 3, 0]]
    ts = [[0, 1, 0, 1, 0, 1], [1, 0, 1, 0]]
    cs = [[0, 1, 2, 0, 1, 2], [1, 2, 0, 1]]
    rb = pa.RecordBatch.from_arrays(
        [pa.array([0, 1], type=pa.int64()),
         pa.array(words, type=pa.list_(pa.int64())),
         pa.array(ts, type=pa.list_(pa.int64())),
         pa.array(cs, type=pa.list_(pa.int64()))],
        names=["doc_id", "words", "ts", "cs"],
    )
    nct = np.zeros((t_, c_), dtype=np.int64)
    nwc = np.zeros((c_, w_), dtype=np.int64)
    for ws_r, ts_r, cs_r in zip(words, ts, cs):
        for w, t, c in zip(ws_r, ts_r, cs_r):
            nct[t, c] += 1
            nwc[c, w] += 1
    return rb, csr, nct, nwc, t_, c_, w_


@needs_cc
def test_fused_runner_matches_sequential_unfused():
    """One partition's fused K=3 pass equals 3 sequential unfused arrow
    passes with the driver's exact delta refresh applied between them."""
    import pyarrow as pa

    rb, csr, nct0, nwc0, t_, c_, w_ = _tiny_problem()
    lib = native_kernel.load_native()
    a, b, z0, seed = 50.0 / t_, 0.01, 0.01, 11
    max_cls = c_

    fused = list(_onto_fused_arrow_batches(
        iter([rb]), lib, csr, nct0.copy(), nwc0.copy(), t_, c_, w_,
        a, b, z0, seed, 0, 3, max_cls,
    ))
    assert len(fused) == 1

    cur, nct, nwc = rb, nct0.copy(), nwc0.copy()
    for s in range(3):
        out = list(_onto_arrow_batches(
            iter([cur]), lib, csr, nct, nwc, t_, c_, w_,
            a, b, z0, seed, s, max_cls,
        ))[0]
        for row in zip(*(out.column(k).to_pylist()
                         for k in ("dw", "dto", "dco", "dtn", "dcn"))):
            for w, to, co, tn, cn in zip(*row):
                nct[to, co] -= 1
                nct[tn, cn] += 1
                nwc[co, w] -= 1
                nwc[cn, w] += 1
        cur = pa.RecordBatch.from_arrays(
            [out.column("doc_id"), out.column("words"),
             out.column("ts"), out.column("cs")],
            names=["doc_id", "words", "ts", "cs"],
        )
    f = fused[0]
    assert f.column("ts").to_pylist() == cur.column("ts").to_pylist()
    assert f.column("cs").to_pylist() == cur.column("cs").to_pylist()
    # fused deltas reconstruct the same final counts
    nct_f, nwc_f = nct0.copy(), nwc0.copy()
    for row in zip(*(f.column(k).to_pylist()
                     for k in ("dw", "dto", "dco", "dtn", "dcn"))):
        for w, to, co, tn, cn in zip(*row):
            nct_f[to, co] -= 1
            nct_f[tn, cn] += 1
            nwc_f[co, w] -= 1
            nwc_f[cn, w] += 1
    np.testing.assert_array_equal(nct_f, nct)
    np.testing.assert_array_equal(nwc_f, nwc)


@needs_cc
def test_fused_interpreted_fallback_matches_native():
    """lib=None runs the interpreted per-token twin inside the SAME
    fused runner — identical chain, deltas and state."""
    rb, csr, nct0, nwc0, t_, c_, w_ = _tiny_problem()
    lib = native_kernel.load_native()
    a, b, z0, seed = 50.0 / t_, 0.01, 0.01, 11
    run = lambda L: list(_onto_fused_arrow_batches(  # noqa: E731
        iter([rb]), L, csr, nct0.copy(), nwc0.copy(), t_, c_, w_,
        a, b, z0, seed, 0, 3, c_,
    ))[0]
    x, y = run(lib), run(None)
    for col in ("ts", "cs", "dw", "dto", "dco", "dtn", "dcn"):
        assert x.column(col).to_pylist() == y.column(col).to_pylist(), col
