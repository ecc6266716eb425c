"""Fused multi-sweep blocks (GibbsConfig.sweeps_per_job > 1).

Fusion runs K sweeps inside ONE mapInArrow job, carrying each
partition's locally-updated counts across the fused sweeps (the AD-LDA
staleness extended from within-a-sweep to within-a-block). The gates
mirror the scheme's two exactness anchors plus the rank-fidelity bar
every approximation in this repo clears:

  1. n_partitions=1 → BIT-IDENTICAL to the unfused chain (local counts
     ARE the global counts, RNG is per (seed, sweep, doc));
  2. any partitioning → the driver's delta-maintained count matrices
     equal a full recompute from z-state at every block boundary
     (integer-delta induction is partition- and fusion-agnostic);
  3. multi-partition fused summaries pass the same NDCG@5 floor as the
     unfused AD-LDA approximation (test_summary_ndcg.py calibration:
     exact-sampler seed-noise floor 0.58, unfused 4-partition 0.83).
"""

import numpy as np
import pytest

from entitysummarization_spark.models import native_kernel
from entitysummarization_spark.models.gibbs import (
    DistributedGibbs,
    GibbsConfig,
    _interleave_doc_deltas,
    _run_arrow_batches,
    _run_fused_arrow_batches,
)
from entitysummarization_spark.operators.canonicalize import canonical_triples
from entitysummarization_spark.operators.corpus import build_corpus
from entitysummarization_spark.operators.extraction import extract_triples

needs_cc = pytest.mark.skipif(
    not native_kernel.native_available(), reason="no C compiler"
)


@pytest.fixture(scope="module")
def bundle(spark, fixture_small):
    fx = fixture_small
    repos = spark.createDataFrame(fx.repos.head(30))
    triples = extract_triples(spark, repos, fx.vocab)
    canon = canonical_triples(triples).persist()
    b = build_corpus(canon)
    P, W = b.preds.count(), b.words.count()
    return b, int(P), int(W)


def _run(spark, b, P, W, n_partitions, sweeps, sweeps_per_job):
    cfg = GibbsConfig(
        n_preds=P, n_words=W, base_seed=11, n_partitions=n_partitions,
        kernel="native", sweeps_per_job=sweeps_per_job,
    )
    g = DistributedGibbs(spark, b.corpus, b.obj_pred, b.lam, cfg)
    g.run(sweeps)
    return g


def test_interleave_doc_deltas_groups_by_doc_sweep_ordered():
    """Pure index arithmetic: per-sweep flat change arrays regroup into
    per-doc segments, sweeps in order within a doc."""
    # 3 docs; sweep A changes (doc0: 10,11) (doc2: 12); sweep B changes
    # (doc0: 20) (doc1: 21,22)
    s_a = (np.array([10, 11, 12]), np.array([0, 0, 2]),
           np.array([1, 1, 3]), np.array([2, 0, 1]))
    s_b = (np.array([20, 21, 22]), np.array([5, 6, 6]),
           np.array([7, 8, 8]), np.array([1, 2, 0]))
    dw, dold, dnew, off = _interleave_doc_deltas(3, [s_a, s_b])
    assert off.tolist() == [0, 3, 5, 6]
    assert dw.tolist() == [10, 11, 20, 21, 22, 12]
    assert dold.tolist() == [0, 0, 5, 6, 6, 2]
    assert dnew.tolist() == [1, 1, 7, 8, 8, 3]


def test_interleave_doc_deltas_empty_sweeps():
    z = np.zeros(0, dtype=np.int64)
    zero = (z, z, z, np.zeros(2, dtype=np.int64))
    dw, dold, dnew, off = _interleave_doc_deltas(2, [zero, zero])
    assert off.tolist() == [0, 0, 0] and dw.size == 0


@needs_cc
def test_fused_bit_identical_single_partition(spark, bundle):
    """With one partition the carried local counts equal the refreshed
    global counts, so fused K sweeps ≡ K unfused sweeps exactly."""
    b, P, W = bundle
    gf = _run(spark, b, P, W, n_partitions=1, sweeps=6, sweeps_per_job=3)
    gu = _run(spark, b, P, W, n_partitions=1, sweeps=6, sweeps_per_job=1)
    zf, zu = gf.z_state(), gu.z_state()
    assert set(zf) == set(zu)
    for d in zu:
        assert np.array_equal(zf[d], zu[d]), f"doc {d}"
    assert np.array_equal(gf.nwp, gu.nwp)
    assert np.array_equal(gf.np_, gu.np_)
    gf.close()
    gu.close()


@needs_cc
def test_fused_counts_exact_at_block_boundary(spark, bundle):
    """Multi-partition fusion: the delta-maintained global counts must
    equal a full recompute from the final z-state, and conserve the
    token total (every sweep's deltas are emitted and aggregated)."""
    b, P, W = bundle
    g = _run(spark, b, P, W, n_partitions=3, sweeps=4, sweeps_per_job=2)
    n_tokens = int(g.np_.sum())
    nwp_delta = g.nwp.copy()
    g._refresh_global_counts()  # absolute recompute — the arbiter
    assert np.array_equal(nwp_delta, g.nwp)
    assert int(g.nwp.sum()) == n_tokens
    g.close()


@needs_cc
def test_fused_remainder_and_sweep_count(spark, bundle):
    """run(5) with sweeps_per_job=2 → blocks of 2,2,1; sweeps_done=5 and
    the chain advances exactly 5 RNG sweeps (sweep 5 ≠ sweep 4 state)."""
    b, P, W = bundle
    g = _run(spark, b, P, W, n_partitions=2, sweeps=5, sweeps_per_job=2)
    assert g.sweeps_done == 5
    g.close()


def test_fused_rejects_non_native_and_m3(spark, bundle):
    b, P, W = bundle
    cfg = GibbsConfig(n_preds=P, n_words=W, base_seed=11, n_partitions=1,
                      kernel="fast", sweeps_per_job=4)
    g = DistributedGibbs(spark, b.corpus, b.obj_pred, b.lam, cfg)
    g.init_state()
    with pytest.raises(ValueError, match="fused"):
        g.sweep(n_fused=2)
    # run() degrades with a warning instead of raising
    with pytest.warns(UserWarning, match="sweeps_per_job"):
        g.run(2)
    assert g.sweeps_done == 2
    g.close()


def _tiny_problem():
    """Driver-side micro problem exercising the fused runner directly:
    2 docs, W=4 words, P=3 preds, full candidate sets."""
    import pyarrow as pa

    P, W = 3, 4
    cand = {w: np.arange(P, dtype=np.int64) for w in range(W)}
    csr_indptr, csr_data = native_kernel.cand_to_csr(cand, W)
    lam = np.ones((P, W))
    beta = 0.01
    const = {
        "cand": cand, "lam": lam, "slb": lam.sum(axis=1) * beta,
        "csr_indptr": csr_indptr, "csr_data": csr_data,
        "lam_beta": np.ascontiguousarray((lam * beta).ravel()),
        "max_cand": P,
    }
    words = [[0, 1, 1, 2, 3, 0], [2, 2, 3, 0]]
    zs = [[0, 1, 2, 0, 1, 2], [1, 1, 0, 2]]
    rb = pa.RecordBatch.from_arrays(
        [pa.array([0, 1], type=pa.int64()),
         pa.array(words, type=pa.list_(pa.int64())),
         pa.array(zs, type=pa.list_(pa.int64()))],
        names=["doc_id", "words", "zs"],
    )
    nwp = np.zeros((P, W), dtype=np.int64)
    for ws, zz in zip(words, zs):
        for w, z in zip(ws, zz):
            nwp[z, w] += 1
    return rb, const, nwp, P, W


@needs_cc
def test_fused_runner_matches_sequential_unfused():
    """Function-level parity: one partition's fused K=3 pass equals 3
    sequential _run_arrow_batches calls with the driver's delta refresh
    applied between them (exactly what DistributedGibbs does unfused)."""
    rb, const, nwp0, P, W = _tiny_problem()
    lib = native_kernel.load_native()
    alpha, seed = 50.0 / P, 11

    fused = list(_run_fused_arrow_batches(
        iter([rb]), lib, const, nwp0.copy(), nwp0.sum(axis=1),
        P, alpha, seed, 0, 3,
    ))
    assert len(fused) == 1

    cur, nwp = rb, nwp0.copy()
    for s in range(3):
        out = list(_run_arrow_batches(
            iter([cur]), lib, const, nwp, nwp.sum(axis=1),
            P, alpha, seed, s,
        ))[0]
        # driver-side exact delta refresh between unfused sweeps
        for row_dw, row_po, row_pn in zip(
            out.column("dw").to_pylist(),
            out.column("dp_old").to_pylist(),
            out.column("dp_new").to_pylist(),
        ):
            for w, po, pn in zip(row_dw, row_po, row_pn):
                nwp[po, w] -= 1
                nwp[pn, w] += 1
        import pyarrow as pa

        cur = pa.RecordBatch.from_arrays(
            [out.column("doc_id"), out.column("words"), out.column("zs")],
            names=["doc_id", "words", "zs"],
        )
    f = fused[0]
    assert f.column("zs").to_pylist() == cur.column("zs").to_pylist()
    # fused deltas reconstruct the same final counts
    nwp_f = nwp0.copy()
    for row_dw, row_po, row_pn in zip(
        f.column("dw").to_pylist(), f.column("dp_old").to_pylist(),
        f.column("dp_new").to_pylist(),
    ):
        for w, po, pn in zip(row_dw, row_po, row_pn):
            nwp_f[po, w] -= 1
            nwp_f[pn, w] += 1
    assert np.array_equal(nwp_f, nwp)


@needs_cc
def test_fused_multi_partition_summary_ndcg(spark):
    """Rank-fidelity gate for the fused approximation at 4 partitions:
    same bar the unfused AD-LDA run clears in test_summary_ndcg.py
    (abs floor 0.75 < the measured unfused 0.83, both far above the
    exact sampler's 0.58 seed-noise floor). Fusing 5 of the 10 sweeps
    per job doubles the staleness horizon — this pins the cost of that
    to below a seed change."""
    from entitysummarization_spark.fixtures import make_fixture
    from entitysummarization_spark.plans.pipeline import run_pipeline

    from test_summary_ndcg import ABS_FLOOR, mean_ndcg

    fx = make_fixture(n_files=60, seed=42)
    repos = spark.createDataFrame(fx.repos)
    ref = run_pipeline(spark, repos, vocab=fx.vocab, n_sweeps=10,
                       k=10**6, n_partitions=1, base_seed=7)
    fused = run_pipeline(spark, repos, vocab=fx.vocab, n_sweeps=10,
                         k=5, n_partitions=4, base_seed=7,
                         sweeps_per_job=5)
    score = mean_ndcg(ref.summaries.toPandas(), fused.summaries.toPandas())
    assert score >= ABS_FLOOR, f"fused NDCG@5 {score:.3f} < {ABS_FLOOR}"


@needs_cc
def test_fused_interpreted_fallback_matches_native():
    """lib=None (executor without a compiler) runs the interpreted
    numba-twin kernel inside the SAME fused runner — identical chain, so
    heterogeneous clusters agree even mid-block."""
    rb, const, nwp0, P, W = _tiny_problem()
    lib = native_kernel.load_native()
    alpha, seed = 50.0 / P, 11
    a = list(_run_fused_arrow_batches(
        iter([rb]), lib, const, nwp0.copy(), nwp0.sum(axis=1),
        P, alpha, seed, 0, 3,
    ))[0]
    b = list(_run_fused_arrow_batches(
        iter([rb]), None, const, nwp0.copy(), nwp0.sum(axis=1),
        P, alpha, seed, 0, 3,
    ))[0]
    assert a.column("zs").to_pylist() == b.column("zs").to_pylist()
    assert a.column("dw").to_pylist() == b.column("dw").to_pylist()
    assert a.column("dp_old").to_pylist() == b.column("dp_old").to_pylist()
    assert a.column("dp_new").to_pylist() == b.column("dp_new").to_pylist()
