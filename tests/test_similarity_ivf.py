"""IVF ANN (operators/similarity.ivf_topk): exhaustive-degeneration
invariant, trained-quantizer recall, and cross-engine argmin stability of
the seeded codebook assignment."""

import numpy as np

from entitysummarization_spark.operators import similarity


def _clustered_emb(spark, n_per=20, n_clusters=3, dim=8, seed=7):
    """Deterministic well-separated gaussian clusters."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3.0
    rows, vid = [], 0
    for ci in range(n_clusters):
        for _ in range(n_per):
            v = centers[ci] + rng.randn(dim) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_full_probe_is_exhaustive(spark):
    # n_probe = n_cells degenerates to brute force: every query probes
    # every cell and every vector is filed somewhere, so the candidate set
    # is all pairs and the result must EQUAL the exact top-k.
    emb = _clustered_emb(spark)
    exact = similarity.cosine_topk(emb, emb, k=5)
    ivf = similarity.ivf_topk(emb, dim=8, k=5, n_cells=4, n_probe=4)
    assert sorted(map(tuple, ivf.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_ivf_kmeans_codebook_recall(spark):
    # the trained quantizer files each cluster into its own cell, so even
    # single-probe search keeps (near-)exact recall on separated clusters
    emb = _clustered_emb(spark)
    cb = similarity.kmeans_codebook(emb, n_cells=3, seed=42, max_iter=10)
    assert cb.shape == (3, 8)
    ivf = similarity.ivf_topk(emb, dim=8, k=5, codebook=cb, n_probe=1)
    exact = similarity.cosine_topk(emb, emb, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.9, recall


def test_ivf_assign_matches_numpy_argmin(spark):
    # the JVM-side v·v − 2·v·c + c·c fold must pick the same cell as a
    # NumPy argmin over true squared distances (the engine-portability
    # contract the DuckDB oracle relies on)
    emb = _clustered_emb(spark, n_per=10)
    cb = similarity.codebook_matrix(8, 4, seed=42)
    got = {
        r.id: r.cell
        for r in similarity.ivf_assign(emb, cb, n_probe=1).collect()
    }
    pdf = emb.toPandas()
    for _, row in pdf.iterrows():
        v = np.asarray(row.embedding, dtype=np.float64)
        d = ((cb - v) ** 2).sum(axis=1)
        assert got[row.vec_id] == int(np.argmin(d))
