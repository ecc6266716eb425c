"""Deterministic micro-corpora for the M-variant sampler certification.

Single source of truth shared by the driver-facing invariant queries
(``__spark_entry__.m3_invariants`` / ``m5_invariants`` / ``m6_invariants``)
and their pytest twins (tests/test_gibbs_m5.py, tests/test_ontopart_m6.py,
tests/test_gibbs_m3.py): both sides build their inputs from these helpers,
so a driver row and its bit-parity pytest are always exercising the same
corpus.

All generators are seeded ``np.random.RandomState`` — outputs are fixed
forever, which is what lets the DuckDB oracle side inline the expected
token totals as literals.
"""

from __future__ import annotations

import numpy as np

# ---- M6 ontoPart chained sampler (ontoPart/ontoPartModel.java:163-230
# intended semantics) -------------------------------------------------
M6_T, M6_C, M6_W, M6_D = 3, 4, 10, 6


def m6_corpus_rows() -> list[tuple[int, int, int]]:
    """(doc_id, word_id, freq) rows — 5 distinct words per doc, freq 1-3."""
    rng = np.random.RandomState(11)
    rows = []
    for d in range(M6_D):
        for w in rng.choice(M6_W, size=5, replace=False):
            rows.append((d, int(w), int(rng.randint(1, 4))))
    return rows


def m6_class_rows() -> list[tuple[int, int]]:
    """(class_id, word_id): word w may be emitted by classes
    {w%C, (w+1)%C} — every word has ≥2 candidate classes so the joint
    (topic, class) grid is non-trivial."""
    return sorted(
        {(w % M6_C, w) for w in range(M6_W)}
        | {((w + 1) % M6_C, w) for w in range(M6_W)}
    )


# ---- M5 SontoLDA TF-IDF β (sontoldamodel/SontoLDA.java:130-146) ------
M5_P, M5_W = 3, 6


def m5_corpus_rows() -> list[tuple[int, int, int]]:
    rng = np.random.RandomState(3)
    rows = []
    for d in range(5):
        for w in rng.choice(M5_W, size=4, replace=False):
            rows.append((d, int(w), int(rng.randint(1, 4))))
    return rows


def m5_cat_rows() -> list[tuple[int, int, int]]:
    """Category-word bags: topic t owns words {t, t+1, t+2} (mod W) with
    freq t+1+j — feeds operators.tfidf.tfidf_weight_matrix."""
    return [
        (t, (t + j) % M5_W, t + 1 + j) for t in range(M5_P) for j in range(3)
    ]


# ---- M4 EntLDA2 joint (entity, topic) sampler (enttopicmodel/
# EntLDA2.java:143-165) ------------------------------------------------
M4_T, M4_E, M4_W, M4_D = 3, 8, 10, 6


def m4_corpus_rows() -> list[tuple[int, int, int]]:
    """(doc_id, word_id, freq) rows — 4 distinct words per doc, freq 1-3.
    Doc M4_D-1 is generated but gets NO candidate entities below, so the
    reference's skip-forever branch (EntLDA2.java:126) is exercised."""
    rng = np.random.RandomState(17)
    rows = []
    for d in range(M4_D):
        for w in rng.choice(M4_W, size=4, replace=False):
            rows.append((d, int(w), int(rng.randint(1, 4))))
    return rows


def m4_ent_rows() -> list[tuple[int, int, int, float]]:
    """(doc_id, ent_id, rel_ent_id, sr) rows — the corpusConceptsSr.txt
    shape (EntLDA2.processCorpusEntityFile, :637-688): doc d mentions
    entities {d%E, (d+3)%E} except the last doc (no candidates); each
    mentioned entity lists 2 SR neighbours with deterministic weights."""
    rng = np.random.RandomState(29)
    rows = []
    for d in range(M4_D - 1):
        for e in (d % M4_E, (d + 3) % M4_E):
            for k in (1, 2):
                rel = (e + k) % M4_E
                rows.append((d, e, rel, float(np.round(rng.rand(), 3))))
    return rows


# ---- M7 LodLda contextual user×movie×feature LDA (lodlda/
# LodLda.java:645-676) --------------------------------------------------
M7_T, M7_U, M7_M, M7_F, M7_C = 3, 6, 8, 10, 5


def m7_rating_rows() -> list[tuple[int, int]]:
    """(user_id, movie_id) interaction records — 5 distinct movies per
    user (trainingset rows, LodLda.initializeParameters :746-776)."""
    rng = np.random.RandomState(41)
    rows = []
    for u in range(M7_U):
        for m in rng.choice(M7_M, size=5, replace=False):
            rows.append((u, int(m)))
    return rows


def m7_ctx_rows() -> list[tuple[int, int, int]]:
    """(movie_id, slot, feature_id) — each movie's fixed list of M7_C
    context features (movieContextMap, readMovieContextFile :830-854;
    features may repeat across slots, as in the file format)."""
    rng = np.random.RandomState(53)
    return [
        (m, s, int(rng.randint(M7_F)))
        for m in range(M7_M)
        for s in range(M7_C)
    ]


def m7_test_rows() -> list[tuple[int, int]]:
    """(user_id, movie_id) test-set rows — the reference scores the
    CROSS of the file's user set × movie set (:99-118)."""
    rng = np.random.RandomState(61)
    rows = []
    for u in (0, 2, 4):
        for m in rng.choice(M7_M, size=2, replace=False):
            rows.append((u, int(m)))
    return rows


# ---- M3 SR-smoothed α (enttopicmodel/EntLDA.java:319-338) ------------


def ring_edges(doc_ids) -> list[tuple[int, int]]:
    """Deterministic SR graph: ring over sorted doc ids, both directions."""
    ds = sorted(doc_ids)
    edges = []
    for i, d in enumerate(ds):
        nxt = ds[(i + 1) % len(ds)]
        edges += [(d, nxt), (nxt, d)]
    return edges


def grouped_corpus(rows) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """(doc_id, word_id, freq) rows → {doc_id: (word_ids, freqs)} in row
    order — the shape the NumPy sampler oracles consume."""
    corpus: dict[int, tuple[list[int], list[int]]] = {}
    for d, w, f in rows:
        ws, fs = corpus.setdefault(d, ([], []))
        ws.append(w)
        fs.append(f)
    return {
        d: (np.asarray(ws, dtype=np.int64), np.asarray(fs, dtype=np.int64))
        for d, (ws, fs) in corpus.items()
    }
