"""M6 ontoPartModel — chained topic→class→word collapsed Gibbs (SURVEY §2.8).

Re-expresses the INTENDED semantics of
/root/reference/TextProcessing/src/cs/uga/edu/ontoPart/ontoPartModel.java:
each token (a (predicate, object) "word" w of entity-document d) carries a
latent (topic t, ontology-class c) pair, with c restricted to the classes
that may emit w (classToWordMap, :98). The chained conditional the code
aims at (:195-228) is

    p(t, c | d, w) ∝ (Ntd[d][t] + α)                 # topic given doc
                   · (Nct[t][c] + β) / (Nt[t] + C·β)  # class given topic
                   · (Nwc[c][w] + ζ) / (Nc[c] + W·ζ)  # word given class

(the doc denominator (Nd[d]+T·α) is constant across the grid and drops).
The reference method is unrunnable as written — documented bugs we do NOT
reproduce (same policy as A5/W5, SURVEY §2.4):

  - :180 passes the WORD as `cid` and literal 7 as `wid`, so every token
    looks up classToWordMap.get(7);
  - :208-209 loops classes `c` but tests/indexes `ctr` (the topic);
  - :211 divides by Nt[did] (doc-indexed topic total), :215 by Nc[ctr]
    (topic-indexed class total);
  - :226-227 writes the sampled value into the PREDICATE array p[] and
    updates the predicate count matrices, so topic/class state never
    advances;
  - initializeMatrices/initializeGibbsSampling (:606-616,:550-568) never
    allocate or init Ntd/Nct/Nwc/t[].

We implement the intended grid sampler with both latents drawn JOINTLY
(one categorical over T × classes(w) — exact collapsed conditional; the
broken code's separate passes would be a pseudo-Gibbs approximation).
Posteriors follow computeTheta1/computePhi1/computeZeta (:383-406) with
the intended index/denominator fixes:
θ=(Ntd+α)/(Nd+T·α), φ=(Nct+β)/(Nt+C·β), ζ=(Nwc+ζ0)/(Nc+W·ζ0), all
4-decimal rounded like every reference posterior.

Distribution is the same AD-LDA scheme as models/gibbs.py: token state
partitioned by doc_id (doc-local Ntd exact), global Nct/Nwc broadcast per
sweep and updated partition-locally (stale across partitions), then
recomputed exactly from the new state. RNG is seeded per
(base_seed, sweep, doc) with a fixed draw order (init: one randint for t
then one for c per token; sweep: one rand per token), so a 1-partition
run is bit-identical to the NumPy oracle below.

Scale: only T×C + C×W counts cross the cluster (T, C are ontology-sized;
W is F10-pruned); token state never leaves its partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import native_kernel
from .gibbs import tokens_from_corpus
from .oracle import reseed, rng_for
from .state_lifecycle import CheckpointedStateLifecycle

STATE_SCHEMA = (
    "doc_id long, words array<long>, ts array<long>, cs array<long>"
)
# a sweep additionally emits the tokens whose (topic, class) assignment
# CHANGED so the count refresh aggregates deltas over changed tokens only
SWEEP_SCHEMA = STATE_SCHEMA + (
    ", dw array<long>, dto array<long>, dco array<long>,"
    " dtn array<long>, dcn array<long>"
)


@dataclass
class OntoPartConfig:
    n_topics: int
    n_classes: int
    n_words: int
    alpha: float | None = None
    beta: float = 0.01        # class-given-topic smoothing (BETA, :61)
    zeta: float = 0.01        # word-given-class smoothing (ZETA, :62)
    base_seed: int = 7
    n_partitions: int = 8
    # durable per-sweep checkpointing — see models/state_lifecycle.py
    reliable_checkpoint: bool = False
    # "native" = the runtime-compiled C grid kernel (bit-identical; falls
    # back to "python" where no C compiler exists); "python" = the
    # per-token NumPy loop the oracle parity tests arbitrate against
    kernel: str = "native"
    # >1 fuses that many sweeps into ONE Spark job (same scheme, anchors
    # and default-1 rationale as GibbsConfig.sweeps_per_job — see
    # gibbs.py; gates in test_ontopart_fused.py). Native path only.
    sweeps_per_job: int = 1

    @property
    def alpha_eff(self) -> float:
        # same 50/K convention as the other models (ModelParameters.java:41)
        return self.alpha if self.alpha is not None else 50.0 / self.n_topics


def _collect_cls_cand(class_word: DataFrame) -> dict[int, np.ndarray]:
    """word_id → sorted allowed class ids (classToWordMap inverted)."""
    pdf = (
        class_word.groupBy("word_id")
        .agg(F.sort_array(F.collect_set("class_id")).alias("cls"))
        .toPandas()
    )
    return {
        int(w): np.asarray(cs, dtype=np.int64)
        for w, cs in zip(pdf["word_id"], pdf["cls"])
    }


def _sample_token(
    rng_u: float,
    ntd: np.ndarray,          # T (doc-local, token removed)
    nct: np.ndarray,          # T × C
    nwc_w: np.ndarray,        # per-class count of THIS word (C-indexed slice)
    nt: np.ndarray,           # T
    nc: np.ndarray,           # C
    cls: np.ndarray,          # allowed classes for this word
    alpha: float,
    beta: float,
    zeta: float,
    C: int,
    W: int,
) -> tuple[int, int]:
    """One joint draw over the T × |cls| grid (t-major flatten)."""
    term_c = (nwc_w[cls] + zeta) / (nc[cls] + W * zeta)           # |cls|
    grid = (
        (ntd[:, None] + alpha)
        * (nct[:, cls] + beta) / (nt[:, None] + C * beta)
        * term_c[None, :]
    )
    cdf = np.cumsum(grid.ravel())
    u = rng_u * cdf[-1]
    flat = int(np.searchsorted(cdf, u, side="right").clip(0, cdf.size - 1))
    return flat // len(cls), int(cls[flat % len(cls)])


class OntoPartOracle:
    """Sequential NumPy reference for bit-parity tests (SURVEY §5)."""

    def __init__(
        self,
        corpus: dict[int, tuple[np.ndarray, np.ndarray]],  # doc → (word_ids, freqs)
        cls_cand: dict[int, np.ndarray],                   # word → allowed classes
        cfg: OntoPartConfig,
    ):
        from .oracle import doc_token_words

        self.cfg = cfg
        self.cls_cand = cls_cand
        T, C, W = cfg.n_topics, cfg.n_classes, cfg.n_words
        self.doc_ids = sorted(corpus)
        self.tokens = {d: doc_token_words(*corpus[d]) for d in self.doc_ids}
        self.nct = np.zeros((T, C), dtype=np.int64)
        self.nwc = np.zeros((C, W), dtype=np.int64)
        self.ntd = {d: np.zeros(T, dtype=np.int64) for d in self.doc_ids}
        self.ts: dict[int, np.ndarray] = {}
        self.cs: dict[int, np.ndarray] = {}
        for d in self.doc_ids:
            rng = rng_for(cfg.base_seed, -1, d)
            ws = self.tokens[d]
            t_arr = np.empty(len(ws), dtype=np.int64)
            c_arr = np.empty(len(ws), dtype=np.int64)
            for i, w in enumerate(ws):
                cls = cls_cand[int(w)]
                t = rng.randint(T)
                c = int(cls[rng.randint(len(cls))])
                t_arr[i], c_arr[i] = t, c
                self.ntd[d][t] += 1
                self.nct[t, c] += 1
                self.nwc[c, w] += 1
            self.ts[d], self.cs[d] = t_arr, c_arr
        self.nt = self.nct.sum(axis=1)
        self.nc = self.nwc.sum(axis=1)

    def sweep(self, sweep_idx: int) -> None:
        cfg = self.cfg
        T, C, W = cfg.n_topics, cfg.n_classes, cfg.n_words
        a, b, z0 = cfg.alpha_eff, cfg.beta, cfg.zeta
        for d in self.doc_ids:
            rng = rng_for(cfg.base_seed, sweep_idx, d)
            ws, ts, cs, ntd = self.tokens[d], self.ts[d], self.cs[d], self.ntd[d]
            for i in range(len(ws)):
                w, t_old, c_old = int(ws[i]), int(ts[i]), int(cs[i])
                ntd[t_old] -= 1
                self.nct[t_old, c_old] -= 1
                self.nwc[c_old, w] -= 1
                self.nt[t_old] -= 1
                self.nc[c_old] -= 1
                t_new, c_new = _sample_token(
                    rng.rand(), ntd, self.nct, self.nwc[:, w], self.nt,
                    self.nc, self.cls_cand[w], a, b, z0, C, W,
                )
                ts[i], cs[i] = t_new, c_new
                ntd[t_new] += 1
                self.nct[t_new, c_new] += 1
                self.nwc[c_new, w] += 1
                self.nt[t_new] += 1
                self.nc[c_new] += 1

    def run(self, n_sweeps: int) -> None:
        for s in range(n_sweeps):
            self.sweep(s)

    def posteriors(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(θ D×T, φ T×C, ζ C×W), 4-decimal rounded."""
        cfg = self.cfg
        a, b, z0 = cfg.alpha_eff, cfg.beta, cfg.zeta
        T, C, W = cfg.n_topics, cfg.n_classes, cfg.n_words
        theta = np.zeros((len(self.doc_ids), T))
        for row, d in enumerate(self.doc_ids):
            theta[row] = (self.ntd[d] + a) / (len(self.tokens[d]) + T * a)
        phi = (self.nct + b) / (self.nt[:, None] + C * b)
        zeta = (self.nwc + z0) / (self.nc[:, None] + W * z0)
        return np.round(theta, 4), np.round(phi, 4), np.round(zeta, 4)


def _onto_compiled_batches(
    batches, lib, csr, nct0, nwc0, T, C, W, alpha, beta, zeta, seed,
    sweep_idx, max_cls,
):
    """Arrow-batch loop for the compiled M6 kernel: flat token layout,
    one C call per batch (native_kernel.onto_sweep_batch). Same AD-LDA
    working copies and changed-token outputs as the python path."""
    cls_indptr, cls_data = csr
    nct_flat = nct0.ravel().copy()
    nwc_flat = nwc0.ravel().copy()
    nt = nct0.sum(axis=1)
    nc = nwc0.sum(axis=1)
    ntd_scratch = np.zeros(T, dtype=np.int64)
    termc_scratch = np.empty(max(max_cls, 1), dtype=np.float64)
    cdf_scratch = np.empty(max(T * max_cls, 1), dtype=np.float64)
    for b in batches:
        n = len(b)
        if n == 0:
            continue
        ws_list = [np.ascontiguousarray(x, dtype=np.int64) for x in b["words"]]
        lens = np.fromiter((x.size for x in ws_list), np.int64, n)
        doc_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_indptr[1:])
        ws_flat = np.concatenate(ws_list)
        ts_flat = np.concatenate([np.asarray(x, np.int64) for x in b["ts"]])
        cs_flat = np.concatenate([np.asarray(x, np.int64) for x in b["cs"]])
        seeds = (
            (seed * 1_000_003 + sweep_idx * 10_007
             + b["doc_id"].to_numpy(np.int64) * 131) % (2**32 - 1)
        ).astype(np.uint32)
        ch_w, ch_to, ch_co, ch_tn, ch_cn, ch_counts = (
            native_kernel.onto_sweep_batch_native(
                lib, doc_indptr, ws_flat, ts_flat, cs_flat, seeds, T, C, W,
                nct_flat, nwc_flat, nt, nc, cls_indptr, cls_data,
                alpha, beta, zeta, ntd_scratch, termc_scratch, cdf_scratch,
            )
        )
        ch_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ch_counts, out=ch_indptr[1:])
        yield pd.DataFrame({
            "doc_id": b["doc_id"],
            "words": b["words"],
            "ts": np.split(ts_flat, doc_indptr[1:-1]),
            "cs": np.split(cs_flat, doc_indptr[1:-1]),
            "dw": np.split(ch_w, ch_indptr[1:-1]),
            "dto": np.split(ch_to, ch_indptr[1:-1]),
            "dco": np.split(ch_co, ch_indptr[1:-1]),
            "dtn": np.split(ch_tn, ch_indptr[1:-1]),
            "dcn": np.split(ch_cn, ch_indptr[1:-1]),
        })


def _onto_arrow_batches(
    batches, lib, csr, nct0, nwc0, T, C, W, alpha, beta, zeta, seed,
    sweep_idx, max_cls,
):
    """mapInArrow loop for the compiled M6 kernel — same zero-copy layout
    trick as gibbs._run_arrow_batches: Arrow list columns already store
    the flat values buffer + offsets the C kernel consumes, so no per-doc
    Python and no pandas materialization. Output reuses the input words
    column; ts/cs/changed-token outputs are rewrapped by offset."""
    import pyarrow as pa

    cls_indptr, cls_data = csr
    nct_flat = nct0.ravel().copy()
    nwc_flat = nwc0.ravel().copy()
    nt = nct0.sum(axis=1)
    nc = nwc0.sum(axis=1)
    ntd_scratch = np.zeros(T, dtype=np.int64)
    termc_scratch = np.empty(max(max_cls, 1), dtype=np.float64)
    cdf_scratch = np.empty(max(T * max_cls, 1), dtype=np.float64)
    for rb in batches:
        n = rb.num_rows
        if n == 0:
            continue
        doc_ids = rb.column(0).to_numpy(zero_copy_only=False)
        words_col = rb.column(1)
        offsets32 = words_col.offsets.to_numpy(zero_copy_only=False)
        doc_indptr = (offsets32 - offsets32[0]).astype(np.int64)
        ws_flat = np.ascontiguousarray(
            words_col.flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        # writable copies — the kernel mutates both in place
        ts_flat = np.array(
            rb.column(2).flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        cs_flat = np.array(
            rb.column(3).flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        seeds = (
            (seed * 1_000_003 + sweep_idx * 10_007
             + doc_ids.astype(np.int64) * 131) % (2**32 - 1)
        ).astype(np.uint32)
        ch_w, ch_to, ch_co, ch_tn, ch_cn, ch_counts = (
            native_kernel.onto_sweep_batch_native(
                lib, doc_indptr, ws_flat, ts_flat, cs_flat, seeds, T, C, W,
                nct_flat, nwc_flat, nt, nc, cls_indptr, cls_data,
                alpha, beta, zeta, ntd_scratch, termc_scratch, cdf_scratch,
            )
        )
        ch_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(ch_counts, out=ch_off[1:], dtype=np.int32)
        off32 = doc_indptr.astype(np.int32)

        def lst(off, vals):
            return pa.ListArray.from_arrays(pa.array(off), pa.array(vals))

        yield pa.RecordBatch.from_arrays(
            [rb.column(0), words_col, lst(off32, ts_flat),
             lst(off32, cs_flat), lst(ch_off, ch_w), lst(ch_off, ch_to),
             lst(ch_off, ch_co), lst(ch_off, ch_tn), lst(ch_off, ch_cn)],
            names=["doc_id", "words", "ts", "cs",
                   "dw", "dto", "dco", "dtn", "dcn"],
        )


def _onto_fused_sweep_py(
    doc_indptr, doc_ids, ws_flat, ts_flat, cs_flat, nct, nwc, nt, nc,
    cand, T, C, W, alpha, beta, zeta, seed, sweep_idx,
):
    """Interpreted twin of one fused M6 sweep over a buffered batch's
    flat arrays — the SAME per-token loop the unfused python kernel runs
    (bit-identical to the C kernel by the existing parity tests), so a
    compiler-less executor agrees with native mid-block. Mutates
    ts/cs/nct/nwc/nt/nc in place; returns the change tuple."""
    rng0 = np.random.RandomState(0)
    n_docs = len(doc_indptr) - 1
    ch_w, ch_to, ch_co, ch_tn, ch_cn = [], [], [], [], []
    ch_counts = np.zeros(n_docs, dtype=np.int64)
    for j in range(n_docs):
        lo, hi = int(doc_indptr[j]), int(doc_indptr[j + 1])
        ts = ts_flat[lo:hi]
        ntd = np.bincount(ts, minlength=T).astype(np.int64)
        rng = reseed(rng0, seed, sweep_idx, int(doc_ids[j]))
        n_ch = 0
        for i in range(lo, hi):
            w, t_old, c_old = int(ws_flat[i]), int(ts_flat[i]), int(cs_flat[i])
            ntd[t_old] -= 1
            nct[t_old, c_old] -= 1
            nwc[c_old, w] -= 1
            nt[t_old] -= 1
            nc[c_old] -= 1
            t_new, c_new = _sample_token(
                rng.rand(), ntd, nct, nwc[:, w], nt, nc,
                cand[w], alpha, beta, zeta, C, W,
            )
            ts_flat[i], cs_flat[i] = t_new, c_new
            ntd[t_new] += 1
            nct[t_new, c_new] += 1
            nwc[c_new, w] += 1
            nt[t_new] += 1
            nc[c_new] += 1
            if t_new != t_old or c_new != c_old:
                ch_w.append(w)
                ch_to.append(t_old)
                ch_co.append(c_old)
                ch_tn.append(t_new)
                ch_cn.append(c_new)
                n_ch += 1
        ch_counts[j] = n_ch
    as_arr = (np.asarray(x, dtype=np.int64) for x in
              (ch_w, ch_to, ch_co, ch_tn, ch_cn))
    return (*as_arr, ch_counts)


def _onto_fused_arrow_batches(
    batches, lib, csr, nct0, nwc0, T, C, W, alpha, beta, zeta, seed,
    sweep0, k, max_cls,
):
    """K fused M6 sweeps in ONE mapInArrow pass — the ontoPart twin of
    gibbs._run_fused_arrow_batches, same scheme and anchors: partition-
    local nct/nwc carry across the K sweeps (AD-LDA staleness extended
    from within-a-sweep to within-a-block); bit-identical to unfused at
    n_partitions=1; every sweep's (topic, class) deltas are emitted
    per-doc sweep-ordered so the driver's delta aggregation reconstructs
    the EXACT global counts at the block boundary (test_ontopart_fused).
    RNG is per (seed, sweep, doc) — fusion never changes the random
    numbers, only intermediate count freshness. ``lib`` None degrades to
    the interpreted per-token twin, bit-identical per sweep."""
    import pyarrow as pa

    from .gibbs import _interleave_doc_delta_cols

    cls_indptr, cls_data = csr
    nct_w = nct0.copy()
    nwc_w = nwc0.copy()
    nct_flat = nct_w.ravel()   # views: both kernels mutate ONE state
    nwc_flat = nwc_w.ravel()
    nt = nct_w.sum(axis=1)
    nc = nwc_w.sum(axis=1)
    ntd_scratch = np.zeros(T, dtype=np.int64)
    termc_scratch = np.empty(max(max_cls, 1), dtype=np.float64)
    cdf_scratch = np.empty(max(T * max_cls, 1), dtype=np.float64)
    cand = None
    if lib is None:
        cand = {
            w: cls_data[cls_indptr[w]:cls_indptr[w + 1]]
            for w in range(len(cls_indptr) - 1)
        }

    buf = []  # (doc_col, words_col, doc_ids, doc_indptr, ws, ts, cs)
    for rb in batches:
        if rb.num_rows == 0:
            continue
        words_col = rb.column(1)
        offsets32 = words_col.offsets.to_numpy(zero_copy_only=False)
        buf.append((
            rb.column(0),
            words_col,
            rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64),
            (offsets32 - offsets32[0]).astype(np.int64),
            np.ascontiguousarray(
                words_col.flatten().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            ),
            np.array(rb.column(2).flatten().to_numpy(zero_copy_only=False),
                     dtype=np.int64),
            np.array(rb.column(3).flatten().to_numpy(zero_copy_only=False),
                     dtype=np.int64),
        ))

    deltas = [[] for _ in buf]  # per batch: per-sweep (cols, counts)
    for s in range(k):
        sweep_idx = sweep0 + s
        for j, (_, _, doc_ids, doc_indptr, ws_flat, ts_flat, cs_flat) in (
            enumerate(buf)
        ):
            if lib is not None:
                seeds = (
                    (seed * 1_000_003 + sweep_idx * 10_007 + doc_ids * 131)
                    % (2**32 - 1)
                ).astype(np.uint32)
                ch = native_kernel.onto_sweep_batch_native(
                    lib, doc_indptr, ws_flat, ts_flat, cs_flat, seeds,
                    T, C, W, nct_flat, nwc_flat, nt, nc,
                    cls_indptr, cls_data, alpha, beta, zeta,
                    ntd_scratch, termc_scratch, cdf_scratch,
                )
            else:
                ch = _onto_fused_sweep_py(
                    doc_indptr, doc_ids, ws_flat, ts_flat, cs_flat,
                    nct_w, nwc_w, nt, nc, cand, T, C, W,
                    alpha, beta, zeta, seed, sweep_idx,
                )
            deltas[j].append((ch[:5], ch[5]))

    def lst(off, vals):
        return pa.ListArray.from_arrays(pa.array(off), pa.array(vals))

    for (doc_col, words_col, _, doc_indptr, _, ts_flat, cs_flat), ps in (
        zip(buf, deltas)
    ):
        n = len(doc_indptr) - 1
        cols, ch_off = _interleave_doc_delta_cols(n, ps)
        off32 = doc_indptr.astype(np.int32)
        co32 = ch_off.astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [doc_col, words_col, lst(off32, ts_flat), lst(off32, cs_flat)]
            + [lst(co32, c) for c in cols],
            names=["doc_id", "words", "ts", "cs",
                   "dw", "dto", "dco", "dtn", "dcn"],
        )


class DistributedOntoPart(CheckpointedStateLifecycle):
    """Driver-side sweep loop, AD-LDA over DataFrame token state.

        m = DistributedOntoPart(spark, corpus_df, class_word_df, cfg)
        m.run(n_sweeps)
        theta, phi, zeta = m.theta(), m.phi(), m.zeta()
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,          # doc_id, word_id, freq
        class_word: DataFrame,      # class_id, word_id (classToWordMap)
        cfg: OntoPartConfig,
    ):
        self.spark = spark
        self.cfg = cfg
        self.cls_cand = _collect_cls_cand(class_word)
        self.kernel = cfg.kernel
        if self.kernel == "native" and not native_kernel.native_available():
            import warnings

            warnings.warn(
                "OntoPart kernel='native': no C compiler — using 'python'"
                " (bit-identical, slower)", stacklevel=2,
            )
            self.kernel = "python"
        if self.kernel == "native":
            self._csr = native_kernel.cand_to_csr(
                self.cls_cand, cfg.n_words
            )
            self._max_cls = (
                int(np.diff(self._csr[0]).max()) if self.cls_cand else 1
            )
        self.corpus = corpus
        self.state: DataFrame | None = None
        self.nct: np.ndarray | None = None
        self.nwc: np.ndarray | None = None
        self.sweeps_done = 0
        self._init_state_lifecycle()  # checkpoint/broadcast discipline

    def init_state(self) -> None:
        cfg = self.cfg
        toks = tokens_from_corpus(self.corpus)
        cand_bc = self.spark.sparkContext.broadcast(self.cls_cand)
        T, seed = cfg.n_topics, cfg.base_seed

        def init_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cand = cand_bc.value
            rng0 = np.random.RandomState(0)
            for b in batches:
                ts_col, cs_col = [], []
                for d, ws in zip(b["doc_id"], b["words"]):
                    rng = reseed(rng0, seed, -1, int(d))
                    n = len(ws)
                    t_arr = np.empty(n, dtype=np.int64)
                    c_arr = np.empty(n, dtype=np.int64)
                    for i, w in enumerate(np.asarray(ws, dtype=np.int64)):
                        cls = cand[int(w)]
                        t_arr[i] = rng.randint(T)
                        c_arr[i] = cls[rng.randint(len(cls))]
                    ts_col.append(t_arr)
                    cs_col.append(c_arr)
                yield pd.DataFrame(
                    {"doc_id": b["doc_id"], "words": b["words"],
                     "ts": ts_col, "cs": cs_col}
                )

        self.state = self._local_checkpoint(
            toks.repartition(cfg.n_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
            .mapInPandas(init_fn, STATE_SCHEMA),
            reliable=cfg.reliable_checkpoint,
        )
        self._refresh_global_counts()
        self._destroy_broadcast_now(cand_bc)
        self.sweeps_done = 0

    def _refresh_global_counts(self) -> None:
        cfg = self.cfg
        ex = self.state.select(
            F.explode(F.arrays_zip("ts", "cs", "words")).alias("x")
        ).select(
            F.col("x.ts").alias("t"),
            F.col("x.cs").alias("c"),
            F.col("x.words").alias("w"),
        ).persist()
        tc = ex.groupBy("t", "c").count().toPandas()
        cw = ex.groupBy("c", "w").count().toPandas()
        ex.unpersist()
        nct = np.zeros((cfg.n_topics, cfg.n_classes), dtype=np.int64)
        nct[tc["t"].to_numpy(np.int64), tc["c"].to_numpy(np.int64)] = (
            tc["count"].to_numpy(np.int64)
        )
        nwc = np.zeros((cfg.n_classes, cfg.n_words), dtype=np.int64)
        nwc[cw["c"].to_numpy(np.int64), cw["w"].to_numpy(np.int64)] = (
            cw["count"].to_numpy(np.int64)
        )
        self.nct, self.nwc = nct, nwc

    def _apply_count_deltas(self) -> None:
        """Refresh nct/nwc from the sweep's changed tokens only — the
        same exact-by-induction integer-delta scheme as
        gibbs._apply_count_deltas (bit-parity tests arbitrate); the old
        refresh exploded and double-aggregated every token every sweep.
        Absolute recompute (_refresh_global_counts) stays the init path
        and the arbiter."""
        deltas = (
            self.state.select(
                F.explode(
                    F.arrays_zip("dw", "dto", "dco", "dtn", "dcn")
                ).alias("x")
            )
            .groupBy(
                F.col("x.dw").alias("w"),
                F.col("x.dto").alias("to"),
                F.col("x.dco").alias("co"),
                F.col("x.dtn").alias("tn"),
                F.col("x.dcn").alias("cn"),
            )
            .count()
            .toPandas()
        )
        if len(deltas):
            w = deltas["w"].to_numpy(np.int64)
            n = deltas["count"].to_numpy(np.int64)
            to = deltas["to"].to_numpy(np.int64)
            co = deltas["co"].to_numpy(np.int64)
            tn = deltas["tn"].to_numpy(np.int64)
            cn = deltas["cn"].to_numpy(np.int64)
            np.add.at(self.nct, (to, co), -n)
            np.add.at(self.nct, (tn, cn), n)
            np.add.at(self.nwc, (co, w), -n)
            np.add.at(self.nwc, (cn, w), n)

    def sweep(self, n_fused: int = 1) -> None:
        cfg = self.cfg
        sweep_idx = self.sweeps_done
        kernel = self.kernel
        if n_fused > 1 and kernel != "native":
            raise ValueError("fused sweeps require kernel='native'")
        # the compiled kernel ships CSR-packed candidates; the python
        # kernel the dict (an executor whose compile fails rebuilds the
        # dict from the CSR — cheap, and every kernel is bit-identical)
        cand_payload = self._csr if kernel == "native" else self.cls_cand
        bc = self.spark.sparkContext.broadcast(
            (self.nct, self.nwc, cand_payload)
        )
        T, C, W = cfg.n_topics, cfg.n_classes, cfg.n_words
        a, b, z0, seed = cfg.alpha_eff, cfg.beta, cfg.zeta, cfg.base_seed
        max_cls = self._max_cls if kernel == "native" else 0

        def sweep_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nct, nwc, cand = bc.value
            kern = kernel
            lib = None
            if kern == "native":
                lib = native_kernel.load_native()
                if lib is None:  # degrade: rebuild the dict from the CSR
                    indptr, data = cand
                    cand = {
                        w: data[indptr[w]:indptr[w + 1]]
                        for w in range(len(indptr) - 1)
                    }
                    kern = "python"
            if kern == "native":
                yield from _onto_compiled_batches(
                    batches, lib, cand, nct, nwc, T, C, W, a, b, z0,
                    seed, sweep_idx, max_cls,
                )
                return
            nct = nct.copy()      # partition-local working copies (AD-LDA)
            nwc = nwc.copy()
            nt = nct.sum(axis=1)
            nc = nwc.sum(axis=1)
            rng0 = np.random.RandomState(0)
            for batch in batches:
                ts_col, cs_col = [], []
                dw_c, dto_c, dco_c, dtn_c, dcn_c = [], [], [], [], []
                for d, ws, ts, cs in zip(
                    batch["doc_id"], batch["words"], batch["ts"], batch["cs"]
                ):
                    ch = ([], [], [], [], [])
                    ws = np.asarray(ws, dtype=np.int64)
                    ts = np.asarray(ts, dtype=np.int64).copy()
                    cs = np.asarray(cs, dtype=np.int64).copy()
                    ntd = np.bincount(ts, minlength=T).astype(np.int64)
                    rng = reseed(rng0, seed, sweep_idx, int(d))
                    for i in range(len(ws)):
                        w, t_old, c_old = int(ws[i]), int(ts[i]), int(cs[i])
                        ntd[t_old] -= 1
                        nct[t_old, c_old] -= 1
                        nwc[c_old, w] -= 1
                        nt[t_old] -= 1
                        nc[c_old] -= 1
                        t_new, c_new = _sample_token(
                            rng.rand(), ntd, nct, nwc[:, w], nt, nc,
                            cand[w], a, b, z0, C, W,
                        )
                        ts[i], cs[i] = t_new, c_new
                        ntd[t_new] += 1
                        nct[t_new, c_new] += 1
                        nwc[c_new, w] += 1
                        nt[t_new] += 1
                        nc[c_new] += 1
                        if t_new != t_old or c_new != c_old:
                            ch[0].append(w)
                            ch[1].append(t_old)
                            ch[2].append(c_old)
                            ch[3].append(t_new)
                            ch[4].append(c_new)
                    ts_col.append(ts)
                    cs_col.append(cs)
                    for col, vals in zip(
                        (dw_c, dto_c, dco_c, dtn_c, dcn_c), ch
                    ):
                        col.append(np.asarray(vals, dtype=np.int64))
                yield pd.DataFrame(
                    {"doc_id": batch["doc_id"], "words": batch["words"],
                     "ts": ts_col, "cs": cs_col, "dw": dw_c, "dto": dto_c,
                     "dco": dco_c, "dtn": dtn_c, "dcn": dcn_c}
                )

        def sweep_fn_arrow(batches):
            # Arrow-native twin of sweep_fn for the C kernel: falls back
            # to the pandas path only if this executor cannot compile
            # (then via the python kernel — bit-identical)
            lib = native_kernel.load_native()
            if n_fused > 1:
                # the fused runner handles lib=None itself (interpreted
                # per-token twin — bit-identical per sweep)
                nct, nwc, cand = bc.value
                yield from _onto_fused_arrow_batches(
                    batches, lib, cand, nct, nwc, T, C, W, a, b, z0,
                    seed, sweep_idx, n_fused, max_cls,
                )
                return
            if lib is None:
                import pyarrow as pa

                def as_pandas():
                    for rb in batches:
                        yield pa.Table.from_batches([rb]).to_pandas()

                for pdf_out in sweep_fn(as_pandas()):
                    yield pa.RecordBatch.from_pandas(pdf_out)
                return
            nct, nwc, cand = bc.value
            yield from _onto_arrow_batches(
                batches, lib, cand, nct, nwc, T, C, W, a, b, z0,
                seed, sweep_idx, max_cls,
            )

        old = self.state
        base = old.select("doc_id", "words", "ts", "cs")
        # the native path goes through mapInArrow — zero-copy flat token
        # buffers straight into the C kernel (see _onto_arrow_batches)
        if kernel == "native":
            swept = base.sortWithinPartitions("doc_id").mapInArrow(
                sweep_fn_arrow, SWEEP_SCHEMA
            )
        else:
            swept = base.sortWithinPartitions("doc_id").mapInPandas(
                sweep_fn, SWEEP_SCHEMA
            )
        # lazy local checkpoint — materialized by the delta aggregation
        # (one job per sweep); old state released after that job (see
        # gibbs.sweep for the full rationale)
        new_state = self._local_checkpoint(
            swept, reliable=cfg.reliable_checkpoint, eager=False,
        )
        self.state = new_state
        self.sweeps_done += n_fused
        self._apply_count_deltas()
        self._finalize_lazy_checkpoint()
        self._release_old_state(old)
        self._retire_broadcast(bc)

    def close(self) -> None:
        """Release the pending per-sweep broadcast retirement (the M6
        twin of DistributedGibbs.close; M6 holds no long-lived const
        broadcast)."""
        self._retire_broadcast(None)

    def run(self, n_sweeps: int) -> None:
        if self.state is None:
            self.init_state()
        k = max(1, int(getattr(self.cfg, "sweeps_per_job", 1)))
        if k > 1 and self.kernel != "native":
            import warnings

            warnings.warn(
                "sweeps_per_job>1 applies only to the native kernel; "
                "sweeping one per job", stacklevel=2,
            )
            k = 1
        done = 0
        while done < n_sweeps:
            step = min(k, n_sweeps - done)
            self.sweep(n_fused=step)
            done += step

    # ---- posteriors ----
    def theta(self) -> DataFrame:
        """θ(doc_id, topic) = round((Ntd+α)/(Nd+T·α), 4), distributed."""
        cfg = self.cfg
        a, T = cfg.alpha_eff, cfg.n_topics
        nd = self.state.select("doc_id", F.size("words").alias("nd"))
        ntd = (
            self.state.select("doc_id", F.explode("ts").alias("topic"))
            .groupBy("doc_id", "topic")
            .agg(F.count("*").alias("ntd"))
        )
        return ntd.join(nd, "doc_id").select(
            "doc_id",
            "topic",
            F.round(
                (F.col("ntd") + F.lit(a)) / (F.col("nd") + F.lit(T * a)), 4
            ).alias("theta"),
        )

    def phi(self) -> np.ndarray:
        """φ T×C = round((Nct+β)/(Nt+C·β), 4) — dense, driver-side (small)."""
        cfg = self.cfg
        nt = self.nct.sum(axis=1)
        return np.round(
            (self.nct + cfg.beta) / (nt[:, None] + cfg.n_classes * cfg.beta), 4
        )

    def zeta(self) -> np.ndarray:
        """ζ C×W = round((Nwc+ζ0)/(Nc+W·ζ0), 4) — dense, driver-side."""
        cfg = self.cfg
        nc = self.nwc.sum(axis=1)
        return np.round(
            (self.nwc + cfg.zeta) / (nc[:, None] + cfg.n_words * cfg.zeta), 4
        )

    def z_state(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        pdf = self.state.select("doc_id", "ts", "cs").toPandas()
        return {
            int(d): (np.asarray(t, dtype=np.int64), np.asarray(c, dtype=np.int64))
            for d, t, c in zip(pdf["doc_id"], pdf["ts"], pdf["cs"])
        }
