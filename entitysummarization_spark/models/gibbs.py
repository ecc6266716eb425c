"""Distributed constrained collapsed Gibbs — AD-LDA over DataFrame state.

The reference's sampler is one sequential loop over all N tokens per sweep
(src/cs/uga/edu/esum/EntSumModel.java:133-192) with dense in-place count
matrices. Distributed, that becomes the AD-LDA scheme (Newman et al. 2009,
"Distributed Algorithms for Topic Models", JMLR — public):

  - token state lives PARTITIONED: one row per doc
    ``(doc_id, words: array<long>, zs: array<long>)``; doc-local counts
    (Npd, Nd) are exact because a doc never splits across partitions;
  - global counts (Nwp P×W, Np) are broadcast each sweep and updated
    LOCALLY within a partition while it sweeps (stale across partitions —
    the standard AD-LDA approximation), then recomputed exactly from the
    new z-state by a groupBy and re-broadcast;
  - RNG is seeded per (base_seed, sweep, doc) — independent of
    partitioning — so a 1-partition run is bit-identical to the NumPy
    oracle (models/oracle.py) and any-partition runs are reproducible.

Scale: only P×W counts ever reach the driver (bounded by the F10
vocabulary prune); token state is never collected. Per sweep: one
mapInPandas pass (no shuffle — partitioning by doc_id is established once
and reused) + one aggregation to refresh global counts. Each sweep's
state is localCheckpoint-ed (lineage truncation: O(1) plan size and the
per-sweep count broadcast becomes destroyable — at 1000 sweeps an
undestroyed broadcast per sweep is an unbounded leak; the soak test in
test_gibbs_kernels.py runs 100+ sweeps asserting both stay flat).
Checkpoint/resume per north_rule: plans/checkpoint.py.

Four doc-sweep kernels, bit-identical by construction (same seeded-RNG
contract, same IEEE op order): _sweep_doc_reference is the per-token
NumPy transcription the oracle parity tests arbitrate against;
_sweep_doc_fast replaces the per-token tiny-array NumPy dispatches with
cached-per-word scalar arithmetic for ~5× sweep throughput; "native"
(the default where a C compiler exists — models/native_kernel.py) and
"numba" (models/numba_kernel.py, jitted only where numba is installed)
compile the same loop to machine code, called once per Arrow batch.
GibbsConfig.kernel selects; unavailable kernels degrade explicitly
(native→fast, numba→interpreted twin), and because every kernel is
bit-identical a heterogeneous-cluster mix of fallbacks still produces
the same chain. tests/test_gibbs_kernels.py arbitrates all of them
against the reference kernel on z-chain AND count-matrix equality.

Broadcast discipline: sweep-CONSTANT inputs (candidate CSR, λ·β, Σλβ)
ship once per sampler in ``_const_bc``; the per-sweep broadcast carries
only the refreshed (Nwp, Np) counts. At reference scale the constants
(λ is a dense P×W float64) dominate, so rebroadcasting them every sweep
— as rounds ≤4 did — multiplied network cost by the sweep count.
"""

from __future__ import annotations

import warnings
from bisect import bisect_right
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import native_kernel, numba_kernel
from .oracle import alpha_from_neighbors, reseed
from .state_lifecycle import CheckpointedStateLifecycle

STATE_SCHEMA = "doc_id long, words array<long>, zs array<long>"
# a sweep additionally emits the tokens whose topic CHANGED (word, old
# pred, new pred) so the global-count refresh can aggregate deltas over
# changed tokens only instead of shuffling every token every sweep
SWEEP_SCHEMA = (
    STATE_SCHEMA + ", dw array<long>, dp_old array<long>, dp_new array<long>"
)


def _sweep_doc_reference(
    ws, zs, nd, nwp, np_, cand, lam, slb, beta, alpha, av, a_sum, rng
):
    """Per-token NumPy kernel — the arbiter both the NumPy oracle and the
    fast kernel are held bit-identical to (EntSumModel.java:133-192
    semantics). One rng.rand() per token, CDF over the word's candidate
    predicates, in-place count updates. Mutates zs/nd/nwp/np_; returns the
    changed-token lists (word, old pred, new pred) for the delta-based
    global-count refresh."""
    ndoc = len(ws)
    use_m3 = av is not None
    ch_w: list = []
    ch_old: list = []
    ch_new: list = []
    for i in range(ndoc):
        w, p_old = int(ws[i]), int(zs[i])
        nd[p_old] -= 1
        nwp[p_old, w] -= 1
        np_[p_old] -= 1
        c = cand[w]
        a_c = av[c] if use_m3 else alpha
        probs = (
            (nd[c] + a_c) / (ndoc - 1 + a_sum)
            * (nwp[c, w] + lam[c, w] * beta)
            / (np_[c] + slb[c])
        )
        cdf = np.cumsum(probs)
        u = rng.rand() * cdf[-1]
        p_new = int(
            c[int(np.searchsorted(cdf, u, side="right").clip(0, len(c) - 1))]
        )
        zs[i] = p_new
        nd[p_new] += 1
        nwp[p_new, w] += 1
        np_[p_new] += 1
        if p_new != p_old:
            ch_w.append(w)
            ch_old.append(p_old)
            ch_new.append(p_new)
    return ch_w, ch_old, ch_new


def _sweep_doc_fast(
    ws_l, zs_l, nd, nwp_flat, np_l, W, word_cache, cand, lam, slb, beta,
    alpha, av, a_sum, rng
):
    """Scalar-Python twin of _sweep_doc_reference, BIT-IDENTICAL by
    construction (test_gibbs_kernels.py asserts it):

      - rng.rand(ndoc) pre-draws the token uniforms — MT19937 emits the
        same double sequence batched or one-at-a-time;
      - each candidate's probability is computed with the exact IEEE-754
        op order of the reference's elementwise expression, and the
        running CDF sum reproduces np.cumsum's sequential accumulation
        (0.0 + x == x exactly, probabilities are non-negative);
      - bisect_right == np.searchsorted(side="right").

    Why it is faster (~5×): the reference pays ~6 NumPy dispatches on
    len(c)-sized arrays PER TOKEN (µs each on tiny arrays); here the
    candidate loop is plain-float arithmetic over per-word cached lists
    (candidates, flat nwp offsets, λ·β, Σλβ — all sweep-constant), and the
    only NumPy touched per token is two flat int64 reads/writes. Mutates
    zs_l/nd/np_l (python lists) and nwp_flat (flat int64) in place;
    returns the changed-token lists (word, old pred, new pred)."""
    ndoc = len(ws_l)
    denom = ndoc - 1 + a_sum
    # .tolist() / int()/float() conversions are bit-exact; keeping every
    # operand a plain python float/int matters because np.float64 SCALAR
    # arithmetic pays a ufunc dispatch (~10× a float op) per operation
    us = rng.rand(ndoc).tolist()
    a_l = av.tolist() if av is not None else None
    item = nwp_flat.item
    ch_w: list = []
    ch_old: list = []
    ch_new: list = []
    for i in range(ndoc):
        w = ws_l[i]
        p_old = zs_l[i]
        nd[p_old] -= 1
        np_l[p_old] -= 1
        nwp_flat[p_old * W + w] -= 1
        ent = word_cache.get(w)
        if ent is None:
            c_l = [int(x) for x in cand[w]]
            ent = (
                c_l,
                list(zip(
                    c_l,
                    [cj * W + w for cj in c_l],
                    [float(lam[cj, w]) * beta for cj in c_l],
                    [float(slb[cj]) for cj in c_l],
                )),
            )
            word_cache[w] = ent
        c_l, rows = ent
        total = 0.0
        cdf = []
        push = cdf.append
        if a_l is None:
            for cj, off, lb, sl in rows:
                total = total + (
                    (nd[cj] + alpha) / denom
                    * (item(off) + lb)
                    / (np_l[cj] + sl)
                )
                push(total)
        else:
            for cj, off, lb, sl in rows:
                total = total + (
                    (nd[cj] + a_l[cj]) / denom
                    * (item(off) + lb)
                    / (np_l[cj] + sl)
                )
                push(total)
        u = us[i] * total
        k = bisect_right(cdf, u)
        last = len(c_l) - 1
        if k > last:
            k = last
        p_new = c_l[k]
        zs_l[i] = p_new
        nd[p_new] += 1
        np_l[p_new] += 1
        nwp_flat[p_new * W + w] += 1
        if p_new != p_old:
            ch_w.append(w)
            ch_old.append(p_old)
            ch_new.append(p_new)
    return ch_w, ch_old, ch_new


def _m3_alpha_rows(nbr_col, P: float, alpha: float, eps: float):
    """Rebuild each doc's SR-smoothed α vector from the joined neighbor
    payload — identical input order to the oracle (see sweep())."""
    for nbrs in nbr_col:
        tup = []
        entries = nbrs if isinstance(nbrs, (list, np.ndarray)) else []
        for e in entries:
            pn = e["pn"]
            if pn is None or len(pn) == 0:
                pn = []
            tup.append((
                int(e["nbr"]),
                int(e["nd"]),
                np.asarray([x["p"] for x in pn], dtype=np.int64),
                np.asarray([x["n"] for x in pn], dtype=np.int64),
            ))
        yield alpha_from_neighbors(tup, P, alpha, eps)


def _run_arrow_batches(
    batches, lib, const, nwp, np_, P, alpha, seed, sweep_idx,
):
    """mapInArrow loop for the native kernel (M1/M2/M5 path): Arrow list
    columns already hold a FLAT values buffer + offsets, which is
    exactly the kernel's input layout — so tokens go Arrow→C with
    zero-copy reads and no per-doc Python at all (the pandas path pays
    O(docs) concatenate/split; at ~10-token docs that rivaled the
    kernel itself). Output reuses the input words column unchanged and
    wraps the kernel's flat outputs back into ListArrays by offset."""
    import pyarrow as pa

    W = nwp.shape[1]
    nwp_flat = nwp.ravel().copy()
    np_arr = np_.copy()
    csr_indptr = const["csr_indptr"]
    csr_data = const["csr_data"]
    lam_beta = const["lam_beta"]
    slb = np.ascontiguousarray(const["slb"])
    nd_scratch = np.zeros(P, dtype=np.int64)
    cdf_scratch = np.empty(max(int(const["max_cand"]), 1), dtype=np.float64)
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
        zs_flat = np.array(
            rb.column(2).flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )  # writable copy — the kernel mutates in place
        seeds = (
            (seed * 1_000_003 + sweep_idx * 10_007
             + doc_ids.astype(np.int64) * 131) % (2**32 - 1)
        ).astype(np.uint32)
        ch_w, ch_old, ch_new, ch_counts = native_kernel.sweep_batch_native(
            lib, doc_indptr, ws_flat, zs_flat, seeds, P, W, nwp_flat,
            np_arr, csr_indptr, csr_data, lam_beta, slb, alpha,
            None, None, nd_scratch, cdf_scratch,
        )
        ch_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(ch_counts, out=ch_off[1:], dtype=np.int32)

        def lst(off, vals):
            return pa.ListArray.from_arrays(pa.array(off), pa.array(vals))

        yield pa.RecordBatch.from_arrays(
            [rb.column(0), words_col,
             lst(doc_indptr.astype(np.int32), zs_flat),
             lst(ch_off, ch_w), lst(ch_off, ch_old), lst(ch_off, ch_new)],
            names=["doc_id", "words", "zs", "dw", "dp_old", "dp_new"],
        )


def _interleave_doc_delta_cols(n_docs, per_sweep):
    """Regroup per-sweep changed-token columns by doc.

    ``per_sweep`` is a list of (cols, counts) — one entry per fused
    sweep, ``cols`` a tuple of that sweep's flat changed-token arrays
    (any number of parallel columns) and ``counts`` the per-doc change
    counts. Returns (out_cols, offsets) where offsets (int64[n_docs+1])
    delimits each doc's deltas from ALL sweeps, sweep-ordered within a
    doc. Pure index arithmetic, O(total changes)."""
    n_cols = len(per_sweep[0][0]) if per_sweep else 0
    total_counts = np.zeros(n_docs, dtype=np.int64)
    for _, cc in per_sweep:
        total_counts += cc
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(total_counts, out=offsets[1:])
    total = int(offsets[-1])
    out_cols = tuple(np.empty(total, dtype=np.int64) for _ in range(n_cols))
    acc = np.zeros(n_docs, dtype=np.int64)
    for cols, cc in per_sweep:
        m = int(cc.sum())
        if m == 0:
            continue
        starts = offsets[:-1] + acc
        seg0 = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(cc[:-1], out=seg0[1:])
        pos = np.repeat(starts - seg0, cc) + np.arange(m, dtype=np.int64)
        for out, col in zip(out_cols, cols):
            out[pos] = col
        acc += cc
    return out_cols, offsets


def _interleave_doc_deltas(n_docs, per_sweep):
    """M1 3-column shape of ``_interleave_doc_delta_cols``: per_sweep
    entries are (ch_w, ch_old, ch_new, ch_counts) → (dw, dp_old,
    dp_new, offsets)."""
    cols, offsets = _interleave_doc_delta_cols(
        n_docs, [((cw, co, cn), cc) for cw, co, cn, cc in per_sweep]
    )
    if not cols:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, offsets
    return (*cols, offsets)


def _run_fused_arrow_batches(
    batches, lib, const, nwp, np_, P, alpha, seed, sweep0, k,
):
    """K sweeps fused into ONE mapInArrow pass (M1/M2/M5 native path).

    Rationale: at late chain the per-sweep cost is dominated by the
    fixed per-job term (job launch + Arrow state transfer + eager
    checkpoint, ~0.6 s measured) rather than the kernel; fusing K
    sweeps amortizes that term K×. Semantics: AD-LDA already lets each
    partition sweep against counts that are stale ACROSS partitions
    within a sweep; fusion extends the same staleness across the K
    fused sweeps (each partition carries its own locally-updated counts
    from sweep s to s+1 instead of receiving the cross-partition
    refresh). Two exactness anchors remain:

      - with n_partitions=1 the local counts ARE the global counts, so
        a fused block is BIT-IDENTICAL to K unfused sweeps (test-gated
        in test_gibbs_fused.py);
      - every sweep's integer deltas are emitted (regrouped per doc,
        sweep-ordered), so the driver's delta refresh reconstructs the
        EXACT global counts at the block boundary — fusion never
        degrades the count matrices, only the intermediate broadcast
        freshness (gated multi-partition by the NDCG floor in
        test_gibbs_fused.py).

    Per-doc RNG streams are reseeded per (base_seed, sweep, doc)
    exactly as the unfused path, so fusion changes WHICH counts a
    sample sees, never the random numbers.

    The partition's batches are buffered (the same data the local
    checkpoint already holds as executor blocks, so memory is ~2× state
    for the duration of the pass). ``lib`` None (executor without a C
    compiler) degrades to the interpreted numba-twin kernel —
    bit-identical per sweep, so heterogeneous clusters still agree."""
    import pyarrow as pa

    W = nwp.shape[1]
    nwp_flat = nwp.ravel().copy()
    np_arr = np_.copy()
    csr_indptr = const["csr_indptr"]
    csr_data = const["csr_data"]
    lam_beta = const["lam_beta"]
    slb = np.ascontiguousarray(const["slb"])
    nd_scratch = np.zeros(P, dtype=np.int64)
    cdf_scratch = np.empty(max(int(const["max_cand"]), 1), dtype=np.float64)

    buf = []  # (rb_doc_col, words_col, doc_ids_i64, doc_indptr, ws, zs)
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
            np.array(
                rb.column(2).flatten().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            ),
        ))

    deltas = [[] for _ in buf]  # per batch: per-sweep change tuples
    for s in range(k):
        sweep_idx = sweep0 + s
        for j, (_, _, doc_ids, doc_indptr, ws_flat, zs_flat) in enumerate(buf):
            seeds = (
                (seed * 1_000_003 + sweep_idx * 10_007 + doc_ids * 131)
                % (2**32 - 1)
            )
            if lib is not None:
                ch = native_kernel.sweep_batch_native(
                    lib, doc_indptr, ws_flat, zs_flat,
                    seeds.astype(np.uint32), P, W, nwp_flat, np_arr,
                    csr_indptr, csr_data, lam_beta, slb, alpha,
                    None, None, nd_scratch, cdf_scratch,
                )
            else:
                n_tok = ws_flat.size
                n_docs = len(doc_indptr) - 1
                cw = np.empty(n_tok, dtype=np.int64)
                co = np.empty(n_tok, dtype=np.int64)
                cn = np.empty(n_tok, dtype=np.int64)
                cc = np.empty(n_docs, dtype=np.int64)
                n_ch = numba_kernel.sweep_batch_py(
                    doc_indptr, ws_flat, zs_flat, seeds, P, W, nwp_flat,
                    np_arr, csr_indptr, csr_data, lam_beta, slb, alpha,
                    False, np.zeros((0, 0), dtype=np.float64),
                    np.zeros(0, dtype=np.float64), nd_scratch, cdf_scratch,
                    cw, co, cn, cc,
                )
                ch = (cw[:n_ch], co[:n_ch], cn[:n_ch], cc)
            deltas[j].append(ch)

    def lst(off, vals):
        return pa.ListArray.from_arrays(pa.array(off), pa.array(vals))

    for (doc_col, words_col, _, doc_indptr, _, zs_flat), per_sweep in zip(
        buf, deltas
    ):
        n = len(doc_indptr) - 1
        dw, dold, dnew, ch_off = _interleave_doc_deltas(n, per_sweep)
        yield pa.RecordBatch.from_arrays(
            [doc_col, words_col,
             lst(doc_indptr.astype(np.int32), zs_flat),
             lst(ch_off.astype(np.int32), dw),
             lst(ch_off.astype(np.int32), dold),
             lst(ch_off.astype(np.int32), dnew)],
            names=["doc_id", "words", "zs", "dw", "dp_old", "dp_new"],
        )


def _run_compiled_batches(
    batches, kern, lib, const, nwp, np_, P, alpha, seed, sweep_idx,
    use_m3, eps,
):
    """Arrow-batch loop for the compiled kernels (native C / numba): flat
    token layout + one kernel call per batch, so per-token work never
    re-enters the interpreter. Same AD-LDA working-copy discipline and
    changed-token outputs as the per-doc kernels."""
    W = nwp.shape[1]
    nwp_flat = nwp.ravel().copy()
    np_arr = np_.copy()
    csr_indptr = const["csr_indptr"]
    csr_data = const["csr_data"]
    lam_beta = const["lam_beta"]
    slb = np.ascontiguousarray(const["slb"])
    nd_scratch = np.zeros(P, dtype=np.int64)
    cdf_scratch = np.empty(max(int(const["max_cand"]), 1), dtype=np.float64)
    for b in batches:
        n = len(b)
        if n == 0:
            continue
        ws_list = [np.ascontiguousarray(x, dtype=np.int64) for x in b["words"]]
        lens = np.fromiter((x.size for x in ws_list), np.int64, n)
        doc_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_indptr[1:])
        ws_flat = np.concatenate(ws_list)
        zs_flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in b["zs"]]
        )
        # vectorized oracle.seed_for — identical int arithmetic in int64
        # (values stay far below 2**63 for any int32 doc_id)
        seeds = (
            seed * 1_000_003 + sweep_idx * 10_007
            + b["doc_id"].to_numpy(np.int64) * 131
        ) % (2**32 - 1)
        if use_m3:
            av_mat = np.empty((n, P), dtype=np.float64)
            a_sums = np.empty(n, dtype=np.float64)
            for j, av in enumerate(_m3_alpha_rows(b["nbrs"], P, alpha, eps)):
                av_mat[j] = av
                # float(row.sum()) — same reduction the per-doc kernels use
                a_sums[j] = float(av.sum())
        else:
            av_mat, a_sums = None, None
        if kern == "native":
            ch_w, ch_old, ch_new, ch_counts = native_kernel.sweep_batch_native(
                lib, doc_indptr, ws_flat, zs_flat,
                seeds.astype(np.uint32), P, W, nwp_flat, np_arr,
                csr_indptr, csr_data, lam_beta, slb, alpha,
                av_mat, a_sums, nd_scratch, cdf_scratch,
            )
        else:
            n_tok = ws_flat.size
            ch_w = np.empty(n_tok, dtype=np.int64)
            ch_old = np.empty(n_tok, dtype=np.int64)
            ch_new = np.empty(n_tok, dtype=np.int64)
            ch_counts = np.empty(n, dtype=np.int64)
            n_ch = numba_kernel.sweep_batch_py(
                doc_indptr, ws_flat, zs_flat, seeds, P, W, nwp_flat,
                np_arr, csr_indptr, csr_data, lam_beta, slb, alpha,
                use_m3,
                av_mat if use_m3 else np.zeros((0, 0), dtype=np.float64),
                a_sums if use_m3 else np.zeros(0, dtype=np.float64),
                nd_scratch, cdf_scratch, ch_w, ch_old, ch_new, ch_counts,
            )
            ch_w, ch_old, ch_new = ch_w[:n_ch], ch_old[:n_ch], ch_new[:n_ch]
        ch_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ch_counts, out=ch_indptr[1:])
        yield pd.DataFrame({
            "doc_id": b["doc_id"],
            "words": b["words"],
            "zs": np.split(zs_flat, doc_indptr[1:-1]),
            "dw": np.split(ch_w, ch_indptr[1:-1]),
            "dp_old": np.split(ch_old, ch_indptr[1:-1]),
            "dp_new": np.split(ch_new, ch_indptr[1:-1]),
        })


@dataclass
class GibbsConfig:
    n_preds: int
    n_words: int
    alpha: float | None = None
    beta: float = 0.01
    base_seed: int = 7
    n_partitions: int = 8
    epsilon: float = 0.9     # M3 neighbor-smoothing mix (only with doc_sr)
    # λ default for (pred, word) pairs absent from lam_df. 1.0 = M1's
    # "unobserved pairs weigh 1" (EntityProc.java:468); 0.0 = the M5
    # SontoLDA convention, where tfIdfMat is allocated zero-filled and
    # only category-word TF-IDF entries are set
    # (sontoldamodel/SontoLDA.java:524-531, used at :138-139).
    lam_default: float = 1.0
    # True = per-sweep Dataset.checkpoint against the session's
    # checkpoint dir (durable across executor loss, one FS write per
    # sweep); False = localCheckpoint + the every-k-sweeps Parquet
    # checkpoints in plans/checkpoint.py as the durable resume points.
    # See models/state_lifecycle.py for the tradeoff.
    reliable_checkpoint: bool = False
    # "native" = runtime-compiled C kernel (default; ~10× the fast
    # kernel, falls back to "fast" where no C compiler exists);
    # "numba" = the jitted twin (interpreted where numba is absent);
    # "fast" = scalar-Python kernel; "reference" = the per-token NumPy
    # kernel the oracle parity tests arbitrate against. ALL produce
    # identical z-chains (test_gibbs_kernels.py).
    kernel: str = "native"
    # >1 fuses that many sweeps into ONE Spark job (mapInArrow pass):
    # each partition carries its locally-updated counts across the
    # fused sweeps instead of receiving the cross-partition refresh —
    # the AD-LDA staleness extended across the block. Amortizes the
    # per-job fixed cost (launch + Arrow transfer + checkpoint, ~0.6 s
    # measured — the dominant per-sweep term at late chain) by the
    # fusion factor. Exact anchors: bit-identical to unfused at
    # n_partitions=1; global counts exactly reconstructed from the
    # block's deltas at every block boundary (test_gibbs_fused.py).
    # DEFAULT 1: the bit-parity-to-reference contract holds only
    # unfused for n_partitions>1. Applies to the native non-M3 path;
    # other paths sweep per-job regardless.
    sweeps_per_job: int = 1

    @property
    def alpha_eff(self) -> float:
        # reference default α = 50/P (ModelParameters.java:41 — 50/264)
        return self.alpha if self.alpha is not None else 50.0 / self.n_preds


def tokens_from_corpus(corpus: DataFrame) -> DataFrame:
    """corpus (doc_id, word_id, freq) → per-doc token array, deterministic
    layout (ascending word_id, repeated freq times) matching
    oracle.doc_token_words."""
    return corpus.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("word_id", "freq"))),
                lambda s: F.array_repeat(s["word_id"].cast("long"), s["freq"]),
            )
        ).alias("words")
    )


def _collect_cand(obj_pred: DataFrame) -> dict[int, np.ndarray]:
    pdf = obj_pred.toPandas()
    return {
        int(w): np.asarray(sorted(ps), dtype=np.int64)
        for w, ps in zip(pdf["word_id"], pdf["pred_ids"])
    }


def _collect_lam(
    lam_df: DataFrame | None, P: int, W: int, default: float = 1.0
) -> np.ndarray:
    lam = np.full((P, W), default, dtype=np.float64)
    if lam_df is not None:
        pdf = lam_df.toPandas()
        lam[pdf["pred_id"].to_numpy(), pdf["word_id"].to_numpy()] = pdf[
            "weight"
        ].to_numpy()
    return lam


def resolve_kernel(name: str) -> str:
    """Driver-side kernel resolution with explicit degradation. The
    resolved name decides what the sweep-constant broadcast must carry
    (CSR candidates + flat λ·β for the compiled kernels)."""
    if name == "native" and not native_kernel.native_available():
        warnings.warn(
            "kernel='native': no C compiler available — using 'fast' "
            "(bit-identical, slower)", stacklevel=2,
        )
        return "fast"
    if name == "numba" and not numba_kernel.numba_available():
        warnings.warn(
            "kernel='numba': numba not installed — running the same "
            "kernel body interpreted (bit-identical, slow); install "
            "numba or use kernel='native'", stacklevel=2,
        )
    return name


class DistributedGibbs(CheckpointedStateLifecycle):
    """Driver-side sweep loop. Usage:

        g = DistributedGibbs(spark, corpus_df, obj_pred_df, lam_df, cfg)
        g.init_state()
        g.run(n_sweeps)
        theta, phi = g.theta(), g.phi()
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        obj_pred: DataFrame,
        lam_df: DataFrame | None,
        cfg: GibbsConfig,
        doc_sr: DataFrame | None = None,
    ):
        """``doc_sr`` (doc_a, doc_b) enables the M3 option: per-doc α
        smoothed over the SR-graph neighborhood (EntLDA.computeAlpha,
        src/cs/uga/edu/enttopicmodel/EntLDA.java:319-338) — pass the edge
        list BOTH directions (symmetrize upstream). α refreshes from the
        synchronized counts between sweeps; within a sweep it is frozen,
        which is what keeps multi-partition runs well-defined."""
        self.spark = spark
        self.cfg = cfg
        self.doc_sr = doc_sr
        self.cand = _collect_cand(obj_pred)
        self.lam = _collect_lam(lam_df, cfg.n_preds, cfg.n_words, cfg.lam_default)
        self.sum_lam_beta = self.lam.sum(axis=1) * cfg.beta
        self.kernel = resolve_kernel(cfg.kernel)
        if self.kernel in ("native", "numba"):
            # sweep-constant compiled-kernel inputs, packed once:
            # CSR candidates and λ·β ((lam*β) elementwise equals the fast
            # kernel's per-entry float(lam[c,w])*β bit-for-bit)
            self._csr_indptr, self._csr_data = native_kernel.cand_to_csr(
                self.cand, cfg.n_words
            )
            self._lam_beta = np.ascontiguousarray(
                (self.lam * cfg.beta).ravel()
            )
            self._max_cand = (
                int(np.diff(self._csr_indptr).max()) if self.cand else 1
            )
        self.corpus = corpus
        self.state: DataFrame | None = None
        self.nwp: np.ndarray | None = None
        self.np_: np.ndarray | None = None
        self.sweeps_done = 0
        self._const_bc = None  # sweep-constant broadcast, shipped once
        self._init_state_lifecycle()  # checkpoint/broadcast discipline

    # ---- state init ----
    def init_state(self) -> None:
        cfg = self.cfg
        toks = tokens_from_corpus(self.corpus)
        cand_bc = self.spark.sparkContext.broadcast(self.cand)
        seed = cfg.base_seed

        def init_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cand = cand_bc.value
            rng0 = np.random.RandomState(0)
            for b in batches:
                zs_col = []
                for d, ws in zip(b["doc_id"], b["words"]):
                    rng = reseed(rng0, seed, -1, int(d))
                    ws = np.asarray(ws, dtype=np.int64)
                    zs = np.empty(len(ws), dtype=np.int64)
                    for i, w in enumerate(ws):
                        c = cand[int(w)]
                        zs[i] = c[rng.randint(len(c))]
                    zs_col.append(zs)
                yield pd.DataFrame(
                    {"doc_id": b["doc_id"], "words": b["words"], "zs": zs_col}
                )

        # localCheckpoint (eager) both materializes the state AND truncates
        # its lineage, so the init broadcast is immediately destroyable —
        # at 1000 sweeps an undestroyed broadcast per iteration is a leak
        self.state = self._local_checkpoint(
            toks.repartition(cfg.n_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
            .mapInPandas(init_fn, STATE_SCHEMA),
            reliable=cfg.reliable_checkpoint,
        )
        self._refresh_global_counts()
        self._destroy_broadcast_now(cand_bc)
        self.sweeps_done = 0

    # ---- global count refresh (exact, from z-state) ----
    def _refresh_global_counts(self) -> None:
        cfg = self.cfg
        pairs = (
            self.state.select(F.explode(F.arrays_zip("zs", "words")).alias("t"))
            .select(F.col("t.zs").alias("p"), F.col("t.words").alias("w"))
            .groupBy("p", "w")
            .count()
            .toPandas()
        )
        nwp = np.zeros((cfg.n_preds, cfg.n_words), dtype=np.int64)
        nwp[pairs["p"].to_numpy(np.int64), pairs["w"].to_numpy(np.int64)] = (
            pairs["count"].to_numpy(np.int64)
        )
        self.nwp = nwp
        self.np_ = nwp.sum(axis=1)

    # ---- global count refresh (exact, delta-based) ----
    def _apply_count_deltas(self) -> None:
        """Refresh nwp/np_ from the sweep's changed tokens only.

        Exact by induction on integer arithmetic: every partition's local
        AD-LDA updates are (−1 at (p_old, w), +1 at (p_new, w)) per
        changed token, and summing those deltas over all partitions on top
        of exact previous counts yields exactly the counts a full
        recompute from the new z-state gives (bit-parity tests compare
        final nwp against the NumPy oracle). The win is scale: the old
        refresh exploded and shuffled EVERY token every sweep; this
        aggregates only tokens whose topic changed — which collapses as
        the chain converges (late-sweep change rates are a few percent).
        Absolute recompute (_refresh_global_counts) remains the init /
        checkpoint-restore path and the arbiter."""
        deltas = (
            self.state.select(
                F.explode(F.arrays_zip("dw", "dp_old", "dp_new")).alias("t")
            )
            .groupBy(
                F.col("t.dw").alias("w"),
                F.col("t.dp_old").alias("po"),
                F.col("t.dp_new").alias("pn"),
            )
            .count()
            .toPandas()
        )
        self.last_sweep_changes = 0
        if len(deltas):
            w = deltas["w"].to_numpy(np.int64)
            n = deltas["count"].to_numpy(np.int64)
            np.add.at(self.nwp,
                      (deltas["po"].to_numpy(np.int64), w), -n)
            np.add.at(self.nwp,
                      (deltas["pn"].to_numpy(np.int64), w), n)
            self.last_sweep_changes = int(n.sum())
        self.np_ = self.nwp.sum(axis=1)

    # ---- M3 neighbor payload (per-doc α smoothing inputs) ----
    def _with_nbr_payload(self, state: DataFrame) -> DataFrame:
        """Attach each doc's sorted SR-neighbor count summaries
        (nbr, nd, [(p, n), ...]) so the sweep UDF can rebuild the exact
        neighbor θ and call alpha_from_neighbors — identical input order
        to the oracle, hence bit-identical α."""
        npd = (
            state.select("doc_id", F.explode("zs").alias("p"))
            .groupBy("doc_id", "p")
            .agg(F.count("*").alias("n"))
        )
        pn = npd.groupBy("doc_id").agg(
            F.sort_array(F.collect_list(F.struct("p", "n"))).alias("pn")
        )
        payload = pn.join(state.select("doc_id", F.size("words").alias("nd")),
                          "doc_id")
        nbrs = (
            self.doc_sr.select(
                F.col("doc_a").cast("long").alias("doc_a"),
                F.col("doc_b").cast("long").alias("doc_id"),
            )
            .join(payload, "doc_id")
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("doc_id").alias("nbr"), "nd", "pn")
                    )
                ).alias("nbrs")
            )
        )
        return state.join(nbrs, "doc_id", "left")

    # ---- sweep-constant broadcast (candidates / λ — shipped ONCE) ----
    def _ensure_const_bc(self):
        if self._const_bc is None:
            payload = {
                "cand": self.cand, "lam": self.lam, "slb": self.sum_lam_beta,
            }
            if self.kernel in ("native", "numba"):
                payload.update(
                    csr_indptr=self._csr_indptr, csr_data=self._csr_data,
                    lam_beta=self._lam_beta, max_cand=self._max_cand,
                )
            self._const_bc = self.spark.sparkContext.broadcast(payload)
        return self._const_bc

    def close(self) -> None:
        """Release the sampler's long-lived broadcast/state handles."""
        if self._const_bc is not None:
            self._destroy_broadcast_now(self._const_bc)
            self._const_bc = None
        self._retire_broadcast(None)

    # ---- one sweep (or a fused block of n_fused sweeps) ----
    def sweep(self, n_fused: int = 1) -> None:
        cfg = self.cfg
        sweep_idx = self.sweeps_done
        if n_fused > 1 and (self.kernel != "native" or self.doc_sr is not None):
            raise ValueError(
                "fused sweeps require kernel='native' and no doc_sr (M3 "
                "re-derives neighbor payloads between sweeps)"
            )
        bc = self.spark.sparkContext.broadcast((self.nwp, self.np_))
        const_bc = self._ensure_const_bc()
        P, alpha, beta, seed = cfg.n_preds, cfg.alpha_eff, cfg.beta, cfg.base_seed
        eps = cfg.epsilon
        use_m3 = self.doc_sr is not None
        kernel = self.kernel

        def sweep_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nwp, np_ = bc.value
            const = const_bc.value
            kern = kernel
            lib = None
            if kern == "native":
                lib = native_kernel.load_native()
                if lib is None:  # executor without a compiler: degrade
                    kern = "fast"
            if kern in ("native", "numba"):
                yield from _run_compiled_batches(
                    batches, kern, lib, const, nwp, np_, P, alpha, seed,
                    sweep_idx, use_m3, eps,
                )
                return
            cand, lam, slb = const["cand"], const["lam"], const["slb"]
            # partition-local working copies (AD-LDA): the fast kernel keeps
            # them as a flat int64 array + python int list, the reference
            # kernel as the original 2-D array — same update sequence
            if kernel == "reference":
                nwp = nwp.copy()
                np_ = np_.copy()
            else:
                W = nwp.shape[1]
                nwp_flat = nwp.ravel().copy()
                np_l = [int(x) for x in np_]
                word_cache: dict = {}
            rng0 = np.random.RandomState(0)
            for b in batches:
                zs_col = []
                dw_col, dold_col, dnew_col = [], [], []
                nbr_col = b["nbrs"] if use_m3 else [None] * len(b)
                for d, ws, zs, nbrs in zip(
                    b["doc_id"], b["words"], b["zs"], nbr_col
                ):
                    if use_m3:
                        tup = []
                        entries = (
                            nbrs if isinstance(nbrs, (list, np.ndarray)) else []
                        )
                        for e in entries:
                            pn = e["pn"]
                            if pn is None or len(pn) == 0:
                                pn = []
                            tup.append((
                                int(e["nbr"]),
                                int(e["nd"]),
                                np.asarray([x["p"] for x in pn], dtype=np.int64),
                                np.asarray([x["n"] for x in pn], dtype=np.int64),
                            ))
                        av = alpha_from_neighbors(tup, P, alpha, eps)
                        a_sum = float(av.sum())
                    else:
                        av, a_sum = None, P * alpha
                    rng = reseed(rng0, seed, sweep_idx, int(d))
                    if kernel == "reference":
                        ws_a = np.asarray(ws, dtype=np.int64)
                        zs_a = np.asarray(zs, dtype=np.int64).copy()
                        nd = np.bincount(zs_a, minlength=P).astype(np.int64)
                        ch = _sweep_doc_reference(
                            ws_a, zs_a, nd, nwp, np_, cand, lam, slb,
                            beta, alpha, av, a_sum, rng,
                        )
                        zs_col.append(zs_a)
                    else:
                        ws_l = np.asarray(ws, dtype=np.int64).tolist()
                        zs_l = np.asarray(zs, dtype=np.int64).tolist()
                        nd = [0] * P
                        for p in zs_l:
                            nd[p] += 1
                        ch = _sweep_doc_fast(
                            ws_l, zs_l, nd, nwp_flat, np_l, W, word_cache,
                            cand, lam, slb, beta, alpha, av, a_sum, rng,
                        )
                        zs_col.append(np.asarray(zs_l, dtype=np.int64))
                    dw_col.append(np.asarray(ch[0], dtype=np.int64))
                    dold_col.append(np.asarray(ch[1], dtype=np.int64))
                    dnew_col.append(np.asarray(ch[2], dtype=np.int64))
                yield pd.DataFrame(
                    {"doc_id": b["doc_id"], "words": b["words"],
                     "zs": zs_col, "dw": dw_col, "dp_old": dold_col,
                     "dp_new": dnew_col}
                )

        def sweep_fn_arrow(batches):
            # Arrow-native twin of sweep_fn for the C kernel (no M3):
            # falls back to the pandas path only if this executor cannot
            # compile (then via the fast kernel — bit-identical)
            lib = native_kernel.load_native()
            if lib is None and n_fused == 1:
                import pyarrow as pa

                def as_pandas():
                    for rb in batches:
                        yield pa.Table.from_batches([rb]).to_pandas()

                for pdf_out in sweep_fn(as_pandas()):
                    yield pa.RecordBatch.from_pandas(pdf_out)
                return
            const = const_bc.value
            nwp, np_ = bc.value
            if n_fused > 1:
                # the fused runner handles lib=None itself (interpreted
                # twin — bit-identical per sweep, counts carry the same)
                yield from _run_fused_arrow_batches(
                    batches, lib, const, nwp, np_, P, alpha, seed,
                    sweep_idx, n_fused,
                )
                return
            yield from _run_arrow_batches(
                batches, lib, const, nwp, np_, P, alpha, seed, sweep_idx,
            )

        old = self.state
        # project away a previous sweep's delta columns (their aggregation
        # already happened) so they neither ride through Arrow nor grow the
        # checkpoint
        base = old.select("doc_id", "words", "zs")
        # the payload join re-keys state to spark.sql.shuffle.partitions —
        # restore the sampler's partitioning so the AD-LDA partition count
        # (and with n_partitions=1, oracle bit-parity) is preserved
        src = (
            self._with_nbr_payload(base).repartition(cfg.n_partitions, "doc_id")
            if use_m3
            else base
        )
        # partitioning by doc_id is already established; mapInPandas /
        # mapInArrow preserve it. localCheckpoint materializes the sweep
        # AND truncates lineage — without it the plan chains one map per
        # sweep (O(n) plan growth, and every sweep's broadcast stays
        # referenced for task re-serialization: an unbounded leak at
        # 1000 sweeps). The native non-M3 path goes through mapInArrow
        # (zero-copy flat token buffers, no per-doc Python — see
        # _run_arrow_batches).
        if kernel == "native" and not use_m3:
            swept = src.sortWithinPartitions("doc_id").mapInArrow(
                sweep_fn_arrow, SWEEP_SCHEMA
            )
        else:
            swept = src.sortWithinPartitions("doc_id").mapInPandas(
                sweep_fn, SWEEP_SCHEMA
            )
        # lazy local checkpoint: the delta aggregation below is the action
        # that materializes (and persists + lineage-truncates) the new
        # state — one job per sweep instead of checkpoint-then-aggregate.
        # The old state is released only AFTER that job: the sweep reads
        # its blocks.
        new_state = self._local_checkpoint(
            swept, reliable=cfg.reliable_checkpoint, eager=False,
        )
        self.state = new_state
        self.sweeps_done += n_fused
        self._apply_count_deltas()
        self._finalize_lazy_checkpoint()
        self._release_old_state(old)
        # The PREVIOUS sweep's broadcast is now unreferenced (its state was
        # checkpointed a sweep ago and unpersisted above) — destroy it
        # explicitly instead of waiting on ContextCleaner; the current bc is
        # deferred one sweep out of caution.
        self._retire_broadcast(bc)

    def run(self, n_sweeps: int) -> None:
        if self.state is None:
            self.init_state()
        k = max(1, int(self.cfg.sweeps_per_job))
        if k > 1 and (self.kernel != "native" or self.doc_sr is not None):
            warnings.warn(
                "sweeps_per_job>1 applies only to the native non-M3 "
                "path; sweeping one per job", stacklevel=2,
            )
            k = 1
        done = 0
        while done < n_sweeps:
            step = min(k, n_sweeps - done)
            self.sweep(n_fused=step)
            done += step

    # ---- posteriors ----
    def theta(self, for_pairs: DataFrame | None = None) -> DataFrame:
        """θ(doc_id, pred_id) = round((Npd+α)/(Nd+Pα), 4).

        ``for_pairs`` (doc_id, pred_id) limits output to needed cells (at
        scale D×P is too wide to materialize for every doc)."""
        cfg = self.cfg
        a, P = cfg.alpha_eff, cfg.n_preds
        nd = self.state.select("doc_id", F.size("words").alias("nd"))
        npd = (
            self.state.select("doc_id", F.explode("zs").alias("pred_id"))
            .groupBy("doc_id", "pred_id")
            .agg(F.count("*").alias("npd"))
        )
        if for_pairs is None:
            base = npd
        else:
            base = for_pairs.select("doc_id", "pred_id").distinct().join(
                npd, ["doc_id", "pred_id"], "left"
            )
        return (
            base.join(nd, "doc_id")
            .select(
                "doc_id",
                "pred_id",
                F.round(
                    (F.coalesce("npd", F.lit(0)) + F.lit(a))
                    / (F.col("nd") + F.lit(P * a)),
                    4,
                ).alias("theta"),
            )
        )

    def phi(self) -> DataFrame:
        """φ(pred_id, word_id) — dense P×W, computed driver-side (small)."""
        phi = np.round(
            (self.nwp + self.lam * self.cfg.beta)
            / (self.np_[:, None] + self.sum_lam_beta[:, None]),
            4,
        )
        p_idx, w_idx = np.nonzero(np.ones_like(phi))
        pdf = pd.DataFrame(
            {"pred_id": p_idx.astype("int64"), "word_id": w_idx.astype("int64"),
             "phi": phi.ravel()}
        )
        return self.spark.createDataFrame(pdf)

    # ---- oracle-comparable state dump (tests) ----
    def z_state(self) -> dict[int, np.ndarray]:
        pdf = self.state.select("doc_id", "zs").toPandas()
        return {int(d): np.asarray(z, dtype=np.int64) for d, z in
                zip(pdf["doc_id"], pdf["zs"])}
