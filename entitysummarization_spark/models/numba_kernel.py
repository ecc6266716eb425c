"""Numba-jitted doc-sweep kernel — same contract as the native C kernel.

Round-4 verdict asked for a ``GibbsConfig.kernel="numba"`` option under
the same seeded-RNG contract, arbitrated by the existing kernel-equality
tests. Numba is not installed in this container, so the design makes the
kernel body testable anyway: ``sweep_batch_py`` is plain Python/NumPy
written in the numba-supported subset, decorated with ``numba.njit``
only when the import succeeds. Without numba the SAME function runs
interpreted — slow, but bit-identical, so tests/test_gibbs_kernels.py
exercises this exact code path in CI; with numba installed it compiles
to machine code with zero source changes.

MT19937 is implemented inline (same published recurrence as
native_kernel.C_SOURCE; int64 arithmetic with explicit 32-bit masking so
interpreted and jitted runs wrap identically) rather than relying on
numba's ``np.random`` shim — bit-compatibility is then by construction,
not by trusting a third-party reimplementation.

Argument conventions mirror ``native_kernel.sweep_batch`` exactly; see
models/gibbs.py for how DistributedGibbs dispatches.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only where numba is installed
    from numba import njit

    HAVE_NUMBA = True
except ImportError:  # container default: run the same body interpreted
    HAVE_NUMBA = False

    def njit(*args, **kwargs):  # type: ignore[misc]
        if args and callable(args[0]):
            return args[0]

        def deco(f):
            return f

        return deco


def numba_available() -> bool:
    return HAVE_NUMBA


@njit(cache=True)
def _mt_seed(key: np.ndarray, seed: int) -> None:
    s = seed & 0xFFFFFFFF
    for pos in range(624):
        key[pos] = s
        s = (1812433253 * (s ^ (s >> 30)) + pos + 1) & 0xFFFFFFFF


@njit(cache=True)
def _mt_regen(key: np.ndarray) -> None:
    for i in range(624):
        y = (key[i] & 0x80000000) | (key[(i + 1) % 624] & 0x7FFFFFFF)
        x = key[(i + 397) % 624] ^ (y >> 1)
        if y & 1:
            x ^= 0x9908B0DF
        key[i] = x


@njit(cache=True)
def sweep_batch_py(
    doc_indptr: np.ndarray,   # int64[n_docs+1]
    ws: np.ndarray,           # int64[n_tok] flat token words
    zs: np.ndarray,           # int64[n_tok] in/out topic assignments
    seeds: np.ndarray,        # int64[n_docs] per-doc MT seeds
    P: int,
    W: int,
    nwp: np.ndarray,          # int64[P*W] in/out partition-local counts
    np_: np.ndarray,          # int64[P]   in/out
    cand_indptr: np.ndarray,  # int64[W+1]
    cand_data: np.ndarray,    # int64[]
    lam_beta: np.ndarray,     # float64[P*W]
    slb: np.ndarray,          # float64[P]
    alpha: float,
    use_m3: bool,
    av_mat: np.ndarray,       # float64[n_docs, P] (or (0, 0))
    a_sums: np.ndarray,       # float64[n_docs]    (or (0,))
    nd: np.ndarray,           # int64[P] scratch
    cdf: np.ndarray,          # float64[>=max_cand] scratch
    ch_w: np.ndarray,         # int64[n_tok] out
    ch_old: np.ndarray,       # int64[n_tok] out
    ch_new: np.ndarray,       # int64[n_tok] out
    ch_counts: np.ndarray,    # int64[n_docs] out
) -> int:
    key = np.empty(624, dtype=np.int64)
    n_changed = 0
    n_docs = len(doc_indptr) - 1
    for d in range(n_docs):
        t0, t1 = doc_indptr[d], doc_indptr[d + 1]
        ndoc = t1 - t0
        if use_m3:
            a_sum = a_sums[d]
        else:
            a_sum = P * alpha
        denom = (ndoc - 1) + a_sum
        _mt_seed(key, seeds[d])
        pos = 624
        doc_changed = 0
        for p in range(P):
            nd[p] = 0
        for i in range(t0, t1):
            nd[zs[i]] += 1
        for i in range(t0, t1):
            w = ws[i]
            p_old = zs[i]
            nd[p_old] -= 1
            np_[p_old] -= 1
            nwp[p_old * W + w] -= 1
            s = cand_indptr[w]
            m = cand_indptr[w + 1] - s
            total = 0.0
            for k in range(m):
                cj = cand_data[s + k]
                off = cj * W + w
                if use_m3:
                    a = av_mat[d, cj]
                else:
                    a = alpha
                total = total + (
                    (nd[cj] + a) / denom
                    * (nwp[off] + lam_beta[off])
                    / (np_[cj] + slb[cj])
                )
                cdf[k] = total
            # numpy random_sample: two tempered 32-bit draws -> 53-bit double
            if pos == 624:
                _mt_regen(key)
                pos = 0
            ya = key[pos]
            pos += 1
            ya ^= ya >> 11
            ya = (ya ^ ((ya << 7) & 0x9D2C5680)) & 0xFFFFFFFF
            ya = (ya ^ ((ya << 15) & 0xEFC60000)) & 0xFFFFFFFF
            ya ^= ya >> 18
            if pos == 624:
                _mt_regen(key)
                pos = 0
            yb = key[pos]
            pos += 1
            yb ^= yb >> 11
            yb = (yb ^ ((yb << 7) & 0x9D2C5680)) & 0xFFFFFFFF
            yb = (yb ^ ((yb << 15) & 0xEFC60000)) & 0xFFFFFFFF
            yb ^= yb >> 18
            u = (
                ((ya >> 5) * 67108864.0 + (yb >> 6))
                / 9007199254740992.0
            ) * total
            # bisect_right: first k with u < cdf[k], clamped to last
            lo, hi = 0, m
            while lo < hi:
                mid = (lo + hi) >> 1
                if u < cdf[mid]:
                    hi = mid
                else:
                    lo = mid + 1
            if lo > m - 1:
                lo = m - 1
            p_new = cand_data[s + lo]
            zs[i] = p_new
            nd[p_new] += 1
            np_[p_new] += 1
            nwp[p_new * W + w] += 1
            if p_new != p_old:
                ch_w[n_changed] = w
                ch_old[n_changed] = p_old
                ch_new[n_changed] = p_new
                n_changed += 1
                doc_changed += 1
        ch_counts[d] = doc_changed
    return n_changed
