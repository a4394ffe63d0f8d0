"""Vectorized k-means assignment UDF factory.

Kept in its own module WITHOUT ``from __future__ import annotations``
(like _lsh_udf): pandas_udf infers its eval type from the *resolved*
type hints, and the future-import would turn them into unresolvable
strings.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def kmeans_assign_udf(cents: np.ndarray, cids: np.ndarray):
    """One Arrow-batched pandas UDF assigning every vector to its
    nearest centroid (squared L2) as a single numpy GEMM per batch:
    argmin_c ||x||^2 - 2 x.C^T + ||c||^2, with the ||x||^2 term
    dropped (constant per row).  ``cents`` is (k, dim) float64 in
    ASCENDING cid order, ``cids`` the matching (k,) int64 ids —
    np.argmin returns the FIRST minimum, so exact distance ties break
    to the lowest cid, the same rule as the interpreted fold.

    This is the production batch path for the compute-bound
    assignment fold (BASELINE.md "Debut rows": emb_kmeans and the PQ
    family are fold-arithmetic-bound, not shuffle-bound).  It is NOT
    the oracle-certified path: the GEMM sums products in a different
    order than the sequential fold, so a pair of centroids whose
    distances differ by less than ~1e-13 relative could flip — the
    equivalence test in tests/test_similarity.py shows zero flips on
    the real embedding table, but certified queries keep the fold.
    """
    c64 = np.ascontiguousarray(cents, dtype=np.float64)
    c_sq = (c64 * c64).sum(axis=1)  # (k,)
    ids = np.asarray(cids, dtype=np.int64)

    @pandas_udf("bigint")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            # a zero-row Arrow batch would build a 1-D shape-(0,)
            # array and make the matmul raise (r5 advice)
            return pd.Series([], dtype="int64")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        # (n, k): -2 x.C^T + ||c||^2 — monotone in the true sq dist
        scores = c_sq - 2.0 * (mat @ c64.T)
        return pd.Series(ids[np.argmin(scores, axis=1)])

    return assign


def pq_codes_udf(books, cidss, dsub: int):
    """One Arrow-batched pandas UDF PQ-encoding every vector: per
    subspace s, one numpy GEMM over the batch's subspace slice against
    codebook ``books[s]`` ((k_s, dsub) float64, ASCENDING-cid order,
    ids in ``cidss[s]``), argmin with the same drop-||x||^2 monotone
    score and first-min (= lowest-cid) tie rule as
    :func:`kmeans_assign_udf`.  Returns the m codes per row as
    array<bigint> — the production batch twin of
    ``similarity.pq_encode``'s interpreted fold (same caveats: a
    sub-1e-13-relative near-tie could flip vs the sequential fold;
    the emb_gemm_audit driver row counts such flips and asserts 0 on
    the real corpus)."""
    m = len(books)
    bks = [np.ascontiguousarray(b, dtype=np.float64) for b in books]
    sqs = [(b * b).sum(axis=1) for b in bks]
    idss = [np.asarray(c, dtype=np.int64) for c in cidss]

    @pandas_udf("array<bigint>")
    def codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(mat), m), dtype=np.int64)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            scores = sqs[s] - 2.0 * (sub @ bks[s].T)
            out[:, s] = idss[s][np.argmin(scores, axis=1)]
        return pd.Series(list(out))

    return codes


def maxsim_cos_ppm_udf(tokens: np.ndarray):
    """One Arrow-batched pandas UDF scoring a corpus vector against
    ALL MaxSim query tokens at once: one numpy GEMM per batch gives
    every (row, token) cosine, which is then quantized to the SAME
    integer ppm grid as the certified interpreted fold
    (round(round(cos, 6) * 1e6)), so the downstream per-token MAX
    and SUM are identical integer ops.  ``tokens`` is (t, dim)
    float64 in token_id order; returns array<bigint> of t ppm
    cosines per row.

    Production batch twin of `queries/vector.py::q_emb_maxsim_topk`'s
    per-pair fold (the same lever as kmeans_assign_udf: the fold is
    compute-bound interpreted arithmetic at 100 TB).  Quantization is
    an explicit half-AWAY-FROM-ZERO rule, sign(x) * floor(|x| * 1e6
    + 0.5): Spark's F.round is BigDecimal HALF_UP (away from zero)
    and DuckDB's round likewise, while np.round is half-to-even — at
    an exact .5e-6 boundary the three would disagree, so the kernel
    must not use np.round (r9 ADVICE.md).  The fold's double rounding
    (6dp then *1e6) composes to exactly this single-step rule modulo
    float64 product rounding (~1e-11 of a ppm step vs the boundary);
    the equivalence test pins zero mismatches on the real table.
    """
    t64 = np.ascontiguousarray(tokens, dtype=np.float64)
    t_norm = np.sqrt((t64 * t64).sum(axis=1))  # (t,)

    @pandas_udf("array<bigint>")
    def score(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.sqrt((mat * mat).sum(axis=1))  # (n,)
        cos = (mat @ t64.T) / (norms[:, None] * t_norm[None, :])
        ppm = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(
            np.int64
        )
        return pd.Series(list(ppm))

    return score
