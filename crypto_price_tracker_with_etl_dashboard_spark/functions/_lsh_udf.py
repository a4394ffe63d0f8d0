"""Vectorized LSH bucket UDF factory.

Kept in its own module WITHOUT ``from __future__ import annotations``:
pandas_udf infers its eval type from the *resolved* type hints, and
the future-import would turn them into unresolvable strings.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def lsh_buckets_udf(planes: np.ndarray, n_planes: int, n_tables: int):
    """One Arrow-batched pandas UDF computing ALL n_tables*n_planes
    plane dots as a single numpy GEMM per batch; returns the
    n_tables bucket ids per row.  ``planes`` is (dim, tables*planes)
    float64."""
    weights = np.array([1 << p for p in range(n_planes)], dtype=np.int64)

    @pandas_udf("array<int>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            # a zero-row Arrow batch would build a 1-D shape-(0,)
            # array and make the matmul raise (same guard as
            # _kmeans_udf.kmeans_assign_udf)
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        # The sign test runs on the 6dp-ROUNDED dot so any engine
        # summing the products in a different order (numpy pairwise
        # here, sequential fold in the DuckDB oracle) lands in the
        # same bucket: order-dependent float error is ~1e-13, far
        # below the rounding quantum.  Residual caveat: a dot landing
        # EXACTLY on a 0.5e-6 rounding boundary could still diverge
        # (np.round is half-to-even, Spark F.round HALF_UP, DuckDB
        # half-away-from-zero) — measure-zero for real-valued dots and
        # never observed on the test corpora, but not impossible.
        bits = np.round(mat @ planes, 6) > 0  # (n, tables*planes)
        per_table = bits.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(per_table.astype("int32")))

    return buckets
