"""Vector column expressions over array<float> embeddings (SURVEY §2.11).

Dot products and norms via `zip_with` + `aggregate` — JVM-side left
folds with deterministic summation order, so the DuckDB oracle
(`list_dot_product`, explicit list folds) produces bit-comparable
doubles; results are rounded before hashing regardless.

For the O(N·Q) hot loops (brute-force scoring, IVF cell assignment)
the fold expressions are the bottleneck at scale: Catalyst evaluates
higher-order-function lambdas interpreted, ~30M element-ops/s/core
(measured: 8.4 s for 200k×5×64 dims). `brute_scores` /
`nearest_centroid` below run the same float64 math as one BLAS matmul
per Arrow batch via mapInPandas — the sanctioned vectorized-UDF path —
leaving rounding to Spark-side F.round so the cross-engine rounding
rule (HALF_UP vs numpy's half-even) never changes. Summation order
differs from the fold (BLAS blocking), bounded by ~64·eps ≈ 1e-14 —
six orders below the 1e-6 rounding quantum the oracles compare at.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_scores(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Score every row of `df` against every query vector — the O(N·Q)
    brute-force pass as one float64 BLAS matmul per Arrow batch.
    Returns (neighbor_id, query_id, score) UNROUNDED; callers apply
    F.round so the cross-engine rounding rule stays Spark-side. The
    query set is a driver-held literal (it is the search request —
    bounded), broadcast inside the closure. `metric`: "cosine"
    (score column `cos_sim`, higher = closer) or "l2" (squared
    euclidean, column `d2`, lower = closer — the s19 PQ ground
    truth)."""
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    Qn = np.linalg.norm(Q, axis=1)
    out_col = "cos_sim" if metric == "cosine" else "d2"

    def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[emb_col].values).astype(np.float64)
            if metric == "cosine":
                nrm = np.linalg.norm(V, axis=1)
                # zero vectors have no direction: similarity 0 to
                # everything (0/0 would be NaN, silently poisoning
                # top-k ordering downstream)
                safe = np.where(nrm == 0.0, np.inf, nrm)
                S = (V @ Q.T) / (safe[:, None] * Qn[None, :])
            else:  # squared L2 via the dot identity (matches the SQL twin)
                S = (
                    (V * V).sum(axis=1)[:, None]
                    - 2.0 * (V @ Q.T)
                    + (Qn * Qn)[None, :]
                )
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "neighbor_id": np.repeat(pdf[id_col].values, len(qids)),
                    "query_id": np.tile(qids, n),
                    out_col: S.ravel(),
                }
            )

    return df.select(id_col, emb_col).mapInPandas(
        _score, schema=f"neighbor_id long, query_id long, {out_col} double"
    )


def nearest_centroid(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF coarse-quantization as a MAP-ONLY vectorized pass: each row
    gets the cid of its highest-cosine centroid (ties → smallest cid,
    matching the oracle's row_number ORDER BY sim DESC, cid). Passes
    the embedding and its norm through so the cell-search join reuses
    them. Sims are rounded to `round_to` BEFORE the argmax — the same
    quantization the SQL oracle ties on."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)  # ascending cid → argmax picks smallest on ties
    cids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    Cn = np.linalg.norm(C, axis=1)

    def _assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[emb_col].values).astype(np.float64)
            nrm = np.linalg.norm(V, axis=1)
            # zero vectors: similarity 0 everywhere -> argmax picks the
            # smallest cid DETERMINISTICALLY (NaN rows would make
            # np.argmax return 0 silently and arbitrarily)
            safe = np.where(nrm == 0.0, np.inf, nrm)
            S = np.round((V @ C.T) / (safe[:, None] * Cn[None, :]), round_to)
            best = cids[np.argmax(S, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    emb_col: pdf[emb_col].values,
                    "nrm": nrm,
                    "cid": best,
                }
            )

    return df.select(id_col, emb_col).mapInPandas(
        _assign,
        schema=f"{id_col} long, {emb_col} array<float>, nrm double, cid long",
    )


def bucket_by_signs(a: Column, n_dims: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: one bit per leading
    dimension's sign. 2^n_dims buckets; deterministic and
    SQL-reproducible. The scale path for ANN — candidates only join
    within a bucket."""
    bits = [
        F.when(F.element_at(a, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
