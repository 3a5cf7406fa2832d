"""Product-quantization ANN (SURVEY §2.11 similarity-search surface).

PQ is the memory side of the ANN scale story the s-family already
covers for compute (LSH buckets s02, IVF cells s05, multiprobe s17):
a 64-dim float32 vector (256 B) compresses to M=8 one-byte codes —
32× — so a 100 TB embedding corpus's codes fit in ~3 TB and the ADC
scan reads codes, never vectors. Codebooks here are deterministic
(subvectors of the first K corpus vectors — the same 'trained index
rides the closure' convention as s05's IVF centroids); production
swaps in k-means per subspace, same shapes.

Everything is bit-replayable in SQL: distances are rounded to 6 dp
BEFORE the argmin/sum so both engines tie identically.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_PQ_K = 4  # centroids per subspace (codebook rows)
_PQ_M = 8  # subspaces
_PQ_SUB = 8  # dims per subspace (8 × 8 = 64)
_PQ_NQ = 10  # query set: vec_id < 10
_PQ_TOPK = 5

# SQL fragments: subvector m of a list column (DuckDB list_slice is
# 1-based inclusive), and squared L2 via the dot-product identity —
# rounded to 6 dp, which absorbs the ~1e-12 summation-order gap vs
# numpy's direct (a-b)² sum.
_SUB = (
    "list_transform(list_slice({col}, {m} * 8 + 1, {m} * 8 + 8),"
    " x -> CAST(x AS DOUBLE))"
)
_D2 = (
    "round(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}), 6)"
)

_PQ_ORACLE = f"""
    WITH sub AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    cents AS (SELECT vec_id AS k, embedding AS cemb FROM embeddings
              WHERE vec_id < {_PQ_K}),
    csub AS (
        SELECT c.k, s.m, {_SUB.format(col="c.cemb", m="s.m")} AS cv
        FROM cents c CROSS JOIN sub s),
    psub AS (
        SELECT e.vec_id, s.m, {_SUB.format(col="e.embedding", m="s.m")} AS v
        FROM embeddings e CROSS JOIN sub s),
    pdist AS (
        SELECT p.vec_id, p.m, c.k, {_D2.format(a="p.v", b="c.cv")} AS d2
        FROM psub p JOIN csub c ON p.m = c.m),
    codes AS (
        SELECT vec_id, m, k AS code FROM pdist
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) = 1),
    qsub AS (
        SELECT vec_id AS query_id, m, v FROM psub WHERE vec_id < {_PQ_NQ}),
    qdist AS (
        SELECT q.query_id, q.m, c.k, {_D2.format(a="q.v", b="c.cv")} AS qd2
        FROM qsub q JOIN csub c ON q.m = c.m),
    approx AS (
        SELECT qd.query_id, c.vec_id AS neighbor_id,
               round(sum(qd.qd2), 6) AS approx_d2
        FROM codes c
        JOIN qdist qd ON qd.m = c.m AND qd.k = c.code
        WHERE c.vec_id <> qd.query_id
        GROUP BY qd.query_id, c.vec_id)
    SELECT query_id, neighbor_id, approx_d2,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rk
          FROM approx)
    WHERE rk <= {_PQ_TOPK}
    ORDER BY query_id, rk
"""


@query("s19_pq_adc_ann", oracle=_PQ_ORACLE)
def s19_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    each vector is encoded as M=8 one-byte codes (nearest codebook
    centroid per 8-dim subspace); a query precomputes its M×K distance
    table and every corpus point's approximate distance is a TABLE
    LOOKUP sum — no vector arithmetic in the scan. Encode + ADC run in
    ONE map-only mapInPandas pass (codes never leave the batch); the
    only shuffle is the final top-k window over (query, neighbor,
    dist) triples — 24 bytes/row, query-partitioned.

    At 100 TB: codes are 32× smaller than vectors, the codebook and
    distance tables are driver-bounded broadcasts (K·M doubles per
    query — the trained-index-rides-the-closure convention shared with
    s05's IVF centroids), and the scan is embarrassingly parallel.
    Compose with s05's IVF cells for IVF-PQ: prune cells first, ADC
    within. Distances are rounded to 6 dp before the argmin (encode)
    and after the sum (ADC) so the DuckDB oracle reproduces codes,
    distances, and rank order exactly; ranking ties break on
    neighbor_id in both engines."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    cents = sorted(
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < _PQ_K)
        .select("vec_id", "embedding")
        .collect()
    )
    qrows = sorted(
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < _PQ_NQ)
        .select("vec_id", "embedding")
        .collect()
    )
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    Q = np.stack([np.asarray(q[1], dtype=np.float64) for q in qrows])
    qids = np.array([q[0] for q in qrows], dtype=np.int64)
    M, S = _PQ_M, _PQ_SUB
    Cm = C.reshape(_PQ_K, M, S)  # (K, M, S)
    # query ADC tables, rounded like the encode distances: (Q, M, K)
    Qm = Q.reshape(len(qids), M, S)
    dtab = np.round(
        ((Qm[:, None, :, :] - Cm[None, :, :, :]) ** 2).sum(axis=3), 6
    ).transpose(0, 2, 1)

    def _encode_adc(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf["embedding"].values).astype(np.float64)
            Vm = V.reshape(len(pdf), M, S)
            # (n, M, K) squared distances, rounded before argmin so
            # ties resolve to the smallest code in both engines
            d2 = np.round(
                ((Vm[:, :, None, :] - Cm.transpose(1, 0, 2)[None, :, :, :]) ** 2).sum(
                    axis=3
                ),
                6,
            )
            codes = d2.argmin(axis=2)  # (n, M); first occurrence = smallest k
            acc = np.zeros((len(pdf), len(qids)), dtype=np.float64)
            for m in range(M):
                acc += dtab[:, m, :][:, codes[:, m]].T  # (n, Q)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "neighbor_id": np.repeat(pdf["vec_id"].values, len(qids)),
                    "query_id": np.tile(qids, n),
                    "approx_d2": np.round(acc, 6).ravel(),
                }
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        _encode_adc, schema="neighbor_id long, query_id long, approx_d2 double"
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    return (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("query_id", "neighbor_id", "approx_d2", "rk")
        .orderBy("query_id", "rk")
    )
