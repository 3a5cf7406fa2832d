"""Scalar-quantization ANN (SQ8) — the remaining rung of the
quantization ladder (s19 PQ → s21 IVF-PQ → s22 residual → s23 rerank):
instead of subspace codebooks, EVERY dimension is affinely mapped to a
byte using corpus-wide per-dimension [min, max]. SQ8 is what FAISS
calls IndexScalarQuantizer(QT_8bit) and what most vector stores use as
their cheap compression tier: 4× smaller than float32 with near-exact
recall, no codebook training, and decode is two FMAs per dim.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_SQ_NQ = 10  # queries: vec_id < 10
_SQ_SHORT = 20  # approx shortlist reranked exactly
_SQ_TOPK = 5

_SQ_ORACLE = f"""
    WITH dims AS (SELECT unnest(generate_series(1, 64)) AS pos),
    b AS (SELECT pos, min(CAST(embedding[pos] AS DOUBLE)) AS lo,
                 max(CAST(embedding[pos] AS DOUBLE)) AS hi
          FROM embeddings CROSS JOIN dims GROUP BY pos),
    cx AS (SELECT e.vec_id, d.pos, b.lo, b.hi,
                  CAST(floor(round(CASE WHEN b.hi = b.lo THEN 0
                       ELSE (CAST(e.embedding[d.pos] AS DOUBLE) - b.lo)
                            / (b.hi - b.lo) * 255 END, 6) + 0.5) AS BIGINT)
                      AS c
           FROM embeddings e CROSS JOIN dims d JOIN b ON b.pos = d.pos),
    xh AS (SELECT vec_id, list(lo + c * (hi - lo) / 255.0 ORDER BY pos)
                      AS xhat
           FROM cx GROUP BY vec_id),
    q AS (SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id < {_SQ_NQ}),
    ad AS (SELECT q.query_id, x.vec_id AS neighbor_id,
                  round(list_dot_product(q.qv, q.qv)
                        - 2 * list_dot_product(q.qv, x.xhat)
                        + list_dot_product(x.xhat, x.xhat), 6) AS approx_d2
           FROM q CROSS JOIN xh x WHERE x.vec_id <> q.query_id),
    cand AS (SELECT query_id, neighbor_id, approx_d2 FROM ad
             QUALIFY row_number() OVER (PARTITION BY query_id
                      ORDER BY approx_d2, neighbor_id) <= {_SQ_SHORT}),
    ev AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
    ex AS (SELECT c.query_id, c.neighbor_id, c.approx_d2,
                  round(list_dot_product(q.qv, q.qv)
                        - 2 * list_dot_product(q.qv, ev.v)
                        + list_dot_product(ev.v, ev.v), 6) AS exact_d2
           FROM cand c
           JOIN q ON q.query_id = c.query_id
           JOIN ev ON ev.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, approx_d2, exact_d2,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY exact_d2, neighbor_id) AS BIGINT) AS rk
    FROM ex
    QUALIFY row_number() OVER (PARTITION BY query_id
             ORDER BY exact_d2, neighbor_id) <= {_SQ_TOPK}
    ORDER BY query_id, rk
"""




@query("s24_sq8_ann_rerank", oracle=_SQ_ORACLE)
def s24_sq8_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization ANN with exact rerank: per-dimension
    corpus [lo, hi] bounds map each float to a byte code
    (floor(round((x-lo)/(hi-lo)·255, 6) + .5) — rounded to 6 dp before
    the floor so both engines mint identical codes), the approximate
    scan runs against the RECONSTRUCTED vectors (asymmetric distance:
    exact query vs dequantized corpus — FAISS's QT_8bit convention),
    and the top-{_SQ_SHORT} shortlist is reranked with exact float
    distances to protect recall at the top-{_SQ_TOPK}.

    Where this sits in the ladder: PQ (s19) is 32× but needs
    codebooks and pays a table lookup per subspace; SQ8 is 4× with
    code→value decode being two FMAs — the bandwidth tier most vector
    stores run before IVF/PQ kick in. Compose with s05/s21 cells for
    the asymptotic side.

    Scale shape: the bounds pass is one slim posexplode→(pos, x)
    aggregate (64 groups); the 128 bound doubles ride the plan as
    literal arrays (trained-index-rides-the-closure, as s05/s19);
    quantize + reconstruct + both distances are row-local
    zip_with/aggregate expressions — whole-stage codegen, no UDF, no
    shuffle carrying vectors; the only exchanges are the two top-k
    windows over 24-byte (query, neighbor, dist) triples."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    bounds = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("pos")
        .collect()  # bounded by construction: one row per dimension (64)
    )
    lo_a = F.array(*[F.lit(float(r["lo"])) for r in bounds])
    hi_a = F.array(*[F.lit(float(r["hi"])) for r in bounds])

    def _el(arr, i):
        return F.element_at(arr, i + 1)

    code = F.transform(
        F.col("v"),
        lambda x, i: F.floor(
            F.round(
                F.when(_el(hi_a, i) == _el(lo_a, i), F.lit(0.0)).otherwise(
                    (x - _el(lo_a, i)) / (_el(hi_a, i) - _el(lo_a, i)) * 255
                ),
                6,
            )
            + F.lit(0.5)
        ).cast("long"),
    )
    xhat = F.transform(
        code,
        lambda c, i: _el(lo_a, i)
        + c * (_el(hi_a, i) - _el(lo_a, i)) / F.lit(255.0),
    )
    corpus = emb.select("vec_id", xhat.alias("xhat"), "v")
    queries = emb.filter(F.col("vec_id") < _SQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ad = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                VX.dot(F.col("qv"), F.col("qv"))
                - 2 * VX.dot(F.col("qv"), F.col("xhat"))
                + VX.dot(F.col("xhat"), F.col("xhat")),
                6,
            ).alias("approx_d2"),
        )
    )
    wa = W.partitionBy("query_id").orderBy("approx_d2", "neighbor_id")
    cand = ad.withColumn("r", F.row_number().over(wa)).filter(
        F.col("r") <= _SQ_SHORT
    )
    ex = (
        cand.join(corpus.select(F.col("vec_id").alias("neighbor_id"), "v"), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_d2",
            F.round(
                VX.dot(F.col("qv"), F.col("qv"))
                - 2 * VX.dot(F.col("qv"), F.col("v"))
                + VX.dot(F.col("v"), F.col("v")),
                6,
            ).alias("exact_d2"),
        )
    )
    we = W.partitionBy("query_id").orderBy("exact_d2", "neighbor_id")
    return (
        ex.withColumn("rk", F.row_number().over(we).cast("long"))
        .filter(F.col("rk") <= _SQ_TOPK)
        .orderBy("query_id", "rk")
    )
