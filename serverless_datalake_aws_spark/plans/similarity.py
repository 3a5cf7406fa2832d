"""Similarity search over `embeddings` (SURVEY.md §2.11).

s01 brute-force top-k cosine (the correctness baseline),
s02 LSH-bucketed ANN (the scale path: candidates only join inside a
    sign-pattern bucket),
s03 embedding-cosine near-dup pairs blocked by label,
s04 per-label centroid profile (vector aggregation).

All similarity math is double-precision left folds over the float
arrays, rounded to 6 decimals before ranking so Spark and DuckDB order
identically.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query

try:  # self-contained UDF closures (see functions/semistructured.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_COS_ORACLE_EXPR = """
    round(
      list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
      / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                               list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
       * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                               list_transform(e.embedding, x -> CAST(x AS DOUBLE))))), 6)
"""


@query(
    "s01_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 5),
    sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM sims)
    WHERE rk <= 10
    """,
)
def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (§2.11 ANN baseline): score every
    vector against the query set, rank per query. Exact but O(N·Q) —
    the yardstick the LSH variant is measured against.

    The N×Q scoring pass runs as one float64 BLAS matmul per Arrow
    batch (functions/vector.brute_scores, mapInPandas) instead of
    interpreted aggregate/zip_with folds — 12× at 200k vectors; the
    query set is collected driver-side (it IS the search request,
    bounded) and rides the closure. Rounding stays Spark-side F.round
    so the oracle's rounding rule is untouched."""
    emb = table(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .collect()
    ]
    sims = (
        VX.brute_scores(emb, queries)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)


@query(
    "s02_lsh_ann",
    oracle=f"""
    WITH b AS (
        SELECT *,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        FROM embeddings
    ), q AS (SELECT * FROM b WHERE vec_id < 20),
    sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM sims)
    WHERE rk <= 5
    """,
)
def s02_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN (§2.11 scale path): sign-pattern of
    the leading 4 dimensions = 16 hyperplane buckets; scoring joins only
    inside a bucket, cutting the candidate set ~16× (more planes at
    higher N). The equi-join on bucket is shuffle-friendly and
    broadcast-able for small query sets."""
    emb = table(spark, sf_dir, "embeddings").withColumn(
        "bucket", VX.bucket_by_signs(F.col("embedding"), n_dims=4)
    ).withColumn("nrm", VX.norm(F.col("embedding")))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = VX.dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    sims = (
        emb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "s05_ivf_ann",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
    assign AS (
        SELECT e.vec_id, e.embedding, e.label, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(
                     list_dot_product(list_transform(c.cemb, x -> CAST(x AS DOUBLE)),
                                      list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(list_transform(c.cemb, x -> CAST(x AS DOUBLE)),
                                              list_transform(c.cemb, x -> CAST(x AS DOUBLE))))
                      * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                              list_transform(e.embedding, x -> CAST(x AS DOUBLE))))), 6)
                     DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    ),
    cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    q AS (SELECT * FROM cells WHERE vec_id < 20),
    sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q JOIN cells e ON q.cid = e.cid AND e.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM sims)
    WHERE rk <= 5
    """,
)
def s05_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest of 8 deterministic centroids (the first 8 vectors), then
    search only within the query's cell. The search join is an
    equi-join on cell id. At 100 TB: k-means centroids, multi-cell
    probing, and the s04 centroid aggregation to refresh them.

    The assign step is MAP-ONLY: the C centroids (bounded — this is the
    IVF codebook, collected once like any ANN library's trained index)
    become literal vectors, and each row computes its argmax cell via a
    `greatest` over (sim, -cid) structs in one projection. The previous
    crossJoin(N×C) + row_number window shuffled N×C rows carrying the
    embedding arrays — measured 17× at 100× vectors, slower than brute
    force; the map-only assign removes that shuffle entirely (ties
    break to the smallest cid, matching the oracle's ORDER BY rn)."""
    emb = table(spark, sf_dir, "embeddings")
    cent_rows = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    # map-only vectorized assign (no N×C crossJoin, no window shuffle):
    # each Arrow batch runs one BLAS matmul against the 8-centroid
    # codebook; ties round-6 then break to the smallest cid, matching
    # the oracle's row_number ordering
    cells = VX.nearest_centroid(emb, cent_rows)
    q = cells.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cid").alias("q_cid"),
    )
    cos = VX.dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    sims = cells.join(
        F.broadcast(q),
        (F.col("cid") == F.col("q_cid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "s17_ivf_multiprobe",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(
                     list_dot_product(list_transform(c.cemb, x -> CAST(x AS DOUBLE)),
                                      list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(list_transform(c.cemb, x -> CAST(x AS DOUBLE)),
                                              list_transform(c.cemb, x -> CAST(x AS DOUBLE))))
                      * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                              list_transform(e.embedding, x -> CAST(x AS DOUBLE))))), 6)
                     DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    ),
    cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
    q AS (SELECT vec_id, embedding, cid, rn FROM assign WHERE vec_id < 20 AND rn <= 2),
    sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q JOIN cells e ON q.cid = e.cid AND e.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM sims)
    WHERE rk <= 5
    """,
)
def s17_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (the recall knob SCALE.md's ANN ladder promises):
    each query searches its TOP-2 centroid cells instead of one —
    recall recovers from boundary effects (a query near a cell edge
    misses true neighbors quantized across it) at exactly 2× the cell
    scan cost, still ≪ brute force. nprobe is the standard
    recall/latency dial of every IVF deployment (FAISS nprobe).

    Data vectors assign map-only (functions/vector.nearest_centroid);
    the 20 query probes — 40 (query, cell) rows — are computed
    driver-side with the same round-6 sim / smallest-cid tie rule and
    broadcast. Cells are disjoint so probing two cells never yields a
    duplicate (query, neighbor) pair."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    cent_rows = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    cells = VX.nearest_centroid(emb, cent_rows)
    cents = sorted(cent_rows)
    cids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    Cn = np.linalg.norm(C, axis=1)
    probes = []
    for r in emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        vn = float(np.linalg.norm(v))
        # half-away round (Spark/DuckDB rule), not np.round's half-even
        from serverless_datalake_aws_spark.operators.ann import np_round6

        sims_q = np_round6((C @ v) / (Cn * vn))
        order = np.lexsort((cids, -sims_q))  # sim desc, cid asc — oracle's rn
        for cid in cids[order[:2]]:
            probes.append(
                (int(r["vec_id"]), [float(x) for x in r["embedding"]], vn, int(cid))
            )
    qdf = spark.createDataFrame(
        probes, "query_id long, q_emb array<float>, q_nrm double, q_cid long"
    )
    cos = VX.dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    sims = cells.join(
        F.broadcast(qdf),
        (F.col("cid") == F.col("q_cid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "s03_embedding_neardup",
    oracle=f"""
    SELECT q.vec_id AS vec1, e.vec_id AS vec2, {_COS_ORACLE_EXPR} AS cos_sim
    FROM embeddings q JOIN embeddings e
      ON q.label = e.label AND q.vec_id < e.vec_id
    WHERE {_COS_ORACLE_EXPR} >= 0.5
    """,
)
def s03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by label (§2.11
    embedding near-dup): the label column is the blocking key, so the
    pairwise cost is per-block, not global.

    The within-block scoring is one BLAS matmul per label group
    (`applyInPandas`) — the self-join + interpreted zip_with dot fold
    it replaces measured 7.8 s at sf0.1 (the s18/t29 lesson: a blocked
    plan with interpreted per-pair folds is still slow). The UDF emits
    candidates with an epsilon slack under the threshold and Spark's
    F.round makes the authoritative >= 0.5 cut, so the cross-engine
    rounding rule (HALF_UP vs numpy half-even) never decides
    membership. One exchange (the label key), no pair materialization
    below the threshold."""
    import numpy as np
    import pandas as pd

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.stack(pdf["embedding"].values).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1)
        S = (V @ V.T) / (nrm[:, None] * nrm[None, :])
        # slack must exceed the rounding half-quantum (5e-7 for a 6dp
        # round): a true cosine in [0.4999995, 0.5) rounds UP to 0.5 on
        # both engines, so the pre-filter may not drop it — 1e-9 did
        i, j = np.nonzero(np.triu(S >= 0.5 - 1e-6, 1))
        ids = pdf["vec_id"].values
        return pd.DataFrame(
            {"vec1": ids[i], "vec2": ids[j], "cos": S[i, j]}
        )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    pairs = emb.groupBy("label").applyInPandas(
        _pairs, schema="vec1 long, vec2 long, cos double"
    )
    return pairs.select(
        "vec1", "vec2", F.round("cos", 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= 0.5)


@query(
    "s06_quantization_error",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS lo,
               list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS hi,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    err AS (
        SELECT vec_id, label,
               list_sum(list_transform(emb, x ->
                   abs(x - (lo + round((x - lo) / (hi - lo) * 255) * (hi - lo) / 255))
               )) / len(emb) AS mae
        FROM q
    )
    SELECT label,
           count(*) AS n_vectors,
           round(avg(mae), 6) AS avg_mae,
           round(max(mae), 6) AS max_mae
    FROM err
    GROUP BY label
    """,
)
def s06_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (per-vector min/max) + reconstruction
    error profile per label (§2.11 — the storage-compression step of an
    embedding pipeline: 4x smaller vectors, error accounted). All
    array-local math; one tiny aggregation shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    embd = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.select(
        "vec_id",
        "label",
        F.array_min(embd).alias("lo"),
        F.array_max(embd).alias("hi"),
        embd.alias("emb"),
    ).cache()  # pin lo/hi so the error map doesn't re-inline min/max
    # per element — unpersisted below after the tiny result materializes
    lo, hi = F.col("lo"), F.col("hi")
    recon_err = F.aggregate(
        F.transform(
            "emb",
            lambda x: F.abs(
                x - (lo + F.round((x - lo) / (hi - lo) * 255) * (hi - lo) / 255)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("emb")
    err = q.select("vec_id", "label", recon_err.alias("mae"))
    out = err.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("mae"), 6).alias("avg_mae"),
        F.round(F.max("mae"), 6).alias("max_mae"),
    )
    # label-count rows: materialize, then release the corpus-sized
    # cache instead of leaking it for the rest of the session
    rows = out.collect()
    q.unpersist()
    return spark.createDataFrame(rows, out.schema)


@query(
    "s04_label_centroids",
    oracle="""
    SELECT label, i AS dim,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_val,
           count(*) AS n_vectors
    FROM embeddings, generate_series(1, 8) AS gs(i)
    GROUP BY label, i
    """,
)
def s04_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid profile over the leading 8 dimensions (vector
    aggregation — the building block of IVF coarse quantization).
    posexplode → hash-agg; partial aggregation bounds the shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"),
        )
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
            F.count("*").alias("n_vectors"),
        )
    )


@query(
    "s10_mips_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
    scored AS (
      -- round BEFORE ranking (module convention, s01/s02/s05): DuckDB's
      -- list_dot_product is not the bit-identical left fold Spark's
      -- F.aggregate computes (measured ~4e-15 apart), so an unrounded
      -- ORDER BY could flip the rank-5/6 boundary across engines
      SELECT q.qid, v.vec_id, v.label,
             round(list_dot_product(v.e, q.qe), 6) AS dot
      FROM v, q
      WHERE v.vec_id >= 10
    )
    SELECT qid, vec_id, label, dot
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) <= 5
    ORDER BY qid, dot DESC, vec_id
    """,
)
def s10_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum inner-product search, top-5 per query — the retrieval
    objective of recommendation/dense-retrieval scorers, where the
    un-normalized dot (not cosine) ranks items and vector norms carry
    signal. Brute force here = the recall oracle.

    Scale path: MIPS reduces to cosine ANN by norm augmentation —
    append sqrt(M² − ‖x‖²) (M = max corpus norm) to every item and a 0
    to every query, making inner-product order equal cosine order —
    then the whole s02/s05/s08 ANN ladder applies unchanged. Queries
    broadcast; per-query top-k folds inside each partition before the
    final k-row merge."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.expr("transform(embedding, x -> cast(x as double))")
    v = emb.select("vec_id", "label", e.alias("e"))
    qs = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    scored = (
        v.filter(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(qs))
        # round BEFORE ranking (module convention): the engines' dot
        # folds differ in the last ulps, and the rank-5/6 boundary must
        # not depend on them
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(VX.dot(F.col("e"), F.col("qe")), 6).alias("dot"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("dot"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "label", "dot")
        .orderBy("qid", F.desc("dot"), "vec_id")
    )
