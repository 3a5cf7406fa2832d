"""Round-2 similarity additions (SURVEY §2.11 ANN engineering).

s11: recall@k audit of the LSH-bucketed ANN path against the exact
brute-force ranking — the sketch-accuracy companion to d10 (MinHash
audit): production ANN is only trustworthy with a measured recall
number per index configuration.
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

from serverless_datalake_aws_spark.plans.similarity import _COS_ORACLE_EXPR

_K = 5


@query(
    "s11_ann_recall_audit",
    oracle=f"""
    WITH b AS (
        SELECT *,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        FROM embeddings
    ), q AS (SELECT * FROM b WHERE vec_id < 20),
    exact_sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q, embeddings e WHERE e.vec_id != q.vec_id
    ),
    exact_top AS (
        SELECT query_id, neighbor_id FROM exact_sims
        QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) <= {_K}
    ),
    ann_sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id != q.vec_id
    ),
    ann_top AS (
        SELECT query_id, neighbor_id FROM ann_sims
        QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) <= {_K}
    )
    SELECT x.query_id,
           count(a.neighbor_id) AS n_hit,
           round(count(a.neighbor_id) / {_K}.0, 6) AS recall
    FROM exact_top x
    LEFT JOIN ann_top a
      ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    GROUP BY x.query_id
    """,
)
def s11_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_K} of the sign-LSH bucketed ANN (s02's index) vs exact
    brute force, per query — the engineering gate for any approximate
    index (d10's audit pattern applied to vectors).

    Scale: the audit runs on a SAMPLE of queries (here vec_id < 20;
    production samples ~1e3), so the brute-force leg is
    O(sample × corpus) — a deliberate, bounded cost that certifies the
    O(corpus/buckets) serving path. Both legs broadcast the query side;
    recall joins are on slim (query, neighbor) ids."""
    # norms once per row; both scoring legs evaluate a single dot per
    # pair (same factored-fp convention as s01/s02/s05)
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
    rk = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")

    def top(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_rk", F.row_number().over(rk))
            .filter(F.col("_rk") <= _K)
            .select("query_id", "neighbor_id")
        )

    exact = top(
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    ann = top(
        emb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    hit = F.col("a.neighbor_id").isNotNull()
    return (
        exact.alias("x")
        .join(
            ann.alias("a"),
            (F.col("x.query_id") == F.col("a.query_id"))
            & (F.col("x.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .groupBy(F.col("x.query_id").alias("query_id"))
        .agg(
            F.count(F.when(hit, 1)).alias("n_hit"),
            F.round(F.count(F.when(hit, 1)) / _K, 6).alias("recall"),
        )
    )


@query(
    "s12_knn_graph",
    oracle=f"""
    WITH sims AS (
        SELECT q.vec_id AS src, e.vec_id AS dst, q.label AS label,
               {_COS_ORACLE_EXPR} AS cos_sim
        FROM embeddings q JOIN embeddings e
          ON q.label = e.label AND q.vec_id <> e.vec_id
    )
    SELECT src, dst, label, cos_sim, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY src
                    ORDER BY cos_sim DESC, dst) AS rk
          FROM sims)
    WHERE rk <= {_K}
    """,
)
def s12_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blocked k-NN graph (§2.11): top-{_K} cosine neighbors per
    vector inside its label block — the edge list that feeds semantic
    clustering / SemDeDup-style pruning downstream of d08's connected
    components.

    Scale: blocking bounds the pairwise cost at Σ|block|² (the s03
    contract); at 100 TB the block key is an IVF cell (s05) instead of
    a label, same plan. The within-block scoring is one BLAS matmul
    per label group (`applyInPandas` — the s03/s18 rewrite; the
    self-join + interpreted dot folds it replaces measured 3.7 s at
    sf0.1). The UDF pre-selects each source's top {_K + 16} UNROUNDED
    candidates — a 16-deep cushion for the 6-dp quantization — and the
    authoritative rounded ranking (F.round, row_number, dst tie-break)
    stays Spark-side, so both engines break ties identically; a
    candidate outside the cushion can only reach rounded-top-{_K} if
    16+ block-mates sit within 1e-6 of the boundary similarity."""
    import numpy as np
    import pandas as pd

    emit = _K + 16

    def _topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.stack(pdf["embedding"].values).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1)
        S = (V @ V.T) / (nrm[:, None] * nrm[None, :])
        np.fill_diagonal(S, -np.inf)
        n = len(pdf)
        k = min(emit, n - 1)
        if k <= 0:
            return pd.DataFrame(
                {"src": [], "dst": [], "label": [], "cos": []}
            ).astype({"src": "int64", "dst": "int64", "label": "int32",
                      "cos": "float64"})
        ids = pdf["vec_id"].values
        # (cos DESC, dst ASC) preselect — NOT bare argpartition: with a
        # block of exact-duplicate embeddings every pairwise cosine is
        # bit-identical and an unordered partition keeps an arbitrary
        # k, dropping the smallest-dst neighbors the final rounded
        # Spark/oracle ranking would have kept
        order = np.lexsort(
            (np.broadcast_to(ids, S.shape), -S), axis=1
        )
        top = order[:, :k]
        rows = np.repeat(np.arange(n), k)
        cols = top.ravel()
        return pd.DataFrame(
            {
                "src": ids[rows],
                "dst": ids[cols],
                "label": pdf["label"].values[rows],
                "cos": S[rows, cols],
            }
        )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cand = emb.groupBy("label").applyInPandas(
        _topk, schema="src long, dst long, label int, cos double"
    )
    rk = W.partitionBy("src").orderBy(F.col("cos_sim").desc(), "dst")
    return (
        cand.select(
            "src", "dst", "label", F.round("cos", 6).alias("cos_sim")
        )
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _K)
    )


@query(
    "s13_kmeans_convergence",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    seeds AS (SELECT vec_id AS cluster, e AS c FROM v WHERE vec_id < 8),
    d1 AS (
      SELECT v.vec_id, v.e, s.cluster,
             greatest(list_dot_product(v.e, v.e)
                      + list_dot_product(s.c, s.c)
                      - 2 * list_dot_product(v.e, s.c), 0) AS d2
      FROM v, seeds s
    ),
    a1 AS (
      SELECT vec_id, e, cluster FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
    ),
    pm AS (
      SELECT a1.cluster, g.i AS pos, round(avg(e[g.i]), 6) AS m
      FROM a1 CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY a1.cluster, g.i
    ),
    c1 AS (
      SELECT cluster, list(m ORDER BY pos) AS c FROM pm GROUP BY cluster
    ),
    shift AS (
      SELECT c1.cluster,
             round(sqrt(greatest(list_dot_product(c1.c, c1.c)
                      + list_dot_product(s.c, s.c)
                      - 2 * list_dot_product(c1.c, s.c), 0)), 6) AS shift1
      FROM c1 JOIN seeds s ON c1.cluster = s.cluster
    ),
    d2_ AS (
      SELECT v.vec_id, c1.cluster,
             greatest(list_dot_product(v.e, v.e)
                      + list_dot_product(c1.c, c1.c)
                      - 2 * list_dot_product(v.e, c1.c), 0) AS d2
      FROM v, c1
    ),
    a2 AS (
      SELECT vec_id, cluster, d2 FROM d2_
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
    )
    SELECT a2.cluster,
           count(*) AS n_members,
           round(avg(sqrt(a2.d2)), 6) AS avg_dist,
           any_value(s.shift1) AS centroid_shift
    FROM a2 JOIN shift s ON a2.cluster = s.cluster
    GROUP BY a2.cluster
    """,
)
def s13_kmeans_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations with a convergence metric (the
    s09 step iterated): assign → recompute centroids → measure each
    centroid's L2 shift → reassign against the new centroids. The
    per-cluster shift is THE stopping signal of distributed k-means;
    monitoring it is how the driver loop decides to stop.

    Determinism across engines: updated centroids are quantized to
    6 dp before the second assignment, so both engines argmin against
    identical arrays (an unrounded avg would differ by partial-sum
    order and could flip boundary assignments). All distances use the
    dot-product identity so folds accumulate in index order.

    Scale: per iteration — one broadcast of k centroids, one map-only
    assignment pass, one (cluster × dims)-cell shuffle for the update.
    The loop in production wraps THIS plan with per-iteration
    localCheckpoint (the d08/p02 lineage rule)."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.expr("transform(embedding, x -> cast(x as double))")
    v = emb.select("vec_id", e.alias("e"))
    seeds = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("e").alias("c")
    )

    def d2(a, b):
        return F.greatest(
            VX.dot(a, a) + VX.dot(b, b) - 2 * VX.dot(a, b), F.lit(0.0)
        )

    a1 = (
        v.crossJoin(F.broadcast(seeds))
        .select("vec_id", "e", "cluster", d2(F.col("e"), F.col("c")).alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("cluster", "e"), F.struct("d2", "cluster")
            ).alias("b")
        )
        .select(F.col("b.cluster").alias("cluster"), F.col("b.e").alias("e"))
    )
    c1 = (
        a1.select("cluster", F.posexplode("e").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
            ).alias("c")
        )
        .cache()
    )
    c1.count()  # materialize: read by shift + the second assignment
    shift = c1.join(
        seeds.withColumnRenamed("c", "c0"), "cluster"
    ).select(
        "cluster",
        F.round(F.sqrt(d2(F.col("c"), F.col("c0"))), 6).alias("shift1"),
    )
    a2 = (
        v.crossJoin(F.broadcast(c1))
        .select("vec_id", "cluster", d2(F.col("e"), F.col("c")).alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("cluster", "d2"), F.struct("d2", "cluster")
            ).alias("b")
        )
        .select(F.col("b.cluster").alias("cluster"), F.col("b.d2").alias("d2"))
    )
    return (
        a2.join(F.broadcast(shift), "cluster")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg(F.sqrt("d2")), 6).alias("avg_dist"),
            F.first("shift1").alias("centroid_shift"),
        )
    )


_DQ_ORACLE = """
        list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
            x -> CASE WHEN hi = lo THEN lo
                 ELSE lo + round((x - lo) / (hi - lo) * 255)
                      * (hi - lo) / 255 END)
"""
# hi = lo guard on BOTH sides (the s24 convention): a constant vector
# divides 0/0, which Spark's non-ANSI division answers NULL and
# DuckDB answers NaN — the two sort differently under DESC and poison
# every cosine the vector touches


@query(
    "s14_quantized_recall",
    oracle=f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS lo,
               list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS hi
        FROM embeddings
    ),
    v AS (
        SELECT vec_id, e, {_DQ_ORACLE} AS dq
        FROM base JOIN embeddings USING (vec_id)
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    exact_top AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id
        FROM q, v WHERE v.vec_id != q.vec_id
        QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY
            round(list_dot_product(q.e, v.e)
                  / (sqrt(list_dot_product(q.e, q.e))
                   * sqrt(list_dot_product(v.e, v.e))), 6) DESC,
            v.vec_id) <= {_K}
    ),
    quant_top AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id
        FROM q, v WHERE v.vec_id != q.vec_id
        QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY
            round(list_dot_product(q.dq, v.dq)
                  / (sqrt(list_dot_product(q.dq, q.dq))
                   * sqrt(list_dot_product(v.dq, v.dq))), 6) DESC,
            v.vec_id) <= {_K}
    )
    SELECT x.query_id,
           count(a.neighbor_id) AS n_hit,
           round(count(a.neighbor_id) / {_K}.0, 6) AS recall
    FROM exact_top x
    LEFT JOIN quant_top a
      ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    GROUP BY x.query_id
    """,
)
def s14_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_K} of int8-scalar-quantized search vs exact float
    search — the deployment gate for s06's compression scheme (s11
    measures the INDEX's recall; this measures what QUANTIZATION alone
    costs). Both legs brute-force so the difference is purely the
    storage precision.

    Scale: dequantized arrays and both norms are computed ONCE per
    vector in a cached projection; each scoring pass is then a single
    dot per pair (the s01 rule). The audit runs on a query sample."""
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
        F.array_min("embedding").cast("double").alias("lo"),
        F.array_max("embedding").cast("double").alias("hi"),
    )
    dq = F.expr(
        "transform(e, x -> CASE WHEN hi = lo THEN lo"
        " ELSE lo + round((x - lo) / (hi - lo) * 255)"
        " * (hi - lo) / 255 END)"
    )
    v = base.select(
        "vec_id",
        "e",
        dq.alias("dq"),
    ).select(
        "vec_id",
        "e",
        "dq",
        VX.norm(F.col("e")).alias("en"),
        VX.norm(F.col("dq")).alias("dqn"),
    ).cache()
    v.count()  # materialize: four consumers (two legs × two sides)
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("dq").alias("qdq"),
        F.col("en").alias("qen"),
        F.col("dqn").alias("qdqn"),
    )
    rk = W.partitionBy("query_id").orderBy(F.col("cs").desc(), "neighbor_id")

    def top(sim_col):
        return (
            v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(sim_col, 6).alias("cs"),
            )
            .withColumn("_rk", F.row_number().over(rk))
            .filter(F.col("_rk") <= _K)
            .select("query_id", "neighbor_id")
        )

    exact = top(VX.dot(F.col("qe"), F.col("e")) / (F.col("qen") * F.col("en")))
    quant = top(
        VX.dot(F.col("qdq"), F.col("dq")) / (F.col("qdqn") * F.col("dqn"))
    )
    hit = F.col("a.neighbor_id").isNotNull()
    return (
        exact.alias("x")
        .join(
            quant.alias("a"),
            (F.col("x.query_id") == F.col("a.query_id"))
            & (F.col("x.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .groupBy(F.col("x.query_id").alias("query_id"))
        .agg(
            F.count(F.when(hit, 1)).alias("n_hit"),
            F.round(F.count(F.when(hit, 1)) / _K, 6).alias("recall"),
        )
    )


@query(
    "s15_coreset_prototypes",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cent AS (
      SELECT label, g.i AS pos, avg(e[g.i]) AS m
      FROM v CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY label, g.i
    ),
    c AS (SELECT label, list(m ORDER BY pos) AS c FROM cent GROUP BY label),
    d AS (
      SELECT v.vec_id, v.label,
             round(sqrt(greatest(list_dot_product(v.e, v.e)
                      + list_dot_product(c.c, c.c)
                      - 2 * list_dot_product(v.e, c.c), 0)), 6) AS dist
      FROM v JOIN c USING (label)
    ),
    ranked AS (
      SELECT vec_id, label, dist,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist, vec_id) AS rk_close,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist DESC, vec_id) AS rk_far
      FROM d
    )
    SELECT vec_id, label, dist,
           CASE WHEN rk_close <= 3 THEN 'prototype' ELSE 'outlier' END
               AS role
    FROM ranked WHERE rk_close <= 3 OR rk_far <= 3
    """,
)
def s15_coreset_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype + outlier mining per label: the 3 vectors closest to
    their label centroid (prototypes — what coreset/herding selection
    keeps) and the 3 farthest (outliers — what quality pruning
    inspects first). The selection step behind SemDeDup-style semantic
    pruning of training data, downstream of s04's centroids.

    Scale: centroid aggregation shuffles (label × dims) cells;
    centroids broadcast back for a map-only distance pass; per-label
    top-k is a window over block-local rows. Distances use the
    dot-product identity (index-ordered folds) rounded before ranking
    so both engines order identically."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.expr("transform(embedding, x -> cast(x as double))")
    v = emb.select("vec_id", "label", e.alias("e")).cache()
    v.count()  # materialize: centroid agg + distance pass both read it
    cent = (
        v.select("label", F.posexplode("e").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
            ).alias("c")
        )
    )
    d2 = F.greatest(
        VX.dot(F.col("e"), F.col("e"))
        + VX.dot(F.col("c"), F.col("c"))
        - 2 * VX.dot(F.col("e"), F.col("c")),
        F.lit(0.0),
    )
    d = v.join(F.broadcast(cent), "label").select(
        "vec_id", "label", F.round(F.sqrt(d2), 6).alias("dist")
    )
    rk_close = F.row_number().over(
        W.partitionBy("label").orderBy("dist", "vec_id")
    )
    rk_far = F.row_number().over(
        W.partitionBy("label").orderBy(F.col("dist").desc(), "vec_id")
    )
    return (
        d.withColumn("rk_close", rk_close)
        .withColumn("rk_far", rk_far)
        .filter((F.col("rk_close") <= 3) | (F.col("rk_far") <= 3))
        .select(
            "vec_id",
            "label",
            "dist",
            F.when(F.col("rk_close") <= 3, "prototype")
            .otherwise("outlier")
            .alias("role"),
        )
    )


@query(
    "s16_bitext_mining",
    oracle=f"""
    WITH v AS (
        SELECT e.vec_id, d.lang, e.embedding,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    )
    SELECT q.vec_id AS vec1, e.vec_id AS vec2,
           q.lang AS lang1, e.lang AS lang2,
           {_COS_ORACLE_EXPR} AS cos_sim
    FROM v q JOIN v e
      ON q.bucket = e.bucket AND q.vec_id < e.vec_id
         AND q.lang <> e.lang
    WHERE {_COS_ORACLE_EXPR} >= 0.85
    """,
)
def s16_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext candidate mining (§2.11): cross-lingual document pairs
    whose embeddings are near-identical — the parallel-corpus mining
    step (CCMatrix/WMT lineage) that harvests translation pairs for
    multilingual training. Language comes from `documents`
    (doc_id ≡ vec_id); candidates must differ in language and clear a
    high cosine bar.

    Scale: the pair space is blocked by the s02 sign-LSH bucket (same
    index, reused), so cost is per-bucket, not N² — and the lang
    inequality prunes within buckets. At production scale the margin
    criterion (ratio to the k-th neighbor) replaces the absolute
    threshold; the plan is unchanged."""
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    v = (
        emb.join(docs, "vec_id")
        .withColumn("bucket", VX.bucket_by_signs(F.col("embedding"), n_dims=4))
        .withColumn("nrm", VX.norm(F.col("embedding")))
        .select("vec_id", "lang", "embedding", "bucket", "nrm")
        .cache()
    )
    v.count()  # materialize before the self-join
    a, b = v.alias("a"), v.alias("b")
    cos = VX.dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.lang") != F.col("b.lang")),
        )
        .select(
            F.col("a.vec_id").alias("vec1"),
            F.col("b.vec_id").alias("vec2"),
            F.col("a.lang").alias("lang1"),
            F.col("b.lang").alias("lang2"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.85)
    )
