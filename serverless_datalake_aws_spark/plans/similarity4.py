"""Round-4 semantic-dedup addition (SURVEY §2.11 embedding family).

s18: SemDeDup (Abbas et al. 2023) — cluster the embedding space, then
deduplicate ONLY within clusters: a vector is dropped when it is
ε-similar to any lower-id vector of the same cluster. The clustering
bounds the quadratic pairwise cost (global all-pairs is O(N²); per-
cluster it is O(Σ|c|²), and at production scale k grows with the corpus
so |c| stays bounded). s03 blocks by a GIVEN label; s18 *learns* the
blocks from the geometry — the difference between tagged and raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query

_K = 8  # seed centroids = vec_id < _K (deterministic, s09's convention)
_EPS = 0.4  # drop threshold on within-cluster cosine (synthetic corpus:
# within-cluster max-cosine tops out ~0.53, p90 ~0.40 — 0.4 makes the
# verdict column discriminate instead of rubber-stamping keep=true)


@query(
    "s18_semdedup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ),
    seeds AS (
      SELECT vec_id AS cluster, e AS c, nrm AS cnrm FROM n WHERE vec_id < {_K}
    ),
    best AS (
      SELECT vec_id, cluster, e, nrm FROM (
        SELECT n.vec_id, s.cluster, n.e, n.nrm,
               round(list_dot_product(n.e, s.c) / (n.nrm * s.cnrm), 6) AS cs
        FROM n, seeds s)
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cs DESC, cluster) = 1
    ),
    lower_sim AS (
      SELECT b.vec_id,
             max(round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6))
                 AS max_lower
      FROM best a JOIN best b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      GROUP BY b.vec_id
    )
    SELECT b.vec_id, b.cluster,
           round(COALESCE(p.max_lower, -1.0), 6) AS max_lower_cos,
           COALESCE(p.max_lower, -1.0) < {_EPS} AS keep
    FROM best b LEFT JOIN lower_sim p USING (vec_id)
    """,
)
def s18_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop verdicts: assign every vector to its nearest
    seed centroid by cosine (6-dp quantized argmax with centroid-id
    tie-break, the cross-engine-stable convention from s09), then drop
    a vector iff some lower-id member of its own cluster is within
    cosine ≥ {_EPS}. Output: vector, learned cluster, its max cosine to
    a lower-id cluster-mate (−1 when it is the cluster's first), keep.

    Scale: the k seed centroids broadcast, so assignment is a map-only
    pass (no shuffle of the corpus). The pairwise stage is a self
    equi-join ON THE CLUSTER KEY — shuffle ∝ input, pair cost bounded
    per cluster; at 100 TB you raise k so clusters stay ~10⁴ vectors
    (SemDeDup's own regime) and the plan is unchanged. Norms are
    computed once per vector before the join (3× less array math on
    the O(pairs) path, the s03 lesson)."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.expr("transform(embedding, x -> cast(x as double))")
    n = emb.select("vec_id", e.alias("e")).withColumn("nrm", VX.norm(F.col("e")))
    seeds = n.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cluster"),
        F.col("e").alias("c"),
        F.col("nrm").alias("cnrm"),
    )
    cs = F.round(
        VX.dot(F.col("e"), F.col("c")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    best = (
        n.crossJoin(F.broadcast(seeds))
        .select("vec_id", "cluster", "e", "nrm", cs.alias("cs"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cluster", "e", "nrm"),
                F.struct(F.col("cs"), (-F.col("cluster")).alias("neg")),
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.cluster").alias("cluster"),
            F.col("b.e").alias("e"),
            F.col("b.nrm").alias("nrm"),
        )
        .cache()
    )
    best.count()  # materialize once: both join legs below read it
    a, b = best.alias("a"), best.alias("b")
    pair_cos = F.round(
        VX.dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    lower_sim = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("b.vec_id").alias("vec_id"), pair_cos.alias("pc"))
        .groupBy("vec_id")
        .agg(F.max("pc").alias("max_lower"))
    )
    return best.join(lower_sim, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.round(F.coalesce(F.col("max_lower"), F.lit(-1.0)), 6).alias(
            "max_lower_cos"
        ),
        (F.coalesce(F.col("max_lower"), F.lit(-1.0)) < _EPS).alias("keep"),
    )
