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

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query

try:  # self-contained UDF closures (see functions/semistructured.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_STRIDE = 256  # seed centroids = every _STRIDE-th vec_id. Two properties
# at once: (1) the seed count grows as N/_STRIDE, so mean cluster size —
# and with it the per-cluster pairwise cost — stays CONSTANT as the
# corpus grows (fixed k=8 measured 9.4x on the 10x fixture: quadratic);
# (2) stride sampling spreads seeds across the id space, so id-adjacent
# near-duplicates (the replica fixture's layout, or any ingest that
# clusters similar rows) cannot all become centroids the way `vec_id<k`
# selection let them. Assumes dense ids (row_number gives them at scale).
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
      SELECT vec_id AS cluster, e AS c, nrm AS cnrm
      FROM n WHERE vec_id % {_STRIDE} = 0
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

    Scale: the seed count is NOT fixed — every {_STRIDE}-th id is a
    seed, so mean cluster size (and the per-cluster pairwise cost) is
    constant and the total cost is LINEAR in the corpus (the fixed-k
    variant measured 9.4× on the 10× fixture — quadratic). Both hot
    loops are BLAS, not interpreted folds: assignment is the s05
    `nearest_centroid` map-only Arrow pass, and the within-cluster
    pairwise max is one `applyInPandas` matmul per cluster group — ONE
    shuffle total (on the cluster key), no row-pair materialization at
    all. Rounding stays Spark-side: max-of-rounded equals
    round-of-max because rounding is monotone, so the UDF returns the
    raw maximum. Seeds ride the closure (bounded up to k≈10⁵, ~25 MB
    at 64 dims); past that, produce centroids with the s09 k-means job
    and switch assignment to its broadcast-join form."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    seeds = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") % _STRIDE == 0)
        .select("vec_id", "embedding")
        .collect()
    ]
    assigned = VX.nearest_centroid(emb, seeds)  # vec_id, embedding, nrm, cid

    def _lower_max(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.stack(pdf["embedding"].values).astype(np.float64)
        nrm = pdf["nrm"].values
        S = (V @ V.T) / (nrm[:, None] * nrm[None, :])
        keep_lower = np.tril(np.ones(S.shape, dtype=bool), -1)
        m = np.where(keep_lower, S, -np.inf).max(axis=1, initial=-np.inf)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].values,
                "cluster": pdf["cid"].values,
                "max_lower": np.where(np.isfinite(m), m, -1.0),
            }
        )

    lower = assigned.groupBy("cid").applyInPandas(
        _lower_max, schema="vec_id long, cluster long, max_lower double"
    )
    return lower.select(
        "vec_id",
        "cluster",
        F.round("max_lower", 6).alias("max_lower_cos"),
        (F.round("max_lower", 6) < _EPS).alias("keep"),
    )
