"""Product-quantization ADC (asymmetric distance computation) — the
final rung of the §2.11 ANN ladder (s01 brute → s02 LSH → s05 IVF →
s08 PQ). Vectors are split into 4 subspaces of 16 dims; each subspace
is coarse-coded by the sign pattern of its first 4 dims (16 cells) and
represented by the cell's mean subvector (the deterministic stand-in
for a k-means codebook, so the whole pipeline is oracle-reproducible).
A query then scores the corpus from a 4×16 lookup table of
query·centroid dots instead of 64-dim exact math — the classic
IVFADC trick (Jégou et al., and the PAPERS.md block-then-refine
pattern).

Scale story: codebook build is one groupBy over (subspace, code,
position) — shuffle ∝ 64 × corpus, map-side combined to 4×16×16 rows.
The per-query lookup table is 64 rows, broadcast; corpus scoring is a
broadcast join + sum — no pairwise math, no big shuffle. At 100 TB the
codebook is periodically refreshed and cached; queries never touch raw
vectors until an (optional) exact re-rank of the shortlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.functions import vector as VX
from serverless_datalake_aws_spark.plans import query

_M = 4  # subspaces
_SUB = 16  # dims per subspace


def _subspace_frames(emb):
    """(vec_id, m, code, sub): one row per vector per subspace with its
    4-bit sign code and the 16-dim subvector (doubles)."""
    e = F.expr("transform(embedding, x -> cast(x as double))")
    rows = emb.select("vec_id", e.alias("e")).select(
        "vec_id",
        F.explode(F.array(*[F.lit(m) for m in range(_M)])).alias("m"),
        F.col("e"),
    )
    base = F.col("m") * _SUB
    bit = lambda k, w: F.when(  # noqa: E731
        F.element_at("e", (base + k).cast("int")) > 0, F.lit(w)
    ).otherwise(F.lit(0))
    code = (bit(1, 1) + bit(2, 2) + bit(3, 4) + bit(4, 8)).cast("long")
    sub = F.slice("e", (base + 1).cast("int"), _SUB)
    return rows.select("vec_id", "m", code.alias("code"), sub.alias("sub"))


@query(
    "s08_pq_adc",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id, m.m,
        CAST(CASE WHEN e[16*m.m + 1] > 0 THEN 1 ELSE 0 END
           + CASE WHEN e[16*m.m + 2] > 0 THEN 2 ELSE 0 END
           + CASE WHEN e[16*m.m + 3] > 0 THEN 4 ELSE 0 END
           + CASE WHEN e[16*m.m + 4] > 0 THEN 8 ELSE 0 END AS BIGINT) AS code,
        list_slice(e, 16*m.m + 1, 16*m.m + 16) AS sub
      FROM v, (SELECT unnest([0,1,2,3]) AS m) m
    ),
    expanded AS (
      SELECT m, code, p.pos AS pos, p.val AS val
      FROM (SELECT m, code,
              unnest(list_transform(sub, (x, i) -> struct_pack(pos := i, val := x))) AS p
            FROM codes) t
    ),
    cells AS (
      SELECT m, code, pos, avg(val) AS c FROM expanded GROUP BY m, code, pos
    ),
    q AS (SELECT m.m, list_slice(e, 16*m.m + 1, 16*m.m + 16) AS qsub
          FROM v, (SELECT unnest([0,1,2,3]) AS m) m WHERE vec_id = 0),
    cell_dots AS (
      SELECT cells.m, cells.code, sum(cells.c * q.qsub[cells.pos]) AS d
      FROM cells JOIN q ON cells.m = q.m
      GROUP BY cells.m, cells.code
    ),
    approx AS (
      SELECT codes.vec_id AS vid, round(sum(cd.d), 6) AS approx_dot
      FROM codes JOIN cell_dots cd ON codes.m = cd.m AND codes.code = cd.code
      WHERE codes.vec_id <> 0
      GROUP BY codes.vec_id
    ),
    exact AS (
      SELECT a.vec_id AS vid, round(list_dot_product(a.e, b.e), 6) AS exact_dot
      FROM v a, (SELECT e FROM v WHERE vec_id = 0) b WHERE a.vec_id <> 0
    )
    SELECT approx.vid AS vec_id, approx_dot, exact_dot,
           round(abs(approx_dot - exact_dot), 6) AS abs_err
    FROM approx JOIN exact ON approx.vid = exact.vid
    ORDER BY approx_dot DESC, vec_id LIMIT 50
    """,
)
def s08_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC shortlist for query vec_id=0: top-50 by approximate dot
    (sum of 4 query·centroid table lookups) with the exact dot and the
    approximation error alongside — the audit a pipeline runs before
    trusting a quantized index."""
    emb = table(spark, sf_dir, "embeddings")
    frames = _subspace_frames(emb).cache()
    frames.count()  # materialize: read by codebook build AND scoring
    # codebook: mean subvector per (subspace, code)
    cells = (
        frames.select(
            "m", "code", F.posexplode("sub").alias("pos0", "val")
        )
        .withColumn("pos", F.col("pos0") + 1)
        .groupBy("m", "code", "pos")
        .agg(F.avg("val").alias("c"))
    )
    # per-query lookup table: dot(query subvector, centroid) per cell
    qsub = (
        frames.filter(F.col("vec_id") == 0)
        .select("m", F.col("sub").alias("qsub"))
    )
    cell_dots = (
        cells.join(F.broadcast(qsub), "m")
        .withColumn("qv", F.element_at("qsub", F.col("pos").cast("int")))
        .groupBy("m", "code")
        .agg(F.sum(F.col("c") * F.col("qv")).alias("d"))
    )
    approx = (
        frames.filter(F.col("vec_id") != 0)
        .join(F.broadcast(cell_dots), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d"), 6).alias("approx_dot"))
    )
    e = F.expr("transform(embedding, x -> cast(x as double))")
    v = emb.select("vec_id", e.alias("e"))
    qv = v.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    exact = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(VX.dot(F.col("e"), F.col("qe")), 6).alias("exact_dot"),
        )
    )
    return (
        approx.join(exact, "vec_id")
        .select(
            "vec_id",
            "approx_dot",
            "exact_dot",
            F.round(F.abs(F.col("approx_dot") - F.col("exact_dot")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy(F.desc("approx_dot"), "vec_id")
        .limit(50)
    )


@query(
    "s09_kmeans_step",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    seeds AS (SELECT vec_id AS cluster, e AS c FROM v WHERE vec_id < 8),
    dists AS (
      SELECT v.vec_id, s.cluster,
             greatest(list_dot_product(v.e, v.e) + list_dot_product(s.c, s.c)
                      - 2 * list_dot_product(v.e, s.c), 0) AS d2
      FROM v, seeds s
    ),
    best AS (
      SELECT vec_id, cluster, d2
      FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
    ),
    stats AS (
      SELECT cluster, count(*) AS n, round(avg(sqrt(d2)), 6) AS avg_dist
      FROM best GROUP BY cluster
    ),
    pos_means AS (
      SELECT b.cluster, g.i AS pos, avg(v.e[g.i]) AS m
      FROM best b JOIN v USING (vec_id)
      CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY b.cluster, g.i
    ),
    norms AS (
      SELECT cluster, round(sqrt(sum(m * m)), 6) AS centroid_norm
      FROM pos_means GROUP BY cluster
    )
    SELECT cluster, n, avg_dist, centroid_norm
    FROM stats JOIN norms USING (cluster)
    ORDER BY cluster
    """,
)
def s09_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full k-means Lloyd iteration (k=8, seeds = vec_id < 8):
    assign every vector to its nearest centroid by squared L2 (via the
    dot-product identity ||a-b||^2 = a.a + b.b - 2 a.b so both engines
    accumulate in the same order), then recompute per-cluster size,
    mean member distance, and the new centroid's norm. Iterating this
    plan to convergence IS distributed k-means — each round is exactly
    this job.

    Scale: centroids are k rows — broadcast, so assignment is a
    map-only pass over the corpus (no shuffle of the big side);
    min_by folds the k candidates per vector map-side. The centroid
    update shuffles only (cluster, pos) pairs — k x dims cells — after
    partial aggregation. At 100 TB: identical plan, k in the
    thousands, centroids still broadcast-sized."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.expr("transform(embedding, x -> cast(x as double))")
    v = emb.select("vec_id", e.alias("e"))
    seeds = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("e").alias("c")
    )
    d2 = F.greatest(
        VX.dot(F.col("e"), F.col("e"))
        + VX.dot(F.col("c"), F.col("c"))
        - 2 * VX.dot(F.col("e"), F.col("c")),
        F.lit(0.0),
    )
    dists = v.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cluster", "e", d2.alias("d2")
    )
    best = (
        dists.groupBy("vec_id")
        .agg(
            F.min_by(F.struct("cluster", "d2", "e"), F.struct("d2", "cluster")).alias(
                "b"
            )
        )
        .select(
            "vec_id",
            F.col("b.cluster").alias("cluster"),
            F.col("b.d2").alias("d2"),
            F.col("b.e").alias("e"),
        )
        .cache()
    )
    best.count()  # materialize eagerly: both branches below read it, and
    # an unmaterialized cache feeding two consumers computes twice (d05 trap)
    stats = best.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.sqrt("d2")), 6).alias("avg_dist"),
    )
    pos_means = (
        best.select("cluster", F.posexplode("e").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"))
    )
    norms = pos_means.groupBy("cluster").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    return stats.join(F.broadcast(norms), "cluster").orderBy("cluster")
