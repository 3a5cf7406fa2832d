"""Tenth tranche: nested window analytics, truncated EWMA smoothing,
containment (asymmetric-Jaccard) dedup, and quantile-bucket assignment
via cut-point join — the concrete implementation of the "approx
cut points + range join" scale path documented for t12 in SCALE.md.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query

try:  # UDF closures must survive worker-side import (cwd ≠ repo root):
    # the shared shingle_pair_scores rides into applyInPandas closures
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass



@query(
    "q62_nested_windows",
    oracle="""
    WITH monthly AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
             sum(o_totalprice) AS rev
      FROM orders WHERE o_custkey < 300 GROUP BY 1, 2
    ),
    rolled AS (
      SELECT o_custkey, m, rev,
        avg(rev) OVER (PARTITION BY o_custkey ORDER BY m
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rev_3mo
      FROM monthly
    )
    SELECT strftime(m, '%Y-%m') AS month, o_custkey,
      round(rev_3mo, 4) AS rev_3mo,
      rank() OVER (PARTITION BY m ORDER BY rev_3mo DESC, o_custkey) AS rnk
    FROM rolled QUALIFY rnk <= 3
    """,
)
def q62_nested_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-over-window analytics: per-customer 3-month rolling
    revenue (first window, partitioned by customer) re-ranked within
    each month (second window, partitioned by month) — the two windows
    need different partitionings, so the plan is exactly two shuffles;
    neither is global."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH monthly AS (
          SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
                 sum(o_totalprice) AS rev
          FROM orders WHERE o_custkey < 300 GROUP BY 1, 2
        ),
        rolled AS (
          SELECT o_custkey, m, rev,
            avg(rev) OVER (PARTITION BY o_custkey ORDER BY m
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rev_3mo
          FROM monthly
        ),
        ranked AS (
          SELECT date_format(m, 'yyyy-MM') AS month, o_custkey,
            round(rev_3mo, 4) AS rev_3mo,
            rank() OVER (PARTITION BY m ORDER BY rev_3mo DESC, o_custkey) AS rnk
          FROM rolled
        )
        SELECT * FROM ranked WHERE rnk <= 3
        """
    )


@query(
    "e08_ewma",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, avg(value) AS v
      FROM events WHERE user_id < 5 GROUP BY 1, 2
    ),
    lists AS (
      SELECT user_id, h,
        list(v) OVER (PARTITION BY user_id ORDER BY h
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
      FROM hourly
    )
    SELECT user_id, strftime(h, '%Y-%m-%dT%H:%M:%S') AS hour,
      CAST(round(CAST(
        list_sum(list_transform(lst, (x, i) -> x * power(0.7, len(lst) - i)))
        / list_sum(list_transform(lst, (x, i) -> power(0.7, len(lst) - i)))
      AS DECIMAL(18,6)), 3) AS DOUBLE) AS ewma
    FROM lists
    """,
)
def e08_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3, normalized
    weights, 20-observation truncation): the recursive y_t = αx_t +
    (1-α)y_{t-1} has no closed window form, but the truncated
    normalized variant is a windowed collect_list + one weighted
    fold — array-local math after a single per-key window, so it
    scales like any partitioned window. Truncation error is (1-α)^20
    ≈ 0.08% of the weight mass."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    hourly = (
        ev.filter(F.col("user_id") < 5)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.avg("value").alias("v"))
    )
    w = W.partitionBy("user_id").orderBy("h").rowsBetween(-19, 0)
    lists = hourly.withColumn("lst", F.collect_list("v").over(w))
    # weights (1-a)^(n-i) with i the 1-based element index; both sums
    # are one aggregate over the same short array
    num = F.expr(
        "aggregate(zip_with(lst, sequence(1, size(lst)),"
        " (x, i) -> x * power(0.7, size(lst) - i)), 0D, (s, x) -> s + x)"
    )
    den = F.expr(
        "aggregate(transform(sequence(1, size(lst)),"
        " i -> power(0.7, size(lst) - i)), 0D, (s, x) -> s + x)"
    )
    return lists.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd'T'HH:mm:ss").alias("hour"),
        F.round((num / den).cast("decimal(18,6)"), 3).cast("double").alias("ewma"),
    )


@query(
    "d09_containment_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
        list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS sh
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
    )
    SELECT d1.doc_id AS doc1, d2.doc_id AS doc2,
      round(CAST(len(list_intersect(d1.sh, d2.sh)) AS DOUBLE)
            / least(len(d1.sh), len(d2.sh)), 4) AS containment
    FROM d d1 JOIN d d2
      ON d1.source = d2.source AND d1.doc_id < d2.doc_id
    -- zero-shingle guard mirrors the UDF's mn > 0: duckdb's 0/0 is
    -- version-dependent (NULL on 1.0, NaN under ieee ops — and
    -- NaN >= 0.2 is TRUE), so never let the division see a 0
    WHERE least(len(d1.sh), len(d2.sh)) > 0
      AND CAST(len(list_intersect(d1.sh, d2.sh)) AS DOUBLE)
          / least(len(d1.sh), len(d2.sh)) >= 0.2
    """,
)
def d09_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup (asymmetric Jaccard |A∩B| / min(|A|,|B|)):
    catches sub-document duplication — a short doc wholly contained in
    a longer one — which symmetric Jaccard (d03) under-scores. Same
    blocked incidence-matrix matmul as d03's rewrite (one applyInPandas
    per source block; the per-pair array_intersect self-join it
    replaces measured 3.9 s at sf0.1). Integer intersection / integer
    min keeps the ratio the same float64 in both engines — membership
    decided in the UDF with no epsilon. The sketch path at scale is
    the same MinHash bands (containment ≈ jaccard·(|A|+|B|)/2min)."""
    from serverless_datalake_aws_spark.plans.dedup import (
        shingle_pair_scores,
    )

    def _containment_pairs(pdf):
        return shingle_pair_scores(pdf, denom="min", out_col="cont_raw")

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    pairs = docs.groupBy("source").applyInPandas(
        _containment_pairs, schema="doc1 long, doc2 long, cont_raw double"
    )
    return pairs.select(
        "doc1", "doc2", F.round("cont_raw", 4).alias("containment")
    )


@query(
    "q63_quantile_buckets",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    ),
    bucketed AS (
      SELECT d.doc_id, d.n_chars, d.lang,
        CASE WHEN d.n_chars <= cuts.q1 THEN 'q1'
             WHEN d.n_chars <= cuts.q2 THEN 'q2'
             WHEN d.n_chars <= cuts.q3 THEN 'q3' ELSE 'q4' END AS bucket
      FROM documents d CROSS JOIN cuts
    )
    SELECT bucket, lang, count(*) AS n,
           min(n_chars) AS lo, max(n_chars) AS hi
    FROM bucketed GROUP BY bucket, lang
    """,
)
def q63_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-bucket assignment via broadcast cut points — the scale
    path SCALE.md prescribes over t12's exact global ntile: quartile
    boundaries reduce to one 3-value row (swap percentile() for
    approx_percentile at 100 TB), broadcast to a fully parallel CASE
    over the corpus. No global sort, no single-partition window."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH cuts AS (
          SELECT percentile(n_chars, 0.25) AS q1,
                 percentile(n_chars, 0.50) AS q2,
                 percentile(n_chars, 0.75) AS q3
          FROM documents
        ),
        bucketed AS (
          SELECT d.doc_id, d.n_chars, d.lang,
            CASE WHEN d.n_chars <= cuts.q1 THEN 'q1'
                 WHEN d.n_chars <= cuts.q2 THEN 'q2'
                 WHEN d.n_chars <= cuts.q3 THEN 'q3' ELSE 'q4' END AS bucket
          FROM documents d CROSS JOIN cuts
        )
        SELECT bucket, lang, count(*) AS n,
               min(n_chars) AS lo, max(n_chars) AS hi
        FROM bucketed GROUP BY bucket, lang
        """
    )
