"""Second tranche of the delegated SQL surface (SURVEY.md §2.7):
statistical aggregates, grouping sets, the full ranking-function suite,
IN/NOT-IN subqueries, string/regexp functions, UNION ALL, and an as-of
join (the classic time-series operator Spark lacks natively,
composed from a union + last-value window — no cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query


@query(
    "q22_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS std_price,
           -- variance ~9e8: scale to millions before rounding — a 2dp
           -- round demanded ~1e-11 relative agreement between two
           -- differently-ordered M2 accumulations
           round(var_samp(l_extendedprice) / 1e6, 4) AS var_price_mm,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q22_stat_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/exact median/correlation."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_extendedprice") / 1e6, 4).alias("var_price_mm"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    )


@query(
    "q23_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           -- integer cents: the () grouping set is the global orders
           -- total (order-sensitive at the 4dp scale — see q10)
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via spark.sql."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q24_rank_suite",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS top_key,
           lead(o_orderkey) OVER w AS next_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q24_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/analytic window suite in one plan (one shuffle,
    one sort, all functions share the frame)."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("top_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )


@query(
    "q25_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ) AND o_orderkey NOT IN (
        SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
    )
    """,
)
def q25_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (semi/anti-join rewrites by Catalyst)."""
    register_views(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        ) AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
        )
        """
    )


@query(
    "q26_union_all_stats",
    oracle="""
    -- integer cents: sum(amount) reaches ~3e10 by sf0.1 where a double
    -- sum's 4th decimal flips with accumulation order (parity-trap)
    SELECT side, count(*) AS n,
           CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS DOUBLE) / 100
               AS total
    FROM (
        SELECT 'order' AS side, o_totalprice AS amount FROM orders
        UNION ALL
        SELECT 'line' AS side, l_extendedprice AS amount FROM lineitem
    )
    GROUP BY side
    """,
)
def q26_union_all_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + aggregation over the union."""
    orders = table(spark, sf_dir, "orders").select(
        F.lit("order").alias("side"), F.col("o_totalprice").alias("amount")
    )
    lines = table(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("side"), F.col("l_extendedprice").alias("amount")
    )
    return (
        orders.unionAll(lines)
        .groupBy("side")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("amount") * 100, 0).cast("long"))
                .cast("double")
                / 100
            ).alias("total"),
        )
    )


@query(
    "q27_regexp_like",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt,
           CASE WHEN regexp_matches(p_type, '^(PROMO|ECONOMY)') THEN 1 ELSE 0 END
               AS is_cheap_type
    FROM part
    WHERE p_name LIKE '%w%' AND length(p_name) > 8
    """,
)
def q27_regexp_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / regexp predicate + extraction parity (reference T10/T11
    string ops; Presto regexp_* surface)."""
    part = table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%w%") & (F.length("p_name") > 8))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("is_bolt"),
            F.when(F.col("p_type").rlike(r"^(PROMO|ECONOMY)"), 1)
            .otherwise(0)
            .alias("is_cheap_type"),
        )
    )


@query(
    "q28_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS prev_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent view at-or-before each purchase).

    Spark has no native ASOF JOIN; the scalable composition is
    union-the-streams + last-value-ignoring-nulls window over
    (user_id, ts) — one shuffle on the key, no range explosion,
    identical semantics to DuckDB's ASOF LEFT JOIN (guide §Common
    OLAP patterns).
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("view_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("view_ts"),
    )
    # views sort before purchases at equal ts (is_purchase 0 < 1) so a
    # same-instant view is visible to the purchase — matching ASOF <=.
    unioned = purchases.withColumn("is_purchase", F.lit(1)).unionByName(
        views.withColumn("is_purchase", F.lit(0))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(
            "prev_view_ts", F.last("view_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            # ASOF's user equality never matches NULL; the window's
            # NULL partition would have paired NULL-user rows
            F.when(
                F.col("user_id").isNull(), F.lit(None).cast("timestamp")
            )
            .otherwise(F.col("prev_view_ts"))
            .alias("prev_view_ts"),
        )
    )
