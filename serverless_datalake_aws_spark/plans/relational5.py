"""Fifth tranche: TPC-H Q18/Q22-shaped queries — IN-over-aggregated
subqueries and multi-predicate anti-join analytics (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query


@query(
    "q39_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q39_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped (large-volume orders): IN over a grouped-HAVING
    subquery → semi-join against an aggregate. The aggregate subquery
    reuses the same shuffle key (orderkey) as the main join — at scale
    both sides co-partition, and the semi-join side is tiny after
    HAVING."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 4) AS total_qty
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        """
    )


@query(
    "q42_month_spine_gapfill",
    oracle="""
    WITH RECURSIVE spine(m) AS (
        SELECT TIMESTAMP '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < TIMESTAMP '2001-07-01'
    ),
    monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders GROUP BY 1
    )
    SELECT strftime(spine.m, '%Y-%m') AS month,
           coalesce(monthly.n, 0) AS n_orders,
           round(coalesce(monthly.total, 0), 4) AS total
    FROM spine LEFT JOIN monthly ON spine.m = monthly.m
    """,
)
def q42_month_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling via RECURSIVE CTE (Spark ≥4.0): a
    dense month spine left-joined to monthly aggregates, zero-filling
    empty months — the time-series reporting pattern Athena/Presto
    users run constantly. The spine is O(months) on the driver side of
    the plan; the aggregate is the only shuffle."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < TIMESTAMP '2001-07-01'
        ),
        monthly AS (
            SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n,
                   round(sum(o_totalprice), 4) AS total
            FROM orders GROUP BY 1
        )
        SELECT date_format(spine.m, 'yyyy-MM') AS month,
               coalesce(monthly.n, 0) AS n_orders,
               round(coalesce(monthly.total, 0), 4) AS total
        FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        """
    )


@query(
    "q43_bag_setops",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q43_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiplicity-preserving)
    semantics, complementing q12's set semantics."""
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    b = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersectAll(b).exceptAll(c)


@query(
    "q41_min_cost_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part p
    WHERE p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def q41_min_cost_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min: rows matching their group's
    minimum (Catalyst decorrelates to aggregate + join — the same
    rewrite Presto applies)."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part p
        WHERE p_retailprice = (
            SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


@query(
    "q40_global_sales_opportunity",
    oracle="""
    SELECT substr(c_name, 10, 2) AS cust_group,
           count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    GROUP BY substr(c_name, 10, 2)
    """,
)
def q40_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped (customers with money who never ordered):
    scalar-avg subquery + NOT EXISTS anti-join + substring grouping."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT substr(c_name, 10, 2) AS cust_group,
               count(*) AS n_customers,
               round(sum(c_acctbal), 4) AS total_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        GROUP BY substr(c_name, 10, 2)
        """
    )
