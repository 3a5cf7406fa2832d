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
