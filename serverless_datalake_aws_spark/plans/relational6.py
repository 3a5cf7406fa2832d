"""Sixth tranche: the remaining TPC-H query shapes (Q4, Q7, Q8, Q9,
Q12, Q14, Q19, Q21), adapted to the testdata schema (no partsupp /
commitdate / shipmode columns — equivalent predicates are derived from
the columns that exist). These fill out the delegated-SQL surface the
reference hands to Athena (`query-data-lambda.py:195-218`, SURVEY §2.7):
EXISTS semi-joins, multi-way n-way joins with derived dimensions,
conditional-ratio aggregates, OR-of-ANDs join predicates, and
double-correlated EXISTS/NOT EXISTS.

Scale notes: every lineitem self-join here keys on l_orderkey — the
natural co-partitioning key — so at 100 TB the three-way Q21 shape is
one shuffle, not three. Dimension joins (nation, region, part) are
broadcast by the planner (plan-asserted for the same pattern in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serverless_datalake_aws_spark.catalog import register_views
from serverless_datalake_aws_spark.plans import query


@query(
    "q44_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q44_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped (order-priority checking): correlated EXISTS
    against lineitem with a date-arithmetic predicate (ship >30 days
    after order stands in for commit<receipt, which testdata lacks).
    Catalyst rewrites the EXISTS into a left-semi hash join on
    l_orderkey."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q45_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q45_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped (volume shipping between two nations): a 6-way
    join where the two nation dims are broadcast and the symmetric
    nation-pair predicate is an OR across both join sides — Catalyst
    cannot push it to either scan, so it filters post-join, exactly as
    Presto plans it."""
    register_views(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 4) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                 AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """
    )


@query(
    "q46_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q46_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped (national market share): an 8-way join with a
    conditional-share aggregate — the numerator is a CASE inside SUM
    over the same rows as the denominator, one aggregation pass. All
    four dimension tables broadcast; lineitem⋈orders is the only big
    shuffle."""
    register_views(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    return spark.sql(
        """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                              ELSE 0 END) / sum(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region   ON n1.n_regionkey = r_regionkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
        """
    )


@query(
    "q47_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%green%' OR p_name LIKE '%2%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q47_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped (product-type profit): profit per supplier
    nation per year, with cost proxied by 0.6×p_retailprice×quantity
    (testdata has no partsupp.ps_supplycost). The p_name LIKE filter
    cannot push into a parquet min/max, but Catalyst still prunes part
    to two columns before the broadcast."""
    register_views(
        spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation")
    )
    return spark.sql(
        """
        SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS amount
            FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%green%' OR p_name LIKE '%2%'
        ) profit
        GROUP BY nation, o_year
        """
    )


@query(
    "q48_ship_delay_class",
    oracle="""
    SELECT delay_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o_orderpriority,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS delay_class
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ) t
    GROUP BY delay_class
    """,
)
def q48_ship_delay_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped (shipping-mode priority): per-category counts
    of high- vs low-priority lines, with the category derived from a
    date-arithmetic CASE (ship delay stands in for l_shipmode). Both
    CASE-sums compute in one aggregation pass over one join."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT delay_class,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM (
            SELECT o_orderpriority,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 'LATE' ELSE 'ONTIME' END AS delay_class
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
        ) t
        GROUP BY delay_class
        """
    )


@query(
    "q49_promo_revenue",
    oracle="""
    SELECT round(
        100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q49_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped (promotion effect): single-row conditional
    ratio — percent of one month's revenue from PROMO parts. The part
    join is broadcast; the date filter pushes to the lineitem scan so
    only ~1/80th of the table is read."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT round(
            100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
            / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        """
    )


@query(
    "q50_disjunctive_join",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q50_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped (discounted revenue, OR-of-ANDs): a disjunctive
    predicate spanning both join sides. Catalyst extracts the
    common-side conjuncts it can (brand/size terms prune part before
    the broadcast); the mixed terms evaluate post-join — the same split
    Presto's planner makes."""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 21)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """
    )


@query(
    "q51_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
)
def q51_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped (suppliers who kept orders waiting): the
    hardest correlation shape in the suite — one EXISTS plus one
    NOT EXISTS, both correlated to the same lineitem row on the same
    key. Late = shipped >60 days after order date (no receipt/commit
    dates in testdata). All three lineitem legs shuffle on l_orderkey
    once and co-partition; at 100 TB this is one exchange reused by a
    semi- and an anti-join."""
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders"))
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        """
    )
