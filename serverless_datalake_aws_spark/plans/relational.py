"""The delegated SQL surface (SURVEY.md §2.7).

The reference's entire analytical capability is one Athena passthrough
(`query-data-lambda.py:195-218` — submit SQL string, never fetch
results). This module supplies that relational operator set natively in
Spark: scans, projection/filter, every join flavor, hash aggregation,
grouping sets/rollup/cube, window functions, sorts/top-k, set ops,
subqueries/CTEs, and scalar-function parity.

Scale notes (100 TB): every query here is declarative DataFrame/SQL, so
Catalyst applies predicate pushdown, column pruning, and join selection;
dimension tables (region/nation/supplier) are explicitly broadcast;
large fact-fact joins shuffle on their keys and AQE handles skew. Double
aggregates are rounded to 4 decimals in BOTH engines so the
order-insensitive value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import register_views, table
from serverless_datalake_aws_spark.plans import query


def _r4(col):
    return F.round(col, 4)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → hash-agg → sort)
# The exact pipeline shape the reference delegates to Athena.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           -- scaled-integer sums: these reach multi-1e9 by sf0.1, where a
           -- double sum's 4th decimal flips with accumulation order
           -- (parity-trap "big double sums"); floor(x*scale + 0.5) is pure
           -- IEEE FP (bit-identical in both engines) and integer
           -- accumulation is order-free. floor+0.5 instead of round():
           -- Spark's round(double) detours through BigDecimal per row
           -- (measured ~1.6x on this scan-agg), floor stays in codegen.
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100                                            AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                               + 0.5) AS BIGINT)) AS DOUBLE) / 10000        AS sum_disc_price,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 1000000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1000000                   AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem — filter + 8-agg groupBy + sort.

    Reference parity: the Athena surface at query-data-lambda.py:195-218.
    Filter pushes to the parquet scan; aggregation is partial+final hash
    agg (map-side combine keeps the shuffle tiny at any scale).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            # scaled-integer sums (see oracle note): exact BIGINT
            # accumulation, one deterministic int->double cast at the end;
            # floor(x+0.5) not round() — round(double) leaves whole-stage
            # codegen for a per-row BigDecimal detour
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
                .cast("double")
                / 100
            ).alias("sum_base_price"),
            (
                F.sum(F.floor(disc_price * 10000 + 0.5).cast("long"))
                .cast("double")
                / 10000
            ).alias("sum_disc_price"),
            (
                F.sum(
                    F.floor(
                        disc_price * (1 + F.col("l_tax")) * 1000000 + 0.5
                    ).cast("long")
                )
                .cast("double")
                / 1000000
            ).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_quantity < 10
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan: projection + conjunctive range predicate (F2/F3).

    Reference parity: DynamoDB BETWEEN filter at query-data-lambda.py:138-140
    (applied post-scan there; pushed into the parquet row-group stats here).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        _r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + grouped revenue.

    customer is small relative to lineitem → broadcast; the
    orders⋈lineitem equi-join shuffles on the order key, the natural
    co-partitioning key at scale (bucketing candidate).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # no broadcast hint: customer scales with the fact side (150k
        # rows x SF) — at the 100 TB target the hint would exceed the
        # broadcast limit; small SFs auto-broadcast under AQE anyway
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q04_region_rollup",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q04_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins: customer ⋈ nation ⋈ region, both broadcast.

    nation (25 rows) and region (5 rows) never justify a shuffle at any
    scale — the plan must show BroadcastHashJoin on both.
    """
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            _r4(F.sum("c_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "q05_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q06_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q07_outer_join_coalesce",
    oracle="""
    SELECT c_custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           round(coalesce(o.spend, 0), 4) AS spend
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    """,
)
def q07_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + null fill — the reference's J1 enrichment-join
    semantics (index-data-lambda.py:134-155: missing metadata → stub row),
    collapsed from an N+1 get_item loop to one join stage."""
    cust = table(spark, sf_dir, "customer")
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("spend"))
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        _r4(F.coalesce("spend", F.lit(0.0))).alias("spend"),
    )


@query(
    "q08_window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def q08_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (the §2.7 window surface).

    Deterministic tie-break on o_orderkey so the result set is unique.
    At scale this is a single shuffle on the partition key; AQE splits
    skewed priorities.
    """
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "q09_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           round(coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 0), 4) AS prev_price
    FROM orders
    """,
)
def q09_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum + lag with an explicit ROWS frame."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_spend"
        ),
        _r4(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0))).alias("prev_price"),
    )


@query(
    "q10_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           -- integer cents: the GRAND-TOTAL group sums every order
           -- (~3.8e9 at sf0.01, ~3.8e10 at sf0.1) where a double
           -- sum's 4th decimal moves with accumulation order
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    orders = table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        # integer cents (see oracle note): exact BIGINT accumulation
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("double")
            / 100
        ).alias("total_price"),
    )


@query(
    "q11_cube_grouping",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q11_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() indicators distinguishing null-as-subtotal
    from null-as-value."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@query(
    "q12_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / UNION / EXCEPT chain (standard
    left-assoc precedence, matching the SQL oracle exactly)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    c = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    d = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    # plain set EXCEPT: the left side is already distinct, so
    # .subtract(d) ≡ the old .exceptAll(d.distinct()) minus d's
    # redundant extra hash-aggregate
    return a.intersect(b).union(c).distinct().subtract(d)


@query(
    "q13_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders,
           round(sum(DISTINCT o_totalprice), 4) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand-based two-phase plan in Spark)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        _r4(F.sum_distinct(F.col("o_totalprice"))).alias("sum_distinct_price"),
    )


@query(
    "q14_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q14_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — Spark plans TakeOrderedAndProject
    (per-partition top-k then driver merge; no full sort at any scale)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(20)
    )


@query(
    "q15_cte_scalar_subquery",
    oracle="""
    WITH avg_price AS (SELECT avg(o_totalprice) AS ap FROM orders)
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders, avg_price
    WHERE o_totalprice > 2 * ap
    """,
)
def q15_cte_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar subquery via spark.sql (Catalyst decorrelates)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH avg_price AS (SELECT avg(o_totalprice) AS ap FROM orders)
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders, avg_price
        WHERE o_totalprice > 2 * ap
        """
    )


@query(
    "q16_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q16_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q17_scalar_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_underscored,
           length(p_name) AS name_len,
           round(p_retailprice * 1.1, 2) AS price_with_tax,
           CASE WHEN p_size > 25 THEN 'large'
                WHEN p_size > 10 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM part
    """,
)
def q17_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function parity set (reference T9/T10/T11/T13 string ops +
    T2 arithmetic + CASE): all JVM-side builtins, whole-stage codegen."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        # F.concat (NULL-propagating) matches SQL concat; concat_ws
        # silently SKIPS a NULL operand and would emit ':TYPE'
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.regexp_replace("p_name", " ", "_").alias("name_underscored"),
        F.length("p_name").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        F.when(F.col("p_size") > 25, "large")
        .when(F.col("p_size") > 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@query(
    "q18_date_functions",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
           count(*) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q18_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function parity (reference T5/T6 timestamp handling)."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1996-01-01"
    )
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
    ).agg(F.count("*").alias("n"), _r4(F.sum("o_totalprice")).alias("total"))


@query(
    "q19_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q19_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (columnar re-shape) — conditional aggregation under the hood."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_r4(F.sum("l_quantity")))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@query(
    "q20_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q20_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to an
    aggregate + join, the same rewrite Presto/Athena would apply."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q21_range_join",
    oracle="""
    SELECT o_orderkey, count(*) AS n_parts_in_band
    FROM orders JOIN part
      ON p_retailprice BETWEEN o_totalprice / 400 - 5 AND o_totalprice / 400 + 5
    GROUP BY o_orderkey
    """,
)
def q21_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join via bucketize-then-refine.

    A naive broadcast-nested-loop join evaluates O(|orders|·|part|) band
    predicates (measured 13.5 s at sf0.1). Instead: bucket
    p_retailprice into width-10 cells, explode each order to the ≤2
    cells its ±5 window can touch, hash-equi-join on the cell, and
    refine with the exact predicate — the same plan shape that survives
    100 TB (shuffle ∝ input, candidates ∝ true matches).
    """
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").withColumn(
        "bucket", F.floor(F.col("p_retailprice") / 10)
    )
    band = F.col("o_totalprice") / 400
    o = orders.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(F.floor((band - 5) / 10), F.floor((band + 5) / 10))
            )
        ),
    )
    return (
        o.join(part, "bucket")
        .filter(F.col("p_retailprice").between(band - 5, band + 5))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_parts_in_band"))
    )
