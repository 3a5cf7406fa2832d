"""Third tranche of the delegated SQL surface (SURVEY §2.7): date
arithmetic, null semantics, argmax aggregates, array aggregation, and
RANGE window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "q29_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate) AS dow,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-06-01' AND TIMESTAMP '1996-08-31'
    """,
)
def q29_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic parity (T5/T6 surface): add/diff/last_day/dow/
    truncate. Dates are emitted as ISO strings — date-typed columns
    normalize differently across engines (date objects vs midnight
    timestamps) and would false-fail the value hash. DuckDB dayofweek
    == Spark dayofweek-1 (Sunday base differs), aligned explicitly."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-06-01", "1996-08-31")
    )
    iso = "yyyy-MM-dd"
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", iso).alias("order_date"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), iso).alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(F.last_day("o_orderdate"), iso).alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_format(F.date_trunc("week", "o_orderdate"), iso).alias("week_start"),
    )


@query(
    "q30_null_semantics",
    oracle="""
    SELECT c_custkey,
           coalesce(o.n, 0) AS n_orders,
           CASE WHEN o.n IS NULL THEN 'never' ELSE 'buyer' END AS kind,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           (c_acctbal IS NOT DISTINCT FROM o.maxp) AS odd_equality
    FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n, max(o_totalprice) AS maxp
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    """,
)
def q30_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling parity: COALESCE / IS NULL branches / NULLIF /
    null-safe equality (<=> vs IS NOT DISTINCT FROM)."""
    cust = table(spark, sf_dir, "customer")
    per = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.max("o_totalprice").alias("maxp"))
    )
    j = cust.join(per, cust.c_custkey == per.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.when(F.col("n").isNull(), "never").otherwise("buyer").alias("kind"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
        F.col("c_acctbal").eqNullSafe(F.col("maxp")).alias("odd_equality"),
    )


@query(
    "q31_argmax",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderdate,
             max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx,
             min(o_orderdate) OVER (PARTITION BY o_orderpriority) AS md
      FROM orders
    )
    SELECT o_orderpriority,
           min(o_orderkey) FILTER (WHERE o_totalprice = mx) AS biggest_order,
           round(max(o_totalprice), 4) AS biggest_price,
           min(o_orderkey) FILTER (WHERE o_orderdate = md) AS earliest_order
    FROM w
    GROUP BY o_orderpriority
    """,
)
def q31_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by — Presto surface fns)
    with an EXPLICIT smallest-key tie-break: plain arg_max is
    engine-dependent on ordering-value ties, and sf0.1 has two orders
    sharing a group's max o_totalprice (found by the full-registry
    sf0.1 parity sweep — absent at the sf0.001/sf0.01 gates). Spark
    breaks the tie via struct-ordered max_by/min_by; the oracle via
    window-max + filtered min — two different algorithms, same
    deterministic answer."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.max_by(
            "o_orderkey",
            F.struct(
                F.col("o_totalprice").alias("v"),
                (-F.col("o_orderkey")).alias("nk"),
            ),
        ).alias("biggest_order"),
        F.round(F.max("o_totalprice"), 4).alias("biggest_price"),
        F.min_by(
            "o_orderkey",
            F.struct(
                F.col("o_orderdate").alias("v"),
                F.col("o_orderkey").alias("k"),
            ),
        ).alias("earliest_order"),
    )


@query(
    "q32_array_agg",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(c_custkey)), ',') AS customers,
           len(list(c_custkey)) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9500
    GROUP BY n_name
    """,
)
def q32_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list + sort for determinism) — the
    DataFrame-native form of the reference's per-group bucketing (A1).
    Serialized to a joined string so the cross-engine value hash never
    sees engine-specific array representations."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    nat = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                # sort numerically BEFORE stringifying (lexicographic
                # string sort would disagree with the oracle's list_sort)
                F.transform(
                    F.array_sort(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("customers"),
            F.count("*").alias("n_customers"),
        )
    )


@query(
    "q33_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING), 4) AS band_total
    FROM orders
    """,
)
def q33_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frames (value-based, not row-based): peers within
    ±10000 of each order's price inside the customer partition."""
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("band_total"),
    )
