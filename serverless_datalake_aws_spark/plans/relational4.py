"""Fourth tranche: TPC-H-shaped multi-join analytics and time-hierarchy
rollups — the plans whose shape matters most at 100 TB (join ordering,
broadcast dims, single-shuffle hierarchies)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "q34_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q34_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join (local supplier volume).

    Plan shape for scale: lineitem⋈orders shuffles on the order key
    (the only big-big join); supplier/nation/region/customer are all
    broadcast. The c_nationkey = s_nationkey residual rides on the
    supplier join — no extra shuffle.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF: shuffle-join it (see q03 note)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q35_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    HAVING sum(l_extendedprice * (1 - l_discount)) > 100000
    """,
)
def q35_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: 4-way join + grouped
    revenue + HAVING. Customer/nation broadcast; the returnflag filter
    prunes lineitem at the scan (dictionary-filtered parquet)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-01-01"
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = table(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF: shuffle-join it (see q03 note)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("_rev"))
        .filter(F.col("_rev") > 100000)
        .select(
            "c_custkey", "c_name", "n_name", F.round("_rev", 4).alias("revenue")
        )
    )


@query(
    "q38_approx_aggs",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_customers,
           (abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
            <= 0.05 * count(DISTINCT o_custkey)) AS approx_within_5pct,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
           (abs(approx_quantile(o_totalprice, 0.9) - quantile_cont(o_totalprice, 0.9))
            <= 0.05 * quantile_cont(o_totalprice, 0.9)) AS p90_approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q38_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, approximate quantiles) —
    the scale substitutes for exact distinct/percentile (SURVEY §2.7).

    The sketch values themselves differ across engines by construction,
    so the verifiable contract is each engine's own error bound: the
    oracle hash-matches the exact values plus a boolean 'approx within
    5% of exact', computed per engine from its own sketch. Both
    algorithms (HLL++ / t-digest-family) sit well inside 5% here.

    Plan note: COUNT(DISTINCT) mixed with sketch/percentile aggregates
    forces Catalyst's Expand-based distinct plan, multiplying every
    other aggregate's work across the expanded rows (measured 25 s for
    the combined agg vs ~4 s split at sf0.1). The distinct leg runs as
    its own aggregation and joins back on the tiny group key instead —
    same one-pass shuffle count over the fact table, no Expand.
    """
    orders = table(spark, sf_dir, "orders")
    exact_d = F.countDistinct("o_custkey")
    # rsd=0.01: the default 5% relative error makes a 5% bound a coin
    # flip (1 sigma); at 1% the bound is 5 sigma — deterministic in practice
    approx_d = F.approx_count_distinct("o_custkey", rsd=0.01)
    p90_exact = F.percentile("o_totalprice", 0.9)
    p90_approx = F.percentile_approx("o_totalprice", 0.9)
    distinct_leg = orders.groupBy("o_orderpriority").agg(
        exact_d.alias("_exact_d")
    )
    sketch_leg = orders.groupBy("o_orderpriority").agg(
        approx_d.alias("_approx_d"),
        p90_exact.alias("_p90_exact"),
        p90_approx.alias("_p90_approx"),
    )
    return (
        distinct_leg.join(F.broadcast(sketch_leg), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("_exact_d").alias("exact_customers"),
            (
                F.abs(F.col("_approx_d") - F.col("_exact_d"))
                <= 0.05 * F.col("_exact_d")
            ).alias("approx_within_5pct"),
            F.round("_p90_exact", 4).alias("p90_exact"),
            (
                F.abs(F.col("_p90_approx") - F.col("_p90_exact"))
                <= 0.05 * F.col("_p90_exact")
            ).alias("p90_approx_within_5pct"),
        )
    )


@query(
    "e04_time_hierarchy_rollup",
    oracle="""
    WITH prepared AS (
        SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
               CAST(extract(hour FROM ts) AS BIGINT) AS hour,
               event_type, value
        FROM events
    )
    SELECT day,
           CASE WHEN grouping(hour) = 0 THEN hour END AS hour,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM prepared
    GROUP BY GROUPING SETS ((day, event_type), (day, hour, event_type))
    """,
)
def e04_time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: daily AND
    day+hour granularities in ONE pass via grouping sets (one shuffle
    feeds both levels — the timescaledb rollup pattern, Spark-first)."""
    ev = table(spark, sf_dir, "events")
    prepared = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
        "event_type",
        "value",
    )
    prepared.createOrReplaceTempView("_e04_prepared")
    return spark.sql(
        """
        SELECT day,
               CASE WHEN grouping(hour) = 0 THEN hour END AS hour,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM _e04_prepared
        GROUP BY GROUPING SETS ((day, event_type), (day, hour, event_type))
        """
    )
