"""Eleventh tranche of the Athena-delegated SQL surface
(`query-data-lambda.py:195-218`, SURVEY §2.7): TPC-H Q13 custdist,
running distinct-count windows, error-safe try_* expressions, bitmap
aggregates, the oracle-proven skew-salted join, positional window
functions, and Spark 4 VARIANT shredding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "q64_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q64_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers
    placed how many non-urgent orders, zero-order customers included —
    a left-outer join whose non-key predicate must stay in the join
    condition (moving it to WHERE would silently drop the NULL rows),
    feeding count-of-counts. Adapted: orders has no o_comment in the
    testdata, so the Q13 NOT LIKE filter becomes o_orderpriority.

    Scale: the outer join shuffles both sides on custkey; the first
    aggregation reuses that partitioning (no extra exchange), and the
    second groups on ~dozens of distinct counts — map-side combined to
    nearly nothing."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q65_running_distinct",
    oracle="""
    SELECT event_id, event_type,
           count(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS users_so_far
    FROM events
    WHERE user_id < 50
    """,
)
def q65_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type — the audience-reach
    curve. Spark has no DISTINCT window aggregate, so the idiomatic
    rewrite is size(collect_set()) over the growing frame: the set
    updates incrementally per row (no per-row rescan), bounded by the
    distinct-key cardinality of the partition, which the user_id filter
    keeps small by construction — the same bound a reach dashboard
    enforces at 100 TB by sketching (HLL) instead of exact sets."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.size(F.collect_set("user_id").over(w)).cast("long").alias("users_so_far"),
    )


@query(
    "q66_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice / nullif(l_quantity - 25, 0)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS risky_ratio,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int,
           TRY_CAST(substr(CAST(l_shipdate AS VARCHAR), 1, 4) AS INT) AS ship_year,
           coalesce(CAST(round(CAST(l_extendedprice / nullif(l_quantity - 25, 0)
                AS DECIMAL(18,6)), 4) AS DOUBLE), 0.0) AS ratio_filled
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
)
def q66_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (ANSI try_* family): division that
    nulls on zero instead of failing the job, casts that null on
    malformed input — the contract that keeps a 1000-executor job from
    dying on one bad row (the reference's per-record try/except at
    `lambda-function.py:266-270`, as expressions). DuckDB spells
    try_divide as x / nullif(y, 0) and try_cast as TRY_CAST."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    # decimal-round in both engines: bare double round() disagrees at
    # .xxxx5 midpoints (see e07 / memory traps)
    ratio = F.round(
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).cast(
            "decimal(18,6)"
        ),
        4,
    ).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ratio.alias("risky_ratio"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.substring(F.col("l_shipdate").cast("string"), 1, 4)
        .try_cast("int")
        .alias("ship_year"),
        F.coalesce(ratio, F.lit(0.0)).alias("ratio_filled"),
    )


@query(
    "q67_linenumber_bitmaps",
    oracle="""
    WITH bm AS (
      SELECT l_orderkey,
             bit_or(1 << l_linenumber) AS line_bitmap,
             bit_xor(l_suppkey) AS supp_xor
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT line_bitmap, count(*) AS n_orders,
           min(supp_xor) AS min_supp_xor
    FROM bm
    GROUP BY line_bitmap
    ORDER BY n_orders DESC, line_bitmap
    """,
)
def q67_linenumber_bitmaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index aggregation: per-order presence bitmap of line
    numbers via bit_or(1 << n) — the roaring-bitmap pattern for 'which
    positions exist' in one long instead of an array — plus bit_xor as
    the order's supplier parity check, then a count-of-bitmaps
    histogram. Integer-exact in both engines; the second aggregate's
    key space is tiny (2^7 patterns) so it collapses map-side."""
    li = table(spark, sf_dir, "lineitem")
    bm = li.groupBy("l_orderkey").agg(
        F.bit_or(F.expr("shiftleft(1L, l_linenumber)")).alias("line_bitmap"),
        F.bit_xor("l_suppkey").alias("supp_xor"),
    )
    return (
        bm.groupBy("line_bitmap")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("supp_xor").alias("min_supp_xor"),
        )
        .orderBy(F.desc("n_orders"), "line_bitmap")
    )


@query(
    "q68_salted_join",
    oracle="""
    SELECT s.s_nationkey, count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey
    """,
)
def q68_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join as a first-class query: the fact table's rows
    scatter over 8 random salt buckets, the supplier side replicates to
    every bucket, and the join runs on (key, salt) — the manual fix for
    a hot key that AQE's skew split can't reach (operators/skew.py).
    The oracle is the PLAIN join: salting must be result-invariant,
    and this entry makes the driver prove it every round."""
    from serverless_datalake_aws_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), supp, "s_suppkey", salt=8
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "q69_nth_value_offsets",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           nth_value(o_orderkey, 3) OVER w AS third_key,
           lag(o_totalprice, 2, -1.0) OVER w AS lag2_price,
           lead(o_orderkey, 3) OVER w AS lead3_key
    FROM orders
    WHERE o_orderkey < 5000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q69_nth_value_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining offset/positional window functions: nth_value
    over an explicit running frame, lag with a non-null default, lead
    with a long offset — completing q24's ranking suite. All three
    share one window spec: one shuffle, one sort, streamed frames."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("lag2_price"),
        F.lead("o_orderkey", 3).over(w).alias("lead3_key"),
    )


@query(
    "q70_variant_shred",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           round(sum(value), 4) AS total_value,
           min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q70_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT shredding (the lakehouse upgrade of the
    reference's json.loads-per-record, `index-data-lambda.py:128`):
    props parses once into Spark 4's VariantType binary encoding, typed
    paths shred out via variant_get, and the aggregation runs on the
    shredded ints. Unlike string get_json_object (e02), variant parse
    happens once per row with typed access after — at 100 TB the parse
    cost amortizes across every extracted path, and a shredded-parquet
    writer materializes hot paths columnar."""
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


@query(
    "q71_null_ordering_topk",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderpriority, '1-URGENT') AS pri,
           o_totalprice
    FROM orders
    ORDER BY pri DESC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q71_null_ordering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-placement ordering under a LIMIT — the one spot
    where null-ordering semantics change the result SET, not just its
    order. The engines' defaults differ (Spark: NULLS FIRST on ASC,
    NULLS LAST on DESC; DuckDB: NULLS LAST on both) — portable SQL must
    spell it out, so this query pins NULLS LAST explicitly in both.
    Plans as TakeOrderedAndProject: per-partition top-100 + driver
    merge, no global sort."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("pri"),
            "o_totalprice",
        )
        .orderBy(
            F.col("pri").desc_nulls_last(),
            F.col("o_totalprice").desc(),
            "o_orderkey",
        )
        .limit(100)
    )
