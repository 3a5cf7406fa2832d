"""Metadata-surface queries (SURVEY.md §2.1 S7/S8, §2.3 F1-F7).

The reference serves these from DynamoDB (point lookup + full scan with
server-side post-filter, `query-data-lambda.py:101-152`). Here the same
shapes run as filters over columnar scans — predicate pushdown beats
DynamoDB's scan-then-filter. The `events` table stands in for the
metadata table (keyed rows + type + timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "m01_point_lookup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE event_id = 451
    """,
)
def m01_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed point lookup (reference S7: get_item by hash key,
    query-data-lambda.py:101-117). Parquet min/max row-group stats give
    the skip; at lake scale the _meta table is written sorted by id."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") == 451).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "m02_metadata_search",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase'
      AND ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-20'
      AND user_id = 12
    """,
)
def m02_metadata_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive metadata search (reference F1/F2/F3: eq + AND +
    BETWEEN built as a boto3 Attr AST at query-data-lambda.py:127-145).
    The AST becomes a Catalyst Column expression tree, evaluated at the
    scan instead of after it."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").between("2024-01-05", "2024-01-20")
        & (F.col("user_id") == 12)
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "m03_existence_groups",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def m03_existence_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-type inventory (reference A1/A3: reindex_all buckets by
    dataType, index-data-lambda.py:326-335,386) — the per-type dict loop
    collapses to one hash aggregation."""
    ev = table(spark, sf_dir, "events")
    # split the DISTINCT into its own leg: mixing count(*) with
    # count(DISTINCT) in one agg() plans an Expand that doubles every
    # scanned row (the q38/m05 rule, SCALE.md plan-pathology log)
    base = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    dst = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return base.join(dst, "event_type")


@query(
    "m04_freshness_audit",
    oracle="""
    WITH mx AS (SELECT max(ts) AS global_max FROM events)
    SELECT event_type,
           count(*) AS n_records,
           max(ts) AS latest,
           CAST(epoch_us(global_max) - epoch_us(max(ts)) AS BIGINT)
               AS lag_us
    FROM events CROSS JOIN mx
    GROUP BY event_type, global_max
    """,
)
def m04_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type freshness audit: record counts, latest timestamp, and
    staleness lag behind the lake's high-water mark — the reference's
    indexing tallies (totalItems/indexedItems,
    index-data-lambda.py:307-315,379-388) upgraded into the table-
    health dashboard every lake operator actually watches.

    Scale: one pass, map-side combined; the global max is a scalar
    broadcast. Lag computed in exact integer microseconds (the e03
    rule)."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("global_max"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type", "global_max")
        .agg(
            F.count("*").alias("n_records"),
            F.max("ts").alias("latest"),
            (
                F.unix_micros(F.first("global_max"))
                - F.unix_micros(F.max("ts"))
            ).alias("lag_us"),
        )
        .drop("global_max")
    )


@query(
    "m05_quality_constraints",
    oracle="""
    SELECT * FROM (
      SELECT 'complete_custkey' AS check_name, 'completeness' AS metric,
             'o_custkey' AS col_name,
             round(avg(CAST(o_custkey IS NOT NULL AS DOUBLE)), 6) AS value,
             avg(CAST(o_custkey IS NOT NULL AS DOUBLE)) >= 0.999 AS passed
      FROM orders
      UNION ALL
      SELECT 'complete_orderdate', 'completeness', 'o_orderdate',
             round(avg(CAST(o_orderdate IS NOT NULL AS DOUBLE)), 6),
             avg(CAST(o_orderdate IS NOT NULL AS DOUBLE)) >= 0.999
      FROM orders
      UNION ALL
      SELECT 'unique_orderkey', 'uniqueness', 'o_orderkey',
             round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                   / count(*), 6),
             CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) >= 1.0
      FROM orders
      UNION ALL
      SELECT 'valid_status', 'compliance', '',
             round(avg(CAST(coalesce(o_orderstatus IN ('F','O','P'), FALSE)
                            AS DOUBLE)), 6),
             avg(CAST(coalesce(o_orderstatus IN ('F','O','P'), FALSE)
                      AS DOUBLE)) >= 1.0
      FROM orders
      UNION ALL
      SELECT 'positive_price', 'min', 'o_totalprice',
             round(CAST(min(o_totalprice) AS DOUBLE), 6),
             min(o_totalprice) >= 0.0
      FROM orders
      UNION ALL
      SELECT 'nonempty', 'row_count', '',
             round(CAST(count(*) AS DOUBLE), 6),
             count(*) >= 1.0
      FROM orders
    ) ORDER BY check_name
    """,
)
def m05_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality gate over the orders feed —
    the contract layer the reference's accept-any-JSON ingest
    (ingest-data-lambda.py:119-133 stamps defaults instead of
    validating) leaves to downstream consumers.

    All six checks ride ONE shared aggregation scan (algebraic
    aggregates, map-side combined: one row per partition shuffles);
    only the exact-uniqueness check runs as its own single-row leg,
    cross-joined back, so COUNT(DISTINCT) can't drag the shared
    metrics through an Expand plan (SCALE.md q38 lesson). At 100 TB:
    N checks == one scan, and uniqueness downgrades to the HLL
    `approx_uniqueness` metric that rides the shared pass too."""
    from serverless_datalake_aws_spark.operators.quality import (
        Check,
        quality_report,
    )

    orders = table(spark, sf_dir, "orders")
    return quality_report(
        orders,
        [
            Check("complete_custkey", "completeness", "o_custkey", at_least=0.999),
            Check("complete_orderdate", "completeness", "o_orderdate", at_least=0.999),
            Check("unique_orderkey", "uniqueness", "o_orderkey", at_least=1.0),
            Check(
                "valid_status",
                "compliance",
                predicate="o_orderstatus IN ('F','O','P')",
                at_least=1.0,
            ),
            Check("positive_price", "min", "o_totalprice", at_least=0.0),
            Check("nonempty", "row_count", at_least=1.0),
        ],
    )


@query(
    "m06_query_metrics_rollup",
    oracle="""
    SELECT * FROM (
      SELECT 'by_type' AS label,
             (SELECT count(DISTINCT event_type) FROM events) AS out_rows,
             1 AS n_runs, TRUE AS shuffled
      UNION ALL
      SELECT 'daily_purchases' AS label,
             (SELECT count(DISTINCT date_trunc('day', ts)) FROM events
              WHERE event_type = 'purchase') AS out_rows,
             1 AS n_runs, TRUE AS shuffled
      UNION ALL
      SELECT 'active_users' AS label,
             (SELECT count(*) FROM (
                SELECT user_id FROM events GROUP BY user_id
                HAVING count(*) >= 20)) AS out_rows,
             1 AS n_runs, TRUE AS shuffled
    ) ORDER BY label
    """,
)
def m06_query_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational query-metrics rollup — the reference's CloudWatch
    dashboard over Athena executions (deploy-script.sh:133-180,
    aws-data-lake-terraform-main.tf:391-448) as a queryable table: a
    QueryExecutionListener (operators/metrics.MetricsRecorder) records
    every action's wall/rows/shuffle into `_metrics`; this entry runs
    three labeled queries through `engine.sql` and rolls their
    telemetry up by label.

    The oracle checks the DETERMINISTIC fields — result cardinality
    per query, run count, shuffled-or-not — recomputed from the events
    table; wall_ms/shuffle_bytes are asserted positive but not
    value-compared (timings are not reproducible by definition).

    Scale: capture is an in-memory buffer append on the listener bus
    (no job-side cost); export batches per flush; the rollup reads
    |executions| rows, never fact data."""
    import shutil
    import tempfile

    from serverless_datalake_aws_spark.catalog import table
    from serverless_datalake_aws_spark.engine import DataLakeEngine

    work = tempfile.mkdtemp(prefix="m06_")
    try:
        eng = DataLakeEngine(spark, work)
        rec = eng.enable_metrics()
        table(spark, sf_dir, "events").createOrReplaceTempView("m06_events")
        labeled = {
            "by_type": (
                "SELECT event_type, count(*) AS n FROM m06_events "
                "GROUP BY event_type"
            ),
            "daily_purchases": (
                "SELECT date_trunc('day', ts) AS day, sum(value) AS v "
                "FROM m06_events WHERE event_type = 'purchase' GROUP BY 1"
            ),
            # no ORDER BY ... LIMIT here: driver-side limits execute
            # via executeCollect on TakeOrderedAndProject, which carries
            # no output-rows SQLMetric — the recorded cardinality would
            # be the child aggregate's
            "active_users": (
                "SELECT user_id, count(*) AS n FROM m06_events "
                "GROUP BY user_id HAVING count(*) >= 20"
            ),
        }
        for label, q in labeled.items():
            df = eng.sql(q)
            rec.register_label(df, label)
            df.collect()  # the metered execution
        # loud, not silent: a slow listener bus yielding a PARTIAL
        # metrics buffer must fail the entry, not hash-mismatch it
        # (same contract as streaming drains this round)
        if not rec.wait_for(set(labeled), timeout_s=60.0):
            raise TimeoutError(
                "query-execution listener did not deliver all metric "
                "rows within 60s; metrics table would be partial"
            )
        out = (
            eng.metrics()
            .filter(F.col("label").isNotNull() & (F.col("wall_ms") > 0))
            .groupBy("label")
            .agg(
                F.max("out_rows").alias("out_rows"),
                F.count(F.lit(1)).cast("int").alias("n_runs"),
                (F.max("shuffle_bytes") > 0).alias("shuffled"),
            )
            .orderBy("label")
        )
        rows = out.collect()  # materialize before the workdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        # always detach: a listener left behind would keep buffering
        # every later query in the caller's session
        try:
            rec.uninstall()
        except Exception:
            pass
        shutil.rmtree(work, ignore_errors=True)
