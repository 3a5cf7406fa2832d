"""Event-stream analytics (SURVEY.md §2.9 streaming semantics, batch view).

The reference's stream is S3-event→Lambda per-file processing with no
windows or watermarks; these queries provide the time-bucketed /
JSON-decode analytics surface over the same event shape. The streaming
variants live in `serverless_datalake_aws_spark/streaming/`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "e01_hourly_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def e01_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the batch twin of the Structured
    Streaming windowed agg). Map-side partial agg keeps the shuffle
    proportional to distinct (hour, type) pairs, not input rows."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@query(
    "e02_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def e02_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (reference T14 json.loads; Presto
    json_extract → Spark get_json_object), aggregated per type."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@query(
    "e03_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 4) AS session_value,
           min(ts) AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def e03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session. Classic
    lag + cumulative-sum window composition — one shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.min("ts").alias("session_start"),
    )
