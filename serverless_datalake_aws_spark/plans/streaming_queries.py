"""Streaming entries for the correctness harness (SURVEY §2.9).

These run real Structured Streaming queries (availableNow drain over the
parquet test tables) and return their results as DataFrames. They have
no `oracle_sql` entry — streaming semantics (watermark-gated append
output) aren't SQL-expressible — so the driver records the weaker
rows-only check; the batch twins (e01/e03) carry the value-level parity.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_datalake_aws_spark.plans import query

_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as int64
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source needs a directory; scope it to the events
    # table with a glob (the F8 prefix-filter analogue)
    return (
        spark.readStream.format("parquet")
        .schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


@query("st01_stream_hourly_counts")  # rows-only: streaming append output
def st01_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts as a real streaming query
    (file source → availableNow drain → memory sink). Append mode emits
    only watermark-closed windows — the streaming-only semantics the
    batch twin e01 can't express."""
    name = f"st01_{uuid.uuid4().hex[:8]}"
    q = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n", "total_value"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@query("st02_stream_sessions")  # rows-only: streaming session windows
def st02_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window aggregation (30-min gap) as a streaming query —
    engine-managed keyed state, closed by the watermark."""
    name = f"st02_{uuid.uuid4().hex[:8]}"
    q = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            F.col("win.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
