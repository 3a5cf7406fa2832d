"""Structured Streaming pipelines (SURVEY.md §2.9, §3.3).

The reference's trigger fabric is S3 `ObjectCreated:*` events invoking a
Lambda per file (deploy-script.sh:112-131); delivery is at-least-once
with no dedup or ordering. Here a checkpointed file-source stream
replaces it: exactly-once file processing (strictly stronger), and
`Trigger.AvailableNow` gives the same batchy drain-then-stop shape the
Lambda fan-out produced. The per-file Lambda boundary becomes a task/
partition boundary inside one job.

CDC (S11, DynamoDB stream → reindex): `engine.index_cdc()` consumes
the append-only `_changelog` feed (every ingest appends its metadata
rows there) as a checkpointed file stream and incrementally indexes
exactly the changed ids — the Spark twin of the reference's
re-index-on-change loop, exactly-once per change file. Delta CDF is
the upgrade path when change feeds must come from table writes
themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_promote(
    spark: SparkSession,
    raw_path: str,
    processed_path: str,
    checkpoint: str,
    schema: T.StructType,
    fmt: str = "json",
    transform=None,
    trigger: dict | None = None,
    observe_rules: dict[str, str] | None = None,
) -> StreamingQuery:
    """File-arrival stream (S10): watch raw/, promote each new file's
    rows to processed/ (K5) with a processed_timestamp stamp (T1).

    The sink is Spark's NATIVE parquet file sink, not foreachBatch:
    the file sink records each batch's output files in the sink-side
    `_spark_metadata` commit log, so a retried batch re-commits the
    same batch id and readers see each row exactly once. (A
    foreachBatch blind append — the pre-r7 design — is only
    at-least-once: the sink callback re-runs on retry and duplicates
    the batch.) The checkpoint directory remains the replacement for
    the reference's 'which files fired the Lambda' implicit state.

    `trigger` defaults to `{"availableNow": True}` — drain-then-stop,
    the deterministic shape every oracle-checked twin uses. Pass
    `{"processingTime": "1 second"}` for the ALWAYS-ON mode matching
    the reference's continuous S3->Lambda fabric
    (deploy-script.sh:112-131): the query keeps polling raw/ and
    promotes files as they arrive until stop(); exactly-once and the
    checkpoint contract are identical (smoke-tested in
    tests/test_streaming.py::test_stream_promote_continuous_trigger).
    """
    if trigger is None:
        trigger = {"availableNow": True}
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 64)
        .load(raw_path)
        .withColumn("processed_timestamp", F.current_timestamp())
    )
    if transform is not None:
        stream = transform(stream)
    if observe_rules:
        # per-batch rule-violation counters riding the batch's own
        # execution; surfaced via StreamingQueryProgress.observedMetrics
        # and engine.enable_stream_metrics()
        from serverless_datalake_aws_spark.streaming.observability import (
            observe_quality,
        )

        stream = observe_quality(stream, observe_rules)

    return (
        stream.writeStream.format("parquet")
        .option("path", processed_path)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )


def drain(query: StreamingQuery, timeout_s: int = 300) -> None:
    """Block until an availableNow drain COMPLETES, raising on timeout.

    `q.awaitTermination(t)` returns False silently when the stream is
    still running at the deadline — a caller that then reads the sink
    sees a PARTIAL result with no error (one of the two paths behind
    the round-6 a08_st10 hash mismatch). A drain that didn't finish
    is a failure and must say so."""
    if not query.awaitTermination(timeout_s):
        try:
            query.stop()
        finally:
            raise TimeoutError(
                f"streaming drain did not complete within {timeout_s}s "
                f"(query id {query.id}); sink state is partial"
            )


def stream_windowed_counts(
    spark: SparkSession,
    events_path: str,
    schema: T.StructType,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str | None = "value",
    query_name: str = "windowed_counts",
) -> StreamingQuery:
    """Watermarked tumbling-window aggregation over an event stream —
    the §2.9 extension (the reference has no windows/late-data
    handling). Append mode + watermark: a window emits once it can no
    longer receive late rows. Results land in an in-memory table named
    `query_name` (local testing; production sink would be a table).

    `value_col=None` drops the sum for schemas without a numeric
    value column; counts alone remain."""
    aggs = [F.count("*").alias("n")]
    out = [F.col("win.start").alias("window_start"), F.col(key_col), F.col("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
        out.append(F.col("total_value"))
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(events_path)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(*aggs)
        .select(*out)
    )
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    schema: T.StructType,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str | None = "value",
    query_name: str = "sessions",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Session-window aggregation (`session_window`): the streaming twin
    of the batch sessionization plan (e03) — state is managed by the
    engine, keyed by user, closed `gap` after the last event.
    `value_col=None` drops the sum for value-less schemas. `watermark`
    bounds late data and must be >= `gap` (events later than the
    watermark are dropped, splitting sessions silently) — enforced."""
    from pyspark.sql.functions import expr as _expr

    # a watermark shorter than the gap silently splits sessions whose
    # members straddle batches — refuse instead
    gap_s = spark.range(1).select(
        _expr(f"unix_timestamp(timestamp'2000-01-01' + interval {gap}) - "
              f"unix_timestamp(timestamp'2000-01-01')")
    ).first()[0]
    wm_s = spark.range(1).select(
        _expr(f"unix_timestamp(timestamp'2000-01-01' + interval {watermark}) - "
              f"unix_timestamp(timestamp'2000-01-01')")
    ).first()[0]
    if wm_s < gap_s:
        raise ValueError(
            f"watermark ({watermark}) must be >= session gap ({gap}): "
            "late members inside the gap would be dropped and sessions "
            "silently split"
        )
    aggs = [F.count("*").alias("n_events")]
    out = [
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        F.col(key_col),
        F.col("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("session_value"))
        out.append(F.col("session_value"))
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(events_path)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(*aggs)
        .select(*out)
    )
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
