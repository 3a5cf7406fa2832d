"""Registered queries over the Python-DataSource API ingest seam
(sources/api_source.py — S12's pull-based upgrade). The synthetic
endpoint is integer-deterministic, so DuckDB reproduces it from
generate_series with BIGINT-exact arithmetic — the source's partition
planning, Arrow batching, and (for st17) streaming offset management
are what the parity check actually exercises."""

from __future__ import annotations

import ast
import json
import sys
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.plans import query
from serverless_datalake_aws_spark.sources.api_source import (
    register_api_source,
)

try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_PAGES = 8
_RPP = 50

_GEN = f"""
    SELECT rid,
           ['view','click','purchase','refund'][(rid % 4) + 1]
               AS event_type,
           (rid * 2654435761) % 100000 AS cents,
           CAST(rid // {_RPP} AS INT) AS page
    FROM (SELECT unnest(generate_series(0, {_PAGES * _RPP - 1})) AS rid)
"""


@query(
    "m09_api_source_ingest",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           round(sum(cents) / 100.0, 2) AS total_value,
           max(rid) AS max_id
    FROM ({_GEN})
    GROUP BY event_type ORDER BY event_type
    """,
)
def m09_api_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel pull-ingest through the registered Python DataSource:
    `spark.read.format("datalake_api")` plans one InputPartition per
    page, so the 8-page fetch runs 8-wide (1000-wide on a cluster
    draining a real endpoint) — no driver-side download loop, and the
    rows arrive Arrow-batched straight into the aggregate. The oracle
    regenerates the deterministic endpoint in DuckDB; matching totals
    prove the partition planning delivered every page exactly once."""
    register_api_source(spark)
    df = (
        spark.read.format("datalake_api")
        .option("pages", _PAGES)
        .option("rows_per_page", _RPP)
        .load()
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("id").alias("max_id"),
        )
        .orderBy("event_type")
    )


@query(
    "st17_api_stream_ingest",
    oracle=f"""
    SELECT page, count(*) AS n, round(sum(cents) / 100.0, 2) AS total_value
    FROM ({_GEN})
    GROUP BY page ORDER BY page
    """,
)
def st17_api_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental API ingestion as a Structured Stream: the
    DataSourceStreamReader's offsets are page numbers and each
    processingTime trigger polls the cursor, which reports
    `pages_per_batch=2` newly-available pages — so the 8-page endpoint
    genuinely arrives across 4 micro-batches (availableNow would fix
    the end at its single planning-time latestOffset call, collapsing
    the walk). A batch retry re-reads the same page range
    (deterministic replay), so the checkpointed offset log upgrades
    the reference's at-least-once push ingest to exactly-once pull.
    Complete-mode per-page totals equal the batch endpoint content —
    the oracle — only if the 4 batches together delivered exactly the
    8 pages, none skipped or double-planned across batch boundaries.
    The drain polls lastProgress and raises on timeout (the
    fail-loudly convention from the round-7 maintenance fix)."""
    import time

    register_api_source(spark)
    name = f"st17_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("datalake_api")
        .option("pages", _PAGES)
        .option("rows_per_page", _RPP)
        .option("pages_per_batch", 2)
        .load()
        .groupBy("page")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                end = p["sources"][0].get("endOffset")
                if isinstance(end, str):
                    # the progress report stringifies the offset dict —
                    # as repr() for Python sources, JSON for JVM ones
                    try:
                        end = ast.literal_eval(end)
                    except (ValueError, SyntaxError):
                        end = json.loads(end)
                done = (
                    end
                    and end.get("page") == _PAGES
                    and p["batchId"] is not None
                    and p["numInputRows"] == 0  # drained + one empty poll
                )
                if done:
                    break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"st17 stream did not reach page {_PAGES} within 300s: "
                f"lastProgress={q.lastProgress}"
            )
    finally:
        q.stop()
    q.awaitTermination(60)
    return spark.table(name).orderBy("page")
