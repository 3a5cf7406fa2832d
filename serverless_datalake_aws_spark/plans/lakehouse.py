"""Lakehouse maintenance queries: file-statistics data skipping.

The reference lake has NO skipping layer — every Athena query scans the
full S3 prefix and its point lookups only stay fast because DynamoDB
holds a second copy of the metadata (SURVEY §4.3,
index-data-lambda.py). These entries exercise the engine-native
replacement (sources/stats.py): per-file zone maps + a bloom file
index, with DuckDB value-parity as the proof that skipping changes I/O
only, never results. Pruning effectiveness (how many files the scan
actually opens) is asserted in tests/test_stats.py — a registered
query's contract is result equality.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "m07_stats_pruned_scan",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE ts >= (SELECT MIN(ts) + INTERVAL 1 DAY FROM events)
      AND ts <  (SELECT MIN(ts) + INTERVAL 2 DAY FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def m07_stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping end-to-end: cluster a copy of events by
    ts (repartitionByRange → each file covers a narrow time slice),
    build the footer-only stats index, then answer a one-day range
    query through `pruned_scan` — which opens only the files whose
    [min_ts, max_ts] overlap the day, re-applies the predicate, and
    must therefore match the full-scan oracle bit-for-bit. At 100 TB
    this is the difference between reading ~1/30th of a month-
    partitioned zone and reading all of it; the residual filter makes
    the index purely an I/O optimization.

    Scale: stats collection is O(#files) footer reads (no data
    pages); pruning is a metadata-scale DataFrame filter; only
    matching file paths are collected (bounded by #files)."""
    from serverless_datalake_aws_spark.sources.stats import (
        collect_file_stats,
        pruned_scan,
    )

    ev = table(spark, sf_dir, "events")
    min_ts = ev.agg(F.min("ts")).first()[0]
    lo = min_ts + dt.timedelta(days=1)
    hi = min_ts + dt.timedelta(days=2)
    work = tempfile.mkdtemp(prefix="m07_")
    try:
        # sticky like catalog.table's conf pins: the driver's plain
        # session writes INT96 timestamps by default, and INT96 carries
        # no footer min/max — the stats index would silently go blind
        # on ts (fail-open: correct, but nothing prunes)
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        ev.select("event_type", "ts", "value").repartitionByRange(
            8, "ts"
        ).write.parquet(f"{work}/events")
        stats = collect_file_stats(spark, f"{work}/events")
        out = (
            pruned_scan(spark, f"{work}/events", stats, "ts", lo=lo, hi=hi)
            .filter(F.col("ts") < F.lit(hi))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .orderBy("event_type")
        )
        # materialize before the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "m08_bloom_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (
        SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3
    )
    ORDER BY o_orderkey
    """,
)
def m08_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-file-index point lookup: orders is rewritten hash-
    scattered (8 files, NOT clustered by o_orderkey — the layout where
    min/max zone maps are useless because every file spans the whole
    key range), a per-file bloom index is built over o_orderkey, and
    three point lookups run through `bloom_point_scan`, each opening
    only the candidate files (no false negatives by construction;
    false positives only cost extra I/O and are removed by the
    re-applied predicate). This is the engine-native twin of the
    reference's DynamoDB metadata copy: the lake indexes itself
    instead of shipping metadata to a second store.

    Scale: index build is one column-pruned pass over the key; the
    index is ≤ num_bits/64 rows per file; each probe is a
    5-row broadcast join against it."""
    from serverless_datalake_aws_spark.sources.stats import (
        bloom_point_scan,
        build_bloom_index,
    )

    orders = table(spark, sf_dir, "orders")
    keys = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey").orderBy("o_orderkey").limit(3).collect()
    ]
    work = tempfile.mkdtemp(prefix="m08_")
    try:
        orders.select("o_orderkey", "o_custkey", "o_totalprice").repartition(
            8, "o_custkey"
        ).write.parquet(f"{work}/orders")
        blooms = build_bloom_index(
            spark, f"{work}/orders", "o_orderkey", num_bits=1 << 18
        )
        parts = [
            bloom_point_scan(
                spark, f"{work}/orders", blooms, "o_orderkey", k, num_bits=1 << 18
            )
            for k in keys
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out = out.orderBy("o_orderkey")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "m10_hidden_partition_scan",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 4) AS value
    FROM events
    WHERE user_id = (SELECT MIN(user_id) FROM events)
      AND ts >= (SELECT MIN(ts) + INTERVAL 1 DAY FROM events)
      AND ts <= (SELECT MIN(ts) + INTERVAL 3 DAY FROM events)
    ORDER BY event_id
    """,
)
def m10_hidden_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style hidden partitioning end-to-end: events is written
    hive-partitioned by TWO derived transforms — event_date = days(ts)
    and user_bucket = bucket(8, user_id) — then queried through
    `hidden_scan` with predicates on the SOURCE columns only (a ts
    range + a user_id equality). The scan injects the equivalent
    partition predicates itself (foldable expressions, so Catalyst
    prunes to ≤3 date dirs × 1 bucket dir at plan time) and drops the
    partition columns: the caller never names the partition scheme,
    which is the Iceberg partition-transform contract (spec §Partition
    Transforms) that plain hive layouts lack. The full-scan oracle
    proves pruning changes I/O, never results.

    Scale: at days × 8-bucket layout a one-user three-day query opens
    3/days × 1/8 of the table's directories; predicate injection is
    plan-time metadata work. Pruning effectiveness is plan-gated in
    tests/test_partitioning.py (this entry's contract is equality)."""
    import datetime as dt

    from serverless_datalake_aws_spark.operators.partitioning import (
        PartitionField,
        hidden_scan,
        hidden_write,
    )

    ev = table(spark, sf_dir, "events")
    first = ev.agg(
        F.min("ts").alias("t0"), F.min("user_id").alias("u0")
    ).first()
    lo = first["t0"] + dt.timedelta(days=1)
    hi = first["t0"] + dt.timedelta(days=3)
    spec = (
        PartitionField("event_date", "days", "ts"),
        PartitionField("user_bucket", "bucket", "user_id", 8),
    )
    work = tempfile.mkdtemp(prefix="m10_")
    try:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        hidden_write(
            ev.select("event_id", "ts", "user_id", "event_type", "value"),
            f"{work}/events",
            spec,
        )
        out = (
            hidden_scan(
                spark,
                f"{work}/events",
                spec,
                eq={"user_id": first["u0"]},
                between={"ts": (lo, hi)},
            )
            .select(
                "event_id",
                "event_type",
                F.round("value", 4).alias("value"),
            )
            .orderBy("event_id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
