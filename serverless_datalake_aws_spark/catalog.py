"""Catalog helpers over the driver-materialized test tables.

Replaces the reference's Glue crawler (`terraform-…-main.tf:203-214`,
12-hour cron schema inference): Parquet is self-describing, so
registration is immediate and schema staleness is impossible. At lake
scale, `saveAsTable` + `ANALYZE TABLE` would persist these into a
metastore; temp views are enough for the test harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table (reference S4 parquet scan, SURVEY §2.1).

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos and truncate to microsecond
    timestamps — the same truncation DuckDB applies (its TIMESTAMP is
    µs), so oracle comparisons line up.
    """
    # Oracle comparisons assume naive-UTC timestamps (duckdb semantics);
    # pin the session TZ in case the caller's session didn't.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every test table as a temp view for `spark.sql` queries
    (reference S9 Glue-cataloged table scan)."""
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
