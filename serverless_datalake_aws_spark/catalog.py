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

    SIDE EFFECT (intentional, session-wide): pins
    spark.sql.session.timeZone=UTC and, for events,
    spark.sql.legacy.parquet.nanosAsLong=true on the *caller's*
    session and leaves them set. The driver's harness session doesn't
    come from our factory (session.py sets both up front), and the
    configs must still hold when the returned lazy DataFrame actually
    executes — restoring them eagerly would break that execution.
    Sessions from `session.get_session` already carry both, making
    this a no-op there.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Spark ≥4.x infers tz-less parquet TIMESTAMP(MICROS) as TIMESTAMP_NTZ
    # by default, which rejects unix_micros() and diverges from DuckDB's
    # naive-UTC collation; pin the pre-4.x LTZ read so every timestamp
    # column compares bit-identically with the oracle.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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


def save_table(
    spark: SparkSession,
    df: "DataFrame",
    name: str,
    analyze: bool = True,
    bucket_by: tuple[int, str] | None = None,
) -> None:
    """Persist a DataFrame as a managed catalog table with statistics —
    the engine's replacement for the Glue crawler (schema registered at
    write time, zero staleness vs the reference's 12-hour cron,
    terraform main.tf:203-214). `analyze` computes table + column stats
    so Catalyst's CBO can order joins; `bucket_by=(n, col)` co-locates
    future equi-joins on `col` without a shuffle (SCALE.md fact-fact
    join note)."""
    writer = df.write.mode("overwrite").format("parquet")
    if bucket_by is not None:
        n, col = bucket_by
        writer = writer.bucketBy(n, col).sortBy(col)
    writer.saveAsTable(name)
    if analyze:
        cols = ", ".join(f"`{c}`" for c in df.columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
