"""SparkSession factory tuned for the engine.

Local-mode testing uses local[N]; the conf below is chosen so the same
logical plans scale to a real cluster: AQE handles runtime re-planning
(partition coalescing, skew-join splitting), Arrow accelerates any
pandas-UDF path, and UTC session time keeps results comparable with the
DuckDB oracle (naive-UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_session(
    app_name: str = "serverless-datalake-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Shuffle partitions default to the core count locally; on a real
    cluster AQE coalesces post-shuffle partitions to the right size, so
    the static number only sets the upper bound of the initial plan.
    """
    n = cpus or _default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); sessions built here
        # read it as int64 without the per-scan conf flip in catalog.table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark ≥4.x reads tz-less parquet timestamps as TIMESTAMP_NTZ by
        # default; keep the LTZ (UTC) read so unix_micros()/oracle parity hold
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
