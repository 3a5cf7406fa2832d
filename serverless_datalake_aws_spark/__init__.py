"""serverless_datalake_aws_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference serverless data lake (ashis-88/serverless-DataLake-AWS): ingest,
metadata catalog, zone promotion, full-text search indexing, and the full
delegated SQL surface (reference `query-data-lambda.py:195-218` delegates
all analytical SQL to Athena; here Spark SQL/Catalyst is the engine).

Design stance (SURVEY.md §7.0): DataFrame/SQL-first, Catalyst does the
optimization, plain Parquet tables, Structured Streaming replaces the
S3-event->Lambda trigger fabric. Everything is built for multi-executor
scale (partitioned layout, broadcast hints for dims, AQE) even though
tests run on local[N].
"""

from serverless_datalake_aws_spark.session import get_session
from serverless_datalake_aws_spark.catalog import TABLES, register_views, table
from serverless_datalake_aws_spark.engine import DataLakeEngine

__all__ = [
    "get_session",
    "TABLES",
    "register_views",
    "table",
    "DataLakeEngine",
]

__version__ = "0.1.0"
