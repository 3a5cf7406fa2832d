"""The driver runs queries on a PLAIN SparkSession (no UTC pin, no
nanosAsLong, no AQE) in a non-UTC container timezone if unlucky.
`catalog.table()` must make timestamp-sensitive queries
oracle-correct anyway by pinning session config at scan time. This
suite reproduces that worst case: a dedicated JVM with
America/New_York session timezone, default everything else.

Runs in a subprocess so the hostile session can't leak into the
shared test session fixture.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from serverless_datalake_aws_spark.testing import check_query
failures = []
# timestamp-heavy representatives: window agg, sessionize (µs math),
# date-trunc rollup, streaming drain with event-time, date arithmetic.
# e14/m04 joined after round 3: the driver's NTZ-inferring session broke
# all three unix_micros() consumers (e03/e14/m04) — keep every one pinned.
for name in (
    "e01_hourly_windows",
    "e03_sessionize",
    "e04_time_hierarchy_rollup",
    "e14_dwell_percentiles",
    "m04_freshness_audit",
    "q18_date_functions",
    "q29_date_arithmetic",
    "st07_stream_static_enrich",
    # round-5 timestamp consumers: day-split rollup merges, hourly
    # sketch reach, streaming rollup maintenance
    "e17_incremental_rollup",
    "e18_incremental_distinct",
    "q83_reach_curve_sketch_rollup",
    "st10_stream_incremental_rollup",
    # late round-5: quantile-sketch merge splits batches on dayofmonth
    "e21_incremental_quantiles",
    # round-6: hour-of-day baseline (date_trunc + hour() under a
    # non-UTC session shift both the bucket and the baseline key) and
    # the streaming dedup-index drain
    "e10_seasonal_baseline",
    "st13_stream_dedup_index",
):
    probs = check_query(spark, name, "/root/testdata/sf0.001")
    if probs:
        failures.append((name, probs[:2]))
print("FAILURES:", failures)
sys.exit(1 if failures else 0)
"""


def test_timestamp_queries_survive_non_utc_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
