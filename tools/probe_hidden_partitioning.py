#!/usr/bin/env python
"""Measured payoff of hidden partitioning (operators/partitioning.py)
at sf0.1: write events hive-partitioned by days(ts) x bucket(16,
user_id), then compare a one-day-one-user query as (a) a full scan
with plain predicates vs (b) hidden_scan's auto-injected partition
predicates. Prints files opened + wall for both paths and asserts
equal results. Run on an idle box; results recorded in SCALE.md.

    python tools/probe_hidden_partitioning.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_datalake_aws_spark.catalog import table  # noqa: E402
from serverless_datalake_aws_spark.operators.partitioning import (  # noqa: E402
    PartitionField,
    hidden_scan,
    hidden_write,
)
from serverless_datalake_aws_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    ev = table(spark, sf_dir, "events")
    first = ev.agg(F.min("ts").alias("t0"), F.min("user_id").alias("u0")).first()
    lo = first["t0"] + dt.timedelta(days=3)
    hi = first["t0"] + dt.timedelta(days=4)
    spec = (
        PartitionField("event_date", "days", "ts"),
        PartitionField("user_bucket", "bucket", "user_id", 16),
    )
    work = tempfile.mkdtemp(prefix="probe_hidden_")
    try:
        t0 = time.time()
        hidden_write(
            ev.select("event_id", "ts", "user_id", "event_type", "value"),
            f"{work}/events",
            spec,
        )
        n_dirs = sum(1 for _ in os.scandir(f"{work}/events"))
        print(f"write: {time.time() - t0:.2f}s, {n_dirs} date dirs x 16 buckets")

        full = spark.read.parquet(f"{work}/events").filter(
            (F.col("user_id") == first["u0"]) & F.col("ts").between(lo, hi)
        )
        pruned = hidden_scan(
            spark,
            f"{work}/events",
            spec,
            eq={"user_id": first["u0"]},
            between={"ts": (lo, hi)},
        )
        def files_read(df) -> int:
            """'number of files read' from the executed scan node —
            files OPENED, unlike input_file_name() which only sees
            files that produced surviving rows."""
            plan = df._jdf.queryExecution().executedPlan()
            try:
                if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                    plan = plan.finalPhysicalPlan()
            except Exception:
                pass
            stack, total = [plan], 0
            while stack:
                node = stack.pop()
                if "FileSourceScan" in node.getClass().getSimpleName():
                    it = node.metrics().iterator()
                    while it.hasNext():
                        kv = it.next()
                        if kv._1() == "numFiles":
                            total += int(kv._2().value())
                kids = node.children()
                for i in range(kids.size()):
                    stack.append(kids.apply(i))
            return total

        for label, df in (("full-scan", full), ("hidden-scan", pruned)):
            df.count()  # warm
            t0 = time.time()
            n = len(df.collect())  # collect() executes df's OWN QE,
            wall = time.time() - t0  # so its scan metrics populate
            print(
                f"{label}: rows={n} files_read={files_read(df)} "
                f"wall={wall:.3f}s"
            )
        assert {r["event_id"] for r in full.collect()} == {
            r["event_id"] for r in pruned.collect()
        }
        print("results identical")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
