"""Measure engine.optimize_zone's file-skipping payoff at sf0.1.

Protocol: ingest the sf0.1 lineitem table (~600k rows) into a zone as
64 hash-scattered files (the streaming-ingest small-file shape),
analyze, and measure how many files a selective 2-predicate scan
(l_orderkey range x l_extendedprice range) must open via scan_pruned's
zone maps. Then OPTIMIZE with ZORDER BY (l_orderkey, l_extendedprice)
and measure again — same row answer, fewer files opened. Prints a
table for SCALE.md.

Usage: python tools/probe_optimize.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from serverless_datalake_aws_spark.engine import DataLakeEngine  # noqa: E402
from serverless_datalake_aws_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def files_opened(df) -> int:
    return len(df.inputFiles())


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_opt_")
    try:
        eng = DataLakeEngine(spark, f"{root}/lake")
        src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        n = src.count()
        (
            src.repartition(64)  # hash-scatter: every file spans every range
            .write.parquet(f"{eng.zone('raw')}/records")
        )
        eng.analyze("raw")

        def measure(tag: str) -> tuple[int, int, float]:
            t0 = time.monotonic()
            scan = eng.scan_pruned("raw", "l_orderkey", 100_000, 120_000)
            scan = scan.filter(
                (F.col("l_extendedprice") >= 20_000)
                & (F.col("l_extendedprice") <= 30_000)
            )
            rows = scan.count()
            wall = time.monotonic() - t0
            nf = files_opened(
                eng.scan_pruned("raw", "l_orderkey", 100_000, 120_000)
            )
            print(
                f"{tag}: files_opened={nf} rows={rows} "
                f"scan_wall={wall:.2f}s"
            )
            return nf, rows, wall

        before = measure("before (64 hash-scattered files)")
        t0 = time.monotonic()
        res = eng.optimize_zone(
            "raw",
            zorder_by=("l_orderkey", "l_extendedprice"),
            num_files=16,
        )
        opt_wall = time.monotonic() - t0
        print(
            f"optimize: {res['files_before']}->{res['files_after']} files, "
            f"{res['rows']} rows, wall={opt_wall:.1f}s"
        )
        after = measure("after  (z-ordered, 16 files)")
        assert before[1] == after[1], (before, after)
        print(
            f"SUMMARY n={n} files {before[0]}->{after[0]} "
            f"({before[0] / max(after[0], 1):.1f}x fewer opened), "
            f"identical {after[1]}-row answer"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
