#!/usr/bin/env python
"""Maintained-rollup absorb-cost probe: is absorption O(|batch| +
|groups|) or does it secretly re-pay history?

Absorbs N identical batches (BATCH_ROWS rows, GROUPS groups) into one
MaintainedRollup and prints per-batch absorb wall. A flat series
proves the maintenance claim (each merge touches the delta + the
|groups|-row state, never the accumulated fact rows); a rising series
would mean history leaks into the per-batch cost. Also quantifies the
round-7 _EpochStateStore publish overhead (fresh state dir + verified
read-back + atomic pointer per absorb) against the pre-r7 in-place
swap — the price of exactly-once.

Usage:  python tools/probe_maintenance_scaling.py [N_BATCHES]
Env:    SPARK_GRAFT_PMS_ROWS (default 100000), _GROUPS (default 10000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from serverless_datalake_aws_spark.operators.incremental import (
        MaintainedRollup,
    )
    from serverless_datalake_aws_spark.session import get_session

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = int(os.environ.get("SPARK_GRAFT_PMS_ROWS", "100000"))
    groups = int(os.environ.get("SPARK_GRAFT_PMS_GROUPS", "10000"))
    spark = get_session(app_name="probe_maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pms_")
    try:
        rollup = MaintainedRollup(
            spark, f"{work}/rollup", keys=["k"], measures=["v"]
        )
        walls = []
        for b in range(n_batches):
            batch = spark.range(rows).select(
                F.pmod(F.col("id") + b, F.lit(groups)).alias("k"),
                (F.col("id") * 0.5).cast("decimal(18,6)").alias("v"),
            )
            t0 = time.time()
            rollup.apply(batch, epoch_id=b)
            walls.append(round(time.time() - t0, 2))
        total_rows = rollup.read().agg(F.sum("n_rows")).collect()[0][0]
        assert total_rows == rows * n_batches, total_rows
        print(
            json.dumps(
                {
                    "batches": n_batches,
                    "rows_per_batch": rows,
                    "groups": groups,
                    "absorb_sec": walls,
                    "first3_avg": round(sum(walls[:3]) / 3, 2),
                    "last3_avg": round(sum(walls[-3:]) / 3, 2),
                    "flat_ratio": round(
                        (sum(walls[-3:]) / 3) / (sum(walls[:3]) / 3), 2
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
