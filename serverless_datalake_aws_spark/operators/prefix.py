"""Distributed global prefix sum — the building block for sequence
packing, global row numbering, and any "position in a total order"
computation.

The naive Spark expression — `Window.orderBy(key)` with no
partitionBy — funnels EVERY row through one task: the single-reducer
trap, unusable at 100 TB. This operator computes the same exclusive
running sum with the classic two-phase scan:

  1. range-repartition by the order key (Spark's RangePartitioner
     gives monotonic partition ids: every key in partition i sorts
     before every key in partition i+1),
  2. one tiny per-partition total aggregation (numPartitions rows —
     bounded by cluster size, never data size) collected to the
     driver and turned into exclusive per-partition offsets,
  3. a WITHIN-partition running-sum window (parallel across
     partitions) plus the broadcast offset.

Wall-clock is one range shuffle + one partition-local sort — exactly
what a cluster-wide `sortBy` already costs; no stage sees more than
its own partition.

Reference parity: the reference has no equivalent (its Lambda code
processes one object at a time, serverless-data-lake-framework-main/
athena-lambda/index-data-lambda); this is part of the §2.11 extension
surface (training-data pipelines need global token offsets for
concat-and-chunk packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
    _plan_probe: bool = False,
) -> DataFrame:
    """Add `out_col` = exclusive prefix sum of `value_col` over the
    total order defined by `order_cols` (which must be a UNIQUE key —
    duplicate keys may split across range-partition boundaries and the
    'before' set would be ambiguous anyway).

    The result is partition-layout-invariant: the range partitioner's
    sampled boundaries affect only which task computes a row, never
    its prefix value. The input is cached for the duration of the call
    so the offset pass and the window pass see the same partitioning
    (RangePartitioner samples with a nondeterministic seed; two
    recomputations could disagree on boundaries).

    Integral measures produce an exact `bigint` prefix; fractional
    measures (float/double/decimal) produce a `double` (offsets
    accumulate driver-side in the matching Python type)."""
    vtype = dict(df.dtypes)[value_col]
    integral = vtype in ("tinyint", "smallint", "int", "bigint")
    off_type, out_type = ("long", "long") if integral else ("double", "double")
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    try:
        totals = {
            r["_pid"]: r["t"]
            for r in ranged.groupBy("_pid")
            .agg(F.sum(F.col(value_col).cast(off_type)).alias("t"))
            .collect()
        }
        offsets, running = [], 0 if integral else 0.0
        for pid in range(max(totals, default=-1) + 1):
            offsets.append((pid, running))
            running += totals.get(pid) or (0 if integral else 0.0)
        off_df = ranged.sparkSession.createDataFrame(
            # typed zero: DoubleType's verifier rejects a Python int
            offsets or [(0, 0 if integral else 0.0)],
            f"_pid int, _offset {off_type}",
        )
        w = (
            Window.partitionBy("_pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = F.coalesce(
            F.sum(F.col(value_col).cast(off_type)).over(w),
            F.lit(0).cast(off_type),
        )
        out = (
            ranged.withColumn("_local", local)
            .join(F.broadcast(off_df), "_pid")
            .withColumn(out_col, (F.col("_offset") + F.col("_local")).cast(out_type))
            .drop("_pid", "_offset", "_local")
        )
        if _plan_probe:
            # test hook: return the LAZY plan (tests/test_plans.py gates
            # that THIS operator's own plan has no single-partition
            # funnel); values from a probe frame must not be used — the
            # checkpoint below is what pins range boundaries
            return out
        # materialize before unpersist so no downstream recompute can
        # observe fresh (different) range boundaries
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out
