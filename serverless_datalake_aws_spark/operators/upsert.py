"""Keyed upsert (MERGE) over plain Parquet (SURVEY §2.2 K7, §7.3).

The reference mutates metadata rows per-attribute in DynamoDB
(`index-data-lambda.py:165-172`). Without Delta, MERGE is emulated as
anti-join + union + atomic-ish swap: rows in `target` whose key appears
in `updates` are replaced, new keys appended — last-writer-wins, the
same consistency the reference offers. Delta's MERGE INTO is the
drop-in upgrade (same call shape) when the runtime ships it.

SCD2 variant keeps history: old versions get valid_to stamped instead
of being dropped — the CDC pattern the §2.9 stream feeds.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target_path: str | Path,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """Upsert `updates` into the parquet table at `target_path` by key.

    One anti-join (broadcast when updates are small) + union; the
    rewrite materializes before the swap so the source is never read
    while being overwritten.
    """
    target_path = str(target_path)
    target = spark.read.parquet(target_path)
    merged = target.join(
        F.broadcast(updates.select(key)), on=key, how="left_anti"
    ).unionByName(updates)
    tmp = target_path + ".merge.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target_path)
    shutil.move(tmp, target_path)
    return spark.read.parquet(target_path)


def scd2_apply(
    spark: SparkSession,
    target_path: str | Path,
    updates: DataFrame,
    key: str,
    ts_col: str = "valid_from",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions of
    updated keys (stamp valid_to) and append the new versions as
    current (valid_to = NULL)."""
    target_path = str(target_path)
    target = spark.read.parquet(target_path)
    now = F.current_timestamp()
    update_keys = F.broadcast(updates.select(key))
    closed = (
        target.join(update_keys, on=key, how="left_semi")
        .filter(F.col("valid_to").isNull())
        .withColumn("valid_to", now)
    )
    untouched = target.join(update_keys, on=key, how="left_anti").unionByName(
        target.join(update_keys, on=key, how="left_semi").filter(
            F.col("valid_to").isNotNull()
        )
    )
    fresh = updates.withColumn(ts_col, now).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )
    merged = untouched.unionByName(closed).unionByName(fresh)
    tmp = target_path + ".scd2.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target_path)
    shutil.move(tmp, target_path)
    return spark.read.parquet(target_path)
