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

# Commit flag for staged rewrites (same protocol as engine._mark_indexed,
# the K7 swap): a stage directory is published only once this file
# exists inside it; recovery rolls a flagged stage forward, discards an
# unflagged one. Spark ignores underscore-prefixed files in parquet
# dirs, so a flag that rides along into the published dir is inert (and
# removed anyway).
_SWAP_READY = "_SWAP_READY"
_TMP_SUFFIXES = (".merge.tmp", ".scd2.tmp")


def _publish_swap(tmp: Path, target: Path) -> None:
    """Swap a flag-complete stage into place via two same-filesystem
    renames — a reader never sees a half-written directory. Idempotent:
    safe to re-run from any crash point."""
    old = Path(str(target) + ".old")
    if not old.exists() and target.exists():
        target.rename(old)
    if not target.exists():
        tmp.rename(target)
    (target / _SWAP_READY).unlink(missing_ok=True)
    if old.exists():
        shutil.rmtree(old)


def recover_swap(target_path: str | Path) -> None:
    """Converge `target_path` after a writer died mid-swap: a committed
    stage (flag present) rolls forward, an uncommitted one is
    discarded, and a stranded `.old` (crash between the two renames)
    restores. Runs before every merge/scd2 read-modify-write."""
    target = Path(str(target_path))
    for suf in _TMP_SUFFIXES:
        tmp = Path(str(target) + suf)
        if tmp.exists():
            if (tmp / _SWAP_READY).exists():
                _publish_swap(tmp, target)
            else:
                shutil.rmtree(tmp)
    old = Path(str(target) + ".old")
    if old.exists():
        if target.exists():
            shutil.rmtree(old)
        else:
            old.rename(target)


def merge_into(
    spark: SparkSession,
    target_path: str | Path,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """Upsert `updates` into the parquet table at `target_path` by key.

    One anti-join (broadcast when updates are small) + union; the
    rewrite materializes before the swap so the source is never read
    while being overwritten, and the swap is flag-gated + rename-based
    (crash at any point leaves whole-old or whole-new, converged by
    `recover_swap`)."""
    target_path = str(target_path)
    recover_swap(target_path)
    target = spark.read.parquet(target_path)
    merged = target.join(
        F.broadcast(updates.select(key)), on=key, how="left_anti"
    ).unionByName(updates)
    tmp = Path(target_path + ".merge.tmp")
    merged.write.mode("overwrite").parquet(str(tmp))
    (tmp / _SWAP_READY).touch()
    _publish_swap(tmp, Path(target_path))
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
    recover_swap(target_path)
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
    tmp = Path(target_path + ".scd2.tmp")
    merged.write.mode("overwrite").parquet(str(tmp))
    (tmp / _SWAP_READY).touch()
    _publish_swap(tmp, Path(target_path))
    return spark.read.parquet(target_path)
