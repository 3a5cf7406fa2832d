"""Skew-aware join utilities (SURVEY §4.2 / pyspark guide §Partitioning).

AQE's skew-join split handles sort-merge skew automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in our session factory), but
broadcast-ineligible joins against a *replicable* right side sometimes
need explicit salting: replicate the right side `salt` ways, scatter
the left side's hot keys across the replicas, join on (key, salt_id).
Shuffle cost: left unchanged, right ×salt — the standard trade for
eliminating a straggler task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join on `key` with the left side's rows scattered over
    `salt` buckets and the right side replicated to every bucket.

    Use when `key` is skewed on the LEFT and `right` is small enough to
    replicate but too big (or too dynamic) to broadcast.

    Only inner and left joins are salting-compatible: an unmatched
    LEFT row occupies one salt bucket and pads once, but a right/full
    join would emit one null-padded row per REPLICA of every right row
    missing a left partner in its bucket — silently wrong results, so
    other join types are refused.

    The salt is DETERMINISTIC — xxhash64 over `salt_on` (default: every
    left column): rand() scattered rows differently each run, so any
    float aggregate downstream reassociated in a different order per
    run and could flip a rounding boundary between two executions of
    the same query (the t30 determinism doctrine). Duplicate rows land
    in the same bucket, which only matters if the skew IS duplicates —
    pass `salt_on` with a finer identity then.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: the "
            "replicated right side would null-pad once per replica"
        )
    salted_left = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*(salt_on or left.columns)), F.lit(salt)
        ).cast("int"),
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return (
        salted_left.join(salted_right, on=[key, "_salt"], how=how).drop("_salt")
    )


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-frequency profile — the diagnostic for picking a salt factor:
    compare the hottest key count against rows/shuffle-partitions."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
