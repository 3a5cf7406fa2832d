"""Deequ-style data-quality constraint engine: one aggregation pass
per table, metrics unpivoted to verdict rows.

The reference validates records only implicitly (ingest-data-lambda
accepts any JSON body and stamps defaults); a lake feeding LLM
training runs needs declared, machine-checkable contracts per table.
This module compiles a list of declarative `Check`s into ONE Spark
aggregation over the table (all metrics ride the same scan — at
100 TB the scan IS the cost, so N checks must not mean N passes),
then explodes the single metrics row into one verdict row per check.

Scale notes:
- Non-distinct metrics (completeness, compliance, min/max/mean) are
  plain algebraic aggregates: map-side partial, one shuffle of one
  row per partition.
- `uniqueness` needs COUNT(DISTINCT col). Mixing a distinct aggregate
  into the shared `agg()` triggers Catalyst's Expand plan and
  multiplies every other metric's work (measured 14x on q38 — see
  SCALE.md "Expand-based distinct mixing"). Each distinct metric
  therefore runs as its OWN single-row aggregation, cross-joined back
  onto the (single-row) shared frame — k extra scans only when k
  distinct checks are declared, never a multiplied shared scan.
  At scale, prefer `approx_uniqueness` (HLL, rides the shared pass).
- The verdict explode is driver-free: metrics stay a 1-row DataFrame
  until `inline(array(structs))` fans it out to |checks| rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative constraint.

    metric:
      completeness        fraction of non-null `column`
      uniqueness          exact count(distinct column) / count(*)
      approx_uniqueness   HLL approx_count_distinct(column) / count(*)
      compliance          fraction of rows satisfying SQL `predicate`
      min / max / mean    the aggregate of `column`
      row_count           count(*)
    Bounds: verdict is `at_least <= value <= at_most` (absent bound
    passes).
    """

    name: str
    metric: str
    column: str | None = None
    predicate: str | None = None
    at_least: float | None = None
    at_most: float | None = None


_SHARED = {"completeness", "approx_uniqueness", "compliance", "min", "max", "mean", "row_count"}


def _shared_expr(c: Check) -> Column:
    if c.metric == "completeness":
        return F.avg(F.col(c.column).isNotNull().cast("double"))
    if c.metric == "approx_uniqueness":
        return F.approx_count_distinct(c.column) / F.count(F.lit(1))
    if c.metric == "compliance":
        # NULL predicate results count as NON-compliant (coalesce to
        # false) — plain avg() would silently drop them.
        return F.avg(F.coalesce(F.expr(c.predicate), F.lit(False)).cast("double"))
    if c.metric == "min":
        return F.min(c.column).cast("double")
    if c.metric == "max":
        return F.max(c.column).cast("double")
    if c.metric == "mean":
        return F.avg(c.column)
    if c.metric == "row_count":
        return F.count(F.lit(1)).cast("double")
    raise ValueError(f"unknown metric: {c.metric}")


def quality_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one shared aggregation pass (plus one
    single-row pass per exact-`uniqueness` check) and return verdict
    rows `(check_name, metric, col_name, value, passed)` ordered by
    check name. (`check`/`column` are SQL keywords in some engines —
    the quoted-identifier-free names keep verdicts portable.)"""
    if not checks:
        raise ValueError("no checks declared")
    names = [c.name for c in checks]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # Every metric aliases as m_<name>; a shared name would make one
        # verdict silently read the other's metric (or fail ambiguous).
        raise ValueError(f"duplicate check names: {dupes}")
    needs_column = {"completeness", "uniqueness", "approx_uniqueness", "min", "max", "mean"}
    for c in checks:
        if c.metric in needs_column and c.column is None:
            raise ValueError(f"check {c.name!r}: metric {c.metric!r} requires `column`")
        if c.metric == "compliance" and c.predicate is None:
            raise ValueError(f"check {c.name!r}: metric 'compliance' requires `predicate`")
    shared = [c for c in checks if c.metric in _SHARED]
    exact = [c for c in checks if c.metric == "uniqueness"]
    unknown = [c for c in checks if c.metric not in _SHARED and c.metric != "uniqueness"]
    if unknown:
        raise ValueError(f"unknown metrics: {[c.metric for c in unknown]}")

    metrics: DataFrame | None = None
    if shared:
        metrics = df.agg(
            *[_shared_expr(c).alias(f"m_{c.name}") for c in shared]
        )
    for c in exact:
        leg = df.agg(
            (F.count_distinct(F.col(c.column)) / F.count(F.lit(1))).alias(
                f"m_{c.name}"
            )
        )
        metrics = leg if metrics is None else metrics.crossJoin(leg)

    verdicts = [
        F.struct(
            F.lit(c.name).alias("check_name"),
            F.lit(c.metric).alias("metric"),
            F.lit(c.column or "").alias("col_name"),
            F.round(F.col(f"m_{c.name}").cast("double"), 6).alias("value"),
            (
                (
                    F.lit(True)
                    if c.at_least is None
                    else F.col(f"m_{c.name}") >= F.lit(c.at_least)
                )
                & (
                    F.lit(True)
                    if c.at_most is None
                    else F.col(f"m_{c.name}") <= F.lit(c.at_most)
                )
            ).alias("passed"),
        )
        for c in checks
    ]
    return (
        metrics.select(F.inline(F.array(*verdicts)))
        .orderBy("check_name")
    )


def assert_quality(df: DataFrame, checks: list[Check]) -> None:
    """Raise ValueError listing every failed check (the CI/pipeline
    gate form; one job-side collect of |checks| verdict rows)."""
    failed = [
        f"{r['check_name']}: {r['metric']}({r['col_name']}) = {r['value']}"
        for r in quality_report(df, checks).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError("quality checks failed: " + "; ".join(failed))
