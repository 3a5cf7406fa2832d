"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Runs a registered query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, column names (sorted), and
order-insensitive values — the same contract as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import numbers
from decimal import Decimal
from typing import Any

import duckdb
import pandas as pd

from serverless_datalake_aws_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize_cell(v: Any) -> Any:
    # Type-strict on the int/float axis: the driver's value hash
    # distinguishes 15 from 15.0 (DuckDB HUGEINT sums surface as
    # float64 in pandas), so Python's 15 == 15.0 must NOT paper over
    # a dtype mismatch here. Tag the numeric family into the key.
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return ("b", bool(v))
    if isinstance(v, float) or type(v).__name__ in ("float32", "float64"):
        fv = float(v)
        if math.isnan(fv):
            return "NaN"
        # collapse float noise below the rounding scale used by queries
        return ("f", round(fv, 6))
    if isinstance(v, Decimal):
        return ("f", round(float(v), 6))
    if isinstance(v, numbers.Integral):
        return ("i", int(v))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_normalize_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = _normalize(spark_pdf), _normalize(oracle_pdf)
    if s_rows != o_rows:
        diff_idx = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b][:3]
        for i in diff_idx:
            problems.append(f"row {i}: spark={s_rows[i]} oracle={o_rows[i]}")
        if not diff_idx and s_rows != o_rows:
            problems.append("row multiset mismatch (length tail)")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from serverless_datalake_aws_spark.plans import all_oracles, all_queries

    fn = all_queries(include_aliases=True)[name]
    oracle = all_oracles(include_aliases=True).get(name)
    got = fn(spark, sf_dir).toPandas()
    if oracle is None:
        return [] if len(got) >= 0 else ["spark query failed"]
    con = duckdb_connection(sf_dir)
    try:
        exp = con.sql(oracle).df()
    finally:
        con.close()
    return compare_frames(got, exp)
