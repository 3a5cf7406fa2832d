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
        # Image Decimal DISTINCTLY from float: the external driver's
        # hash does (DuckDB .df() lowers DECIMAL to float64; Spark
        # toPandas yields decimal.Decimal), so coercing here made the
        # local sweep green while the driver was red — the sole cause
        # of the round-6 and round-8 external reds. A query whose
        # result carries Decimal must now fail the local mirror too.
        return ("dec", str(v.normalize()))
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


def decimal_columns(schema) -> list[str]:
    """Names of (possibly nested) fields whose type contains DecimalType.

    Registry invariant: no registered query may RETURN a decimal column.
    DuckDB .df() lowers DECIMAL to float64 while Spark toPandas yields
    decimal.Decimal, so the external driver's hash images them apart
    even when values agree — the only external reds of rounds 6 and 8
    were exactly the only two decimal-output queries in the registry.
    Decimals stay internal (order-independent sums); results are double.
    """
    from pyspark.sql import types as T

    def _has_dec(dt) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_dec(dt.elementType)
        if isinstance(dt, T.MapType):
            return _has_dec(dt.keyType) or _has_dec(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(_has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if _has_dec(f.dataType)]


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from serverless_datalake_aws_spark.plans import all_oracles, all_queries

    fn = all_queries(include_aliases=True)[name]
    oracle = all_oracles(include_aliases=True).get(name)
    df = fn(spark, sf_dir)
    dec = decimal_columns(df.schema)
    if dec:
        return [f"decimal output columns (registry invariant): {dec}"]
    got = df.toPandas()
    if oracle is None:
        return [] if len(got) >= 0 else ["spark query failed"]
    con = duckdb_connection(sf_dir)
    try:
        exp = con.sql(oracle).df()
    finally:
        con.close()
    return compare_frames(got, exp)
