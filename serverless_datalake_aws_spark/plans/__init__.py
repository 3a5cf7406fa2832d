"""Query registry: every operator from SURVEY.md §2 registers here.

Each entry pairs a Spark implementation (callable (spark, sf_dir) ->
DataFrame) with an optional ANSI-SQL oracle string DuckDB can run on the
same parquet tables. `__spark_entry__.queries()` / `oracle_sql()` are
generated from this registry, so a query cannot be "done" without both
halves — mirroring the driver's correctness gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}

# Submodules that register queries on import.
_MODULES = (
    "relational",
    "relational2",
    "relational3",
    "relational4",
    "relational5",
    "relational6",
    "relational7",
    "relational8",
    "relational9",
    "sqlfuncs",
    "sqlfuncs2",
    "nested",
    "metadata_queries",
    "text",
    "text2",
    "text3",
    "dedup",
    "dedup2",
    "similarity",
    "similarity2",
    "similarity3",
    "events_queries",
    "timeseries",
    "search",
    "streaming_queries",
    "binary_queries",
    "packing",
    "graph",
    "text4",
    "similarity4",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation + its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"serverless_datalake_aws_spark.plans.{mod}")


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: spec.fn for name, spec in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle
        for name, spec in sorted(_REGISTRY.items())
        if spec.oracle is not None
    }


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]
