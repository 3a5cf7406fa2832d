"""Vector column expressions over array<float> embeddings (SURVEY §2.11).

Dot products and norms via `zip_with` + `aggregate` — JVM-side left
folds with deterministic summation order, so the DuckDB oracle
(`list_dot_product`, explicit list folds) produces bit-comparable
doubles; results are rounded before hashing regardless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def bucket_by_signs(a: Column, n_dims: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: one bit per leading
    dimension's sign. 2^n_dims buckets; deterministic and
    SQL-reproducible. The scale path for ANN — candidates only join
    within a bucket."""
    bits = [
        F.when(F.element_at(a, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
