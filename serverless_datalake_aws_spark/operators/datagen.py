"""Synthetic test-fixture generator (SURVEY §2.4 T19, §5.1).

The reference's de-facto test harness is `data-upload-script.py`:
unseeded-random sales (1000 rows), customers (500), products (100)
pandas frames uploaded to raw/. This generator reproduces those schemas
(FIXTURES.md §A) Spark-natively — `spark.range` + seeded `rand()` so
generation is distributed, deterministic, and scales to any row count
without a driver-side array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PRODUCTS = (
    "Laptop", "Smartphone", "Tablet", "Headphones",
    "Monitor", "Keyboard", "Mouse", "Speaker",
)
REGIONS = ("North", "South", "East", "West", "Central")
FIRST_NAMES = ("James", "Mary", "John", "Patricia", "Robert",
               "Jennifer", "Michael", "Linda", "William", "Elizabeth")
LAST_NAMES = ("Smith", "Johnson", "Williams", "Brown", "Jones",
              "Garcia", "Miller", "Davis", "Rodriguez", "Martinez")
SEGMENTS = ("Premium", "Standard", "Basic")
SEGMENT_WEIGHTS = (0.2, 0.5, 0.3)  # data-upload-script.py:70,87
CATEGORIES = ("Electronics", "Computing", "Audio", "Accessories")
BRANDS = ("TechPro", "Innovex", "Quantum", "Apex", "Nova")
TYPES = ("Wireless", "Smart", "Portable", "Pro", "Ultra")


def _ranged(spark: SparkSession, n: int) -> DataFrame:
    """spark.range with a partition count derived from n ALONE.

    rand(seed) seeds each partition as seed+partitionIndex, and a bare
    spark.range(n) splits by the session's default parallelism — so the
    "same (n, seed)" fixture silently differed between local[4] and
    local[8] (or any two cluster sizes). Deriving the partition count
    from n keeps generation distributed for large n yet bit-identical
    on every environment."""
    parts = max(1, min(1024, (n + 999_999) // 1_000_000))
    return spark.range(0, n, 1, parts)


def _choice(options: tuple[str, ...], r: Column) -> Column:
    """Uniform choice from a literal list driven by a rand() column."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (r * len(options)).cast("int") + 1)


def _weighted_choice(
    options: tuple[str, ...], weights: tuple[float, ...], r: Column
) -> Column:
    """Weighted choice (reference np.random.choice(p=...))."""
    expr = F.lit(options[-1])
    acc = 0.0
    branches = []
    for opt, w in zip(options[:-1], weights[:-1]):
        acc += w
        branches.append((acc, opt))
    for threshold, opt in reversed(branches):
        expr = F.when(r < threshold, opt).otherwise(expr)
    return expr


def gen_sales(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """sales: FIXTURES.md A1 (data-upload-script.py:28-55)."""
    df = _ranged(spark, n)
    return df.select(
        F.format_string("TXN-%06d", F.col("id")).alias("transaction_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_dt_interval(days=(F.rand(seed) * 30).cast("int"))
        ).alias("date"),
        _choice(PRODUCTS, F.rand(seed + 1)).alias("product"),
        _choice(REGIONS, F.rand(seed + 2)).alias("region"),
        ((F.rand(seed + 3) * 9).cast("int") + 1).alias("quantity"),
        F.round(F.rand(seed + 4) * 990 + 10, 2).alias("unit_price"),
    ).withColumn(
        "total_price", F.round(F.col("quantity") * F.col("unit_price"), 2)
    )


def gen_customers(spark: SparkSession, n: int = 500, seed: int = 42) -> DataFrame:
    """customers: FIXTURES.md A2 (data-upload-script.py:57-92)."""
    df = _ranged(spark, n)
    first = _choice(FIRST_NAMES, F.rand(seed + 10))
    last = _choice(LAST_NAMES, F.rand(seed + 11))
    return df.select(
        F.format_string("CUST-%05d", F.col("id")).alias("customer_id"),
        first.alias("first_name"),
        last.alias("last_name"),
        F.lower(F.concat(first, F.lit("."), last, F.lit("@example.com"))).alias(
            "email"
        ),
        _choice(REGIONS, F.rand(seed + 12)).alias("region"),
        _weighted_choice(SEGMENTS, SEGMENT_WEIGHTS, F.rand(seed + 13)).alias(
            "segment"
        ),
        (
            F.to_timestamp(F.lit("2021-01-01"))
            + F.make_dt_interval(days=(F.rand(seed + 14) * 1095).cast("int"))
        ).alias("join_date"),
        F.round(F.rand(seed + 15) * 9900 + 100, 2).alias("lifetime_value"),
    )


def gen_products(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """products: FIXTURES.md A3 (data-upload-script.py:94-117)."""
    df = _ranged(spark, n)
    return df.select(
        F.format_string("PROD-%04d", F.col("id")).alias("product_id"),
        F.concat_ws(
            " ",
            _choice(BRANDS, F.rand(seed + 20)),
            _choice(TYPES, F.rand(seed + 21)),
            F.format_string("X%d", (F.rand(seed + 22) * 100).cast("int")),
        ).alias("product_name"),
        _choice(CATEGORIES, F.rand(seed + 23)).alias("category"),
        F.round(F.rand(seed + 24) * 1990 + 10, 2).alias("price"),
        (F.rand(seed + 25) < 0.8).alias("in_stock"),
        (F.rand(seed + 26) * 1000).cast("int").alias("stock_quantity"),
        (
            F.to_timestamp(F.lit("2020-01-01"))
            + F.make_dt_interval(days=(F.rand(seed + 27) * 1460).cast("int"))
        ).alias("launch_date"),
    )
