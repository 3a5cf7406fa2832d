"""Fixture-generator tests (T19): schema parity with FIXTURES.md §A and
determinism under a fixed seed."""

from __future__ import annotations

from serverless_datalake_aws_spark.operators.datagen import (
    PRODUCTS,
    REGIONS,
    SEGMENTS,
    gen_customers,
    gen_products,
    gen_sales,
)


def test_sales_schema_and_domains(spark):
    df = gen_sales(spark, n=200)
    assert df.count() == 200
    assert dict(df.dtypes) == {
        "transaction_id": "string",
        "date": "timestamp",
        "product": "string",
        "region": "string",
        "quantity": "int",
        "unit_price": "double",
        "total_price": "double",
    }
    rows = df.collect()
    assert all(r["product"] in PRODUCTS for r in rows)
    assert all(r["region"] in REGIONS for r in rows)
    assert all(1 <= r["quantity"] <= 9 for r in rows)
    assert all(10 <= r["unit_price"] <= 1000 for r in rows)
    assert all(
        abs(r["total_price"] - round(r["quantity"] * r["unit_price"], 2)) < 1e-9
        for r in rows
    )
    assert rows[0]["transaction_id"] == "TXN-000000"


def test_customers_schema_and_weighting(spark):
    df = gen_customers(spark, n=500)
    rows = df.collect()
    assert len(rows) == 500
    assert all(r["segment"] in SEGMENTS for r in rows)
    assert all(r["email"].endswith("@example.com") and r["email"].islower() for r in rows)
    # weighted choice: Standard (p=0.5) must dominate Premium (p=0.2)
    seg_counts = {s: sum(1 for r in rows if r["segment"] == s) for s in SEGMENTS}
    assert seg_counts["Standard"] > seg_counts["Premium"]


def test_products_schema(spark):
    df = gen_products(spark, n=100)
    rows = df.collect()
    assert len(rows) == 100
    assert dict(df.dtypes)["in_stock"] == "boolean"
    in_stock_ratio = sum(r["in_stock"] for r in rows) / 100
    assert 0.6 < in_stock_ratio <= 1.0  # p=0.8


def test_deterministic_under_seed(spark):
    a = gen_sales(spark, n=50, seed=7).collect()
    b = gen_sales(spark, n=50, seed=7).collect()
    c = gen_sales(spark, n=50, seed=8).collect()
    assert a == b
    assert a != c
