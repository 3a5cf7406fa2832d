from __future__ import annotations

import os

import pytest

from serverless_datalake_aws_spark.session import get_session

# Default mirrors the quick local loop; set SPARK_GRAFT_TEST_SF_DIR=
# /root/testdata/sf0.01 to run the parity suite at the driver's gate SF
# (round-1's three hash failures were exactly sf-sensitivity bugs).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df, mode: str = "formatted") -> str:
    """Physical-plan text of a DataFrame — the one place that touches
    the private _sc/_jdf surface (plan-gate tests all route through
    here so a PySpark-internal API shift is a one-line fix)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
