"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from serverless_datalake_aws_spark.plans import all_oracles, all_queries
from serverless_datalake_aws_spark.testing import check_query
from tests.conftest import SF_DIR

# The mirror runs distinct queries only — the driver-sample aliases
# (plans.DRIVER_SAMPLE_ALIASES) point at names already in this list.
QUERY_NAMES = sorted(all_queries(include_aliases=False))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, name):
    problems = check_query(spark, name, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs_nonempty(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    assert df.count() >= 0


# Every registered query — including the watermarked streaming entries,
# whose append-mode gate is replayed in SQL against the final watermark
# (max event time - delay) — now carries a value-level oracle. Keep the
# set around so a future genuinely nondeterministic entry has a
# declared escape hatch.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_declared():
    oracles = all_oracles()
    missing = [n for n in QUERY_NAMES if n not in oracles and n not in ROWS_ONLY]
    assert missing == [], f"queries missing oracles: {missing}"
