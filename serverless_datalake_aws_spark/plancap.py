"""Opt-in capture of internal-leg physical plans.

Several declared queries (the m07/m10/m12/m13 registration-wall family,
the st15/st20 ingest-index maintainers) materialize their results inside
the callable — their returned DataFrame is a driver-local relation, so
`returned_df.explain()` shows only a LocalTableScan and none of the
plans that actually cost time. The interesting legs (the serving scan,
the pruned history fetch, the distributed pre-write frame) execute and
vanish inside the query body.

`stamp(key, df)` lets those sites publish the formatted physical plan of
an internal DataFrame WITHOUT perturbing normal runs: unless
`SPARK_GRAFT_CAPTURE_PLANS` is set in the environment the call is a
single dict lookup (no plan is rendered, no JVM round-trip), so benched
paths pay nothing. With the env var set, the plan string lands in
`CAPTURED[key]` for tools/capture_plans.py to collect.
"""

from __future__ import annotations

import os

CAPTURED: dict[str, str] = {}

_ENV = "SPARK_GRAFT_CAPTURE_PLANS"


def enabled() -> bool:
    return bool(os.environ.get(_ENV))


def stamp(key: str, df) -> None:
    """Record df's explain('formatted') under `key` when capturing.

    The string comes straight from the JVM
    (queryExecution().explainString) rather than hijacking stdout
    around df.explain(): redirect_stdout captures EVERY stdout write
    during plan rendering, so any concurrent stamp (or stray print)
    would silently interleave into the captured text (ADVICE r11)."""
    if not enabled():
        return
    jvm = df.sparkSession.sparkContext._jvm
    CAPTURED[key] = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
