#!/usr/bin/env python
"""Bench variance bound (VERDICT r6 item 3): N full passes over the
headline set in ONE warm JVM, with loadavg recorded per pass, so the
round-over-round drift on UNTOUCHED queries can be attributed —
environment vs regression — from data instead of argument.

Output: one JSON line per pass (total + loadavg), then a summary line
with per-query min / median / max across passes and the pass-total
spread. A spread where max/min over passes on an idle box approaches
the observed round-over-round drift is an environment exoneration; a
tight spread with a shifted floor means the box itself got slower.

Usage:  python tools/bench_variance.py [N_PASSES]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
from serverless_datalake_aws_spark.session import get_session  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="bench_variance")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = all_queries()
    # warmup (codegen compile) at the smallest SF
    for name in HEADLINE:
        qmap[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    per_query: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for p in range(passes):
        t_pass = 0.0
        for name in HEADLINE:
            t0 = time.time()
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            per_query[name].append(dt)
            t_pass += dt
        print(
            json.dumps(
                {
                    "pass": p,
                    "total": round(t_pass, 2),
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )

    def stats(xs: list[float]) -> dict:
        s = sorted(xs)
        return {
            "min": round(s[0], 3),
            "p50": round(s[len(s) // 2], 3),
            "max": round(s[-1], 3),
        }

    totals = [sum(per_query[n][p] for n in HEADLINE) for p in range(passes)]
    print(
        json.dumps(
            {
                "summary": True,
                "passes": passes,
                "total": stats(totals),
                "total_spread": round(max(totals) / min(totals), 3),
                "queries": {n: stats(v) for n, v in per_query.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
