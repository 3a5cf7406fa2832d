#!/usr/bin/env python
"""Full-registry DuckDB parity sweep at an arbitrary SF.

The pytest mirror runs sf0.001 on every pass and sf0.01 on demand (the
driver's gate SF); this tool runs the SAME row-count+schema+value-hash
check over every registered query at any SF dir — the tier that caught
q31's argmax tie at sf0.1 (invisible at both smaller SFs). Run it after
any testdata regeneration or before a round ends:

    python tools/parity_sweep.py                          # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/parity_sweep.py
    python tools/parity_sweep.py q3 e0                    # prefix filter

Prints one line per query and a final summary line; exit code 1 if any
query fails.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
from serverless_datalake_aws_spark.session import get_session  # noqa: E402
from serverless_datalake_aws_spark.testing import check_query  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prefixes = tuple(sys.argv[1:])
    spark = get_session(app_name="parity_sweep")
    names = [
        n
        for n in sorted(all_queries())
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    fails: list[str] = []
    t00 = time.time()
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, name, sf_dir)
            status = "OK" if not problems else "FAIL " + "; ".join(problems)[:200]
        except Exception as exc:  # noqa: BLE001
            status = f"ERR {type(exc).__name__}: {exc}"[:200]
        print(f"{name} {time.time() - t0:.1f}s {status}", flush=True)
        if status != "OK":
            fails.append(name)
    print(
        f"TOTAL {time.time() - t00:.1f}s checked={len(names)} fails={fails}",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
