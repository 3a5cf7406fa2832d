#!/usr/bin/env python
"""Capture explain("formatted") for named declared queries to files.

    python tools/capture_plans.py OUTDIR SUFFIX [SF_DIR] name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt containing the returned DataFrame's
formatted physical plan. Queries that materialize internally (the
registration-wall family, the st15/st20 ingest maintainers) return a
driver-local relation; with SPARK_GRAFT_CAPTURE_PLANS=1 (set here) their
internal legs stamp plans into plancap.CAPTURED, which this tool appends
to the same file so the judge sees the plans that actually execute.

SPARK_GRAFT_REPO selects which checkout's package to capture from
(default: this script's repo) — used to produce the `_before.txt` files
from a scratch worktree of the prior round's HEAD.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

repo = os.environ.get("SPARK_GRAFT_REPO") or os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, repo)
os.environ["SPARK_GRAFT_CAPTURE_PLANS"] = "1"

from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
from serverless_datalake_aws_spark.session import get_session  # noqa: E402

try:
    from serverless_datalake_aws_spark import plancap  # noqa: E402
except ImportError:  # pre-r11 checkout without the capture hook
    plancap = None


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    qmap = all_queries()
    for name in names:
        if plancap is not None:
            plancap.CAPTURED.clear()
        df = qmap[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        parts = [
            f"# {name} @ {sf_dir} ({suffix}, repo={repo})",
            "## declared query's returned DataFrame",
            buf.getvalue(),
        ]
        for key in sorted(plancap.CAPTURED) if plancap is not None else []:
            parts.append(f"## internal leg: {key}")
            parts.append(plancap.CAPTURED[key])
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
