#!/usr/bin/env python
"""Red-flag audit over every declared query's physical plan.

    python tools/plan_audit.py [SF_DIR] [prefix ...]

Builds each registered query at SF_DIR (default sf0.001 — construction
executes any in-query registration work, so the smallest SF keeps the
sweep cheap) and counts plan nodes that matter at 100 TB:

  EX   = Exchange nodes (shuffles)
  SMJ  = SortMergeJoin, SHJ = ShuffledHashJoin, BHJ = BroadcastHashJoin
  NLJ  = BroadcastNestedLoopJoin, CART = CartesianProduct
  PYROW = BatchEvalPython (row-at-a-time Python UDF — the boundary §4
          says must not exist on query paths)
  PYVEC = ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
          MapInArrow (vectorized Python; expected on the declared
          pandas-UDF seams only)
  PUSH = 1 when any scan carries PushedFilters beyond []

Internal legs stamped via plancap (registration-wall serves, ingest
history fetches) are audited too when present. One line per query +
a tail summary of every query tripping a red flag.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CAPTURE_PLANS", "1")

from serverless_datalake_aws_spark import plancap  # noqa: E402
from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
from serverless_datalake_aws_spark.session import get_session  # noqa: E402

# Matched against the numbered detail section only ("(3) Exchange"),
# so each physical node counts exactly once (the tree rendering above
# the details would double every count).
COUNTERS = (
    ("EX", r"^\(\d+\) Exchange\b"),
    ("SMJ", r"^\(\d+\) SortMergeJoin\b"),
    ("SHJ", r"^\(\d+\) ShuffledHashJoin\b"),
    ("BHJ", r"^\(\d+\) BroadcastHashJoin\b"),
    ("NLJ", r"^\(\d+\) BroadcastNestedLoopJoin\b"),
    ("CART", r"^\(\d+\) CartesianProduct\b"),
    ("PYROW", r"^\(\d+\) BatchEvalPython\b"),
    (
        "PYVEC",
        r"^\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
        r"|MapInArrow|FlatMapGroupsInPandasWithState|PythonMapInArrow)\b",
    ),
)


def main() -> int:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, prefixes = rest[0], tuple(rest[1:])
    else:
        sf_dir, prefixes = "/root/testdata/sf0.001", tuple(rest)
    spark = get_session(app_name="plan_audit")
    qmap = all_queries()
    names = [
        n
        for n in sorted(qmap)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    flagged: list[str] = []
    hdr = "name\t" + "\t".join(k for k, _ in COUNTERS) + "\tPUSH\tlegs"
    print(hdr, flush=True)
    for name in names:
        plancap.CAPTURED.clear()
        try:
            df = qmap[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            texts = [buf.getvalue()] + list(plancap.CAPTURED.values())
            legs = len(plancap.CAPTURED)
        except Exception as exc:  # noqa: BLE001 — audit must finish
            print(f"{name}\tERR {type(exc).__name__}: {exc}"[:160], flush=True)
            flagged.append(f"{name} ERR")
            continue
        text = "\n".join(texts)
        counts = {
            k: len(re.findall(rx, text, flags=re.MULTILINE))
            for k, rx in COUNTERS
        }
        push = int(
            any(
                m.group(1).strip() not in ("[]", "")
                for m in re.finditer(r"PushedFilters: (\[.*?\])", text)
            )
        )
        row = (
            name
            + "\t"
            + "\t".join(str(counts[k]) for k, _ in COUNTERS)
            + f"\t{push}\t{legs}"
        )
        print(row, flush=True)
        if counts["CART"] or counts["PYROW"]:
            flagged.append(
                f"{name} CART={counts['CART']} PYROW={counts['PYROW']}"
            )
    print("FLAGGED:", flagged if flagged else "none", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
