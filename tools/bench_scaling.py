#!/usr/bin/env python
"""In-record parallel-scaling evidence (VERDICT r11 #7): at sf0.1
every headline row is sub-4 s and dispatch-bound, so the official
8-vs-32-core ratios sit at ~1 and say nothing about plan parallelism.
This tool benches five representative headline shapes (scan+agg q01,
window-topk q08, sessionize e03, text-aggregation t11, BM25 x03) on a
DETERMINISTIC ~20x replication of the sf0.1 fixture — big enough that
compute, not job dispatch, owns the wall — at 8 and at 32 cores, each
in its own subprocess so `local[$SPARK_GRAFT_CPUS]` is honored exactly
as the driver harness sets it.

Replication is pure Spark expressions (crossJoin with a replica
range, keys offset per replica so user/order key spaces stay
disjoint) — no driver loops, bit-identical across runs. The replica
fixture lives in /tmp and is rebuilt on demand; nothing is persisted
against /root/testdata and no query result is cached anywhere.

Usage:
    python tools/bench_scaling.py                 # build + 8c + 32c + record
    python tools/bench_scaling.py --build         # (internal) fixture build
    python tools/bench_scaling.py --child 8       # (internal) one core count

Env: SPARK_GRAFT_SCALING_DIR (default /tmp/bench_scaling_sf2),
     SPARK_GRAFT_SCALING_REP (default 20),
     SPARK_GRAFT_SCALING_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/bench_scaling_sf2")
REP = int(os.environ.get("SPARK_GRAFT_SCALING_REP", "20"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
SRC = "/root/testdata/sf0.1"
QUERIES = (
    "q01_pricing_summary",
    "q08_window_topk_per_group",
    "e03_sessionize",
    "t11_bigram_pmi",
    "x03_bm25",
)
# table -> (replica key columns to offset, offset stride)
TABLES = {
    "lineitem": (["l_orderkey"], 10_000_000),
    "orders": (["o_orderkey"], 10_000_000),
    "events": (["event_id", "user_id"], 10_000_000),
    "documents": (["doc_id"], 10_000_000),
}


def build() -> None:
    from pyspark.sql import functions as F

    from serverless_datalake_aws_spark.catalog import table
    from serverless_datalake_aws_spark.session import get_session

    spark = get_session(app_name="bench_scaling_build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXTURE, exist_ok=True)
    for name, (keys, stride) in TABLES.items():
        dst = f"{FIXTURE}/{name}.parquet"
        if os.path.exists(f"{dst}/_SUCCESS"):
            continue
        df = table(spark, SRC, name)
        rep = spark.range(REP).select(F.col("id").alias("_rep"))
        out = df.crossJoin(rep)
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("_rep") * stride)
        out = out.drop("_rep").repartition(32)
        out.write.mode("overwrite").parquet(dst)
        print(f"built {name}: {spark.read.parquet(dst).count()} rows",
              file=sys.stderr)


def child(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from serverless_datalake_aws_spark.plans import all_queries
    from serverless_datalake_aws_spark.session import get_session

    spark = get_session(app_name=f"bench_scaling_c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = all_queries()
    timings = {}
    for name in QUERIES:
        # warmup at the small SF: codegen/JIT, not the fixture
        qmap[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        best = 1e9
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(
                f"scaling c{cpus}: {name} {i + 1}/{RUNS}"
            )
            try:
                t0 = time.time()
                qmap[name](spark, FIXTURE).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            finally:
                spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
    print(json.dumps({"cpus": cpus, "queries": timings}))


def main() -> None:
    if "--build" in sys.argv:
        return build()
    if "--child" in sys.argv:
        return child(int(sys.argv[sys.argv.index("--child") + 1]))
    here = os.path.abspath(__file__)
    subprocess.run([sys.executable, here, "--build"], check=True)
    results = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, here, "--child", str(cpus)],
            check=True,
            capture_output=True,
            text=True,
        )
        results[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
    ratios = {
        n: round(results[8]["queries"][n] / results[32]["queries"][n], 2)
        for n in QUERIES
    }
    try:
        la = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        la = [-1.0] * 3
    print(
        json.dumps(
            {
                "metric": "scaling_8v32_cores",
                "unit": "ratio (c8 wall / c32 wall)",
                "fixture": f"sf0.1 x{REP} replicas (deterministic)",
                "runs_per_query": RUNS,
                "agg": "min",
                "queries_c8": results[8]["queries"],
                "queries_c32": results[32]["queries"],
                "speedup_8_to_32": ratios,
                "env": {"loadavg": la, "cpus": os.cpu_count()},
            }
        )
    )


if __name__ == "__main__":
    main()
