#!/usr/bin/env python
"""Engine vector-index probe at honest scale: does vector_search's cost
track the PROBED cells, not the corpus?

Reuses scale_probe_ann's 2M-vector fixture (20k bases x 100 noisy
replicas, first 64 ids = 64 distinct bases -> diverse centroids), builds
the ENGINE index once (build_vector_index, 64 cells, cell-partitioned
parquet behind the _LATEST pointer), then times vector_search at
nprobe in {1, 2, 4, 8, 64} over NQ queries, recording per nprobe:

- rows actually scanned (sum of probed-cell populations),
- mean query wall,
- recall@5 against exact brute-force cosine top-5.

Expected shape: scanned ~ corpus x nprobe/64 and wall tracks scanned
(nprobe=64 IS the full scan — the in-harness ceiling). This is the
serving-path twin of scale_probe_ann (which measures the IVF-PQ ADC
plan); here the claim under test is the PARTITION-PRUNED parquet probe.

Usage:  python tools/probe_vector_index.py
Env:    SPARK_GRAFT_PANN_DIR (default /tmp/sfann — shared fixture)
One JSON line per stage; SCALE.md round-9 records the results.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT = os.environ.get("SPARK_GRAFT_PANN_DIR", "/tmp/sfann")
N_CELLS = 64
NQ = 10
TOPK = 5


def log(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def main() -> None:
    from tools.scale_probe_ann import BASES, REPS, build_embeddings

    from serverless_datalake_aws_spark.engine import DataLakeEngine
    from serverless_datalake_aws_spark.functions import vector as VX
    from serverless_datalake_aws_spark.session import get_session

    spark = get_session(app_name="probe_vector_index")
    spark.sparkContext.setLogLevel("ERROR")
    build_embeddings(spark)
    emb = spark.read.parquet(f"{OUT}/embeddings")
    eng = DataLakeEngine(spark, f"{OUT}/lake")

    t0 = time.time()
    try:
        base = eng._vector_current("probe")
        n = spark.read.parquet(f"{base}/cells").count()
    except FileNotFoundError:
        n = eng.build_vector_index(emb, name="probe", n_cells=N_CELLS)
        base = eng._vector_current("probe")
    cells = {
        r["cid"]: r["n"]
        for r in spark.read.parquet(f"{base}/cells")
        .groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    log(
        {
            "stage": "index_build_or_load",
            "rows": n,
            "n_cells_used": len(cells),
            "cell_min": min(cells.values()),
            "cell_max": max(cells.values()),
            "sec": round(time.time() - t0, 1),
        }
    )

    qids = [(i * 99991) % (BASES * REPS) for i in range(NQ)]
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    # exact ground truth: one vectorized brute pass per query set
    t0 = time.time()
    truth: dict[int, list[int]] = {}
    scores = VX.brute_scores(
        emb, sorted(qrows.items()), metric="cosine"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    for r in (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .collect()
    ):
        truth.setdefault(r["query_id"], []).append(r["neighbor_id"])
    log({"stage": "brute_truth", "sec": round(time.time() - t0, 1)})

    cb = spark.read.parquet(f"{base}/codebook").collect()

    def probed_rows(qv: list[float], nprobe: int) -> int:
        qn = math.sqrt(sum(x * x for x in qv))
        ranked = sorted(
            (
                -round(
                    sum(a * b for a, b in zip(r["embedding"], qv))
                    / (
                        (
                            math.sqrt(sum(x * x for x in r["embedding"]))
                            * qn
                        )
                        or float("inf")
                    ),
                    6,
                ),
                r["cid"],
            )
            for r in cb
        )
        return sum(cells.get(cid, 0) for _s, cid in ranked[:nprobe])

    for nprobe in (1, 2, 4, 8, 64):
        walls, hits, scanned = [], 0, 0
        for qid, qv in qrows.items():
            scanned += probed_rows(qv, nprobe)
            t0 = time.time()
            got = [
                r["vec_id"]
                for r in eng.vector_search(
                    qv, k=TOPK + 1, nprobe=nprobe, name="probe"
                ).collect()
                if r["vec_id"] != qid
            ][:TOPK]
            walls.append(time.time() - t0)
            hits += len(set(got) & set(truth.get(qid, [])))
        log(
            {
                "stage": "query",
                "nprobe": nprobe,
                "rows_scanned_mean": scanned // NQ,
                "wall_mean_s": round(sum(walls) / len(walls), 3),
                "recall_at_5": round(hits / (NQ * TOPK), 3),
            }
        )


if __name__ == "__main__":
    main()
