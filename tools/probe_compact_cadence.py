#!/usr/bin/env python
"""Compaction-cadence probe (VERDICT r11 #2): does absorb()'s
dir-count-triggered compact keep a long-lived ingest index's epoch-dir
count bounded and its per-batch listing cost flat?

Absorbs N_BATCHES small micro-batches (each with a couple of near-dup
family members so the history fetch keeps firing) into two
MinHashIngestIndex states — cadence ON (compact_every=16, the
default) vs OFF (None) — and prints per-batch JSON lines with:

- wall_s:    absorb wall
- toks_dirs: epoch-dir count under toks/ (the listing-growth killer)
- list_s:    a pure listing-cost witness — wall of
             spark.read.parquet(toks).inputFiles() on a FRESH view
             (no cached file index)

Expected shape: OFF grows toks_dirs one per batch and list_s with it;
ON stays sawtooth-bounded at <= compact_every with flat list_s. The
two final pair sets must be identical (asserted).

Usage:  python tools/probe_compact_cadence.py [N_BATCHES]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
OUT = os.environ.get("SPARK_GRAFT_PCC_DIR", "/tmp/pcc")

_BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the slow red hen walks under the old wooden fence at dawn"
)


def _batch(spark, e: int):
    # 20 singletons + 2 members of a recurring near-dup family per
    # batch: every batch has cross-batch candidates against history
    rows = [
        (e * 100 + i, f"{_BASE} unique{e}_{i} filler words here") for i in range(20)
    ] + [
        (e * 100 + 90, _BASE + f" tail{e % 3}"),
        (e * 100 + 91, _BASE + f" tail{(e + 1) % 3}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def run(spark, mode: str, compact_every):
    from serverless_datalake_aws_spark.operators.stream_dedup import (
        MinHashIngestIndex,
    )

    path = f"{OUT}/{mode}"
    shutil.rmtree(path, ignore_errors=True)
    idx = MinHashIngestIndex(spark, path, compact_every=compact_every)
    for e in range(N_BATCHES):
        b = _batch(spark, e)
        t0 = time.perf_counter()
        idx.absorb(b, e)
        wall = time.perf_counter() - t0
        toks = os.path.join(path, "toks")
        dirs = sum(1 for d in os.listdir(toks) if d.startswith("epoch="))
        t1 = time.perf_counter()
        n_files = len(spark.read.parquet(toks).inputFiles())
        list_s = time.perf_counter() - t1
        print(
            json.dumps(
                {
                    "mode": mode,
                    "epoch": e,
                    "wall_s": round(wall, 3),
                    "toks_dirs": dirs,
                    "toks_files": n_files,
                    "list_s": round(list_s, 3),
                }
            ),
            flush=True,
        )
    return {
        (r["doc1"], r["doc2"], r["jac"]) for r in idx.pairs().collect()
    }


def main() -> None:
    from serverless_datalake_aws_spark.session import get_session

    spark = get_session(app_name="probe_compact_cadence")
    spark.sparkContext.setLogLevel("ERROR")
    on = run(spark, "cadence_on", 16)
    off = run(spark, "cadence_off", None)
    assert on == off, "pair sets diverged across cadence modes"
    print(json.dumps({"final_pairs": len(on), "identical": True}))


if __name__ == "__main__":
    main()
