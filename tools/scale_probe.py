#!/usr/bin/env python
"""Deterministic 10x scale probe (SCALE.md "10x scale probe" section).

Rebuilds the 10x fixture from sf0.1 — per document: the original, 2
one-word deletions, 1 verbatim copy, 6 word-shuffles (replica near-dup
structure that stresses banding/dedup); per embedding: 10 sigma=0.05
noise replicas (stresses ANN bucket selectivity). All randomness is
seeded per row id, so the fixture is bit-identical across rounds and the
numbers are comparable round-over-round. Remaining sf0.1 tables are
copied verbatim so any registered query runs against the fixture dir.

Usage:
    python tools/scale_probe.py                    # default probe set
    python tools/scale_probe.py d04 s18 t29        # prefix-filtered
    SPARK_GRAFT_PROBE_DIR=/tmp/sfx10 python tools/scale_probe.py

Prints one JSON line per query plus a summary (same shape as
timing_sweep.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_PROBE = (
    "d03_ngram_jaccard_pairs",
    "d04_minhash_lsh_pairs",
    "d09_containment_pairs",
    "d11_simhash_banded_pairs",
    "s02_lsh_ann",
    "s03_embedding_neardup",
    "s05_ivf_ann",
    "s12_knn_graph",
    "s18_semdedup",
    "t28_pii_redaction",
    "t29_repetition_signals",
    "t30_pps_sample",
    "p05_training_data_pipeline",
    "p06_curation_pipeline",
    # round-5 probe targets (events/orders now also build 10x)
    "e17_incremental_rollup",
    "m05_quality_constraints",
    # round-6: composed IVF-PQ (raw + residual) — 10x vectors stress the
    # probe-join fan-in; d18 at REAL scale is in scale_probe_100x.py
    "s21_ivf_pq_ann",
    "s22_ivfpq_residual_ann",
    "d18_simhash56_banded_pairs",
)


_SHARDS = 16  # single-file tables scan as ONE Spark task regardless of
# cores (files split at maxPartitionBytes=128MB) — a 4 MB fixture file
# serializes every row-local stage; shard so the probe measures the
# multi-file reality of any real table


def _write_sharded(t: pa.Table, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    n = t.num_rows
    step = (n + _SHARDS - 1) // _SHARDS
    for s in range(_SHARDS):
        chunk = t.slice(s * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{s:03d}.parquet"))


def _build_documents(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for d, tx, lg, sc in zip(doc_id, text, lang, source):
        words = tx.split(" ")
        rng = np.random.default_rng(d)
        variants = [tx, tx]  # original + verbatim copy
        for _ in range(2):  # one-word deletions
            if len(words) > 1:
                k = int(rng.integers(0, len(words)))
                variants.append(" ".join(words[:k] + words[k + 1 :]))
            else:
                variants.append(tx)
        for _ in range(6):  # word shuffles
            perm = rng.permutation(len(words))
            variants.append(" ".join(words[i] for i in perm))
        for r, v in enumerate(variants):
            ids.append(d * 10 + r)
            texts.append(v)
            langs.append(lg)
            sources.append(sc)
            n_chars.append(len(v))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "documents.parquet"))


def _build_embeddings(out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    label = t.column("label").to_pylist()
    ids, vecs, labels = [], [], []
    for v, e, lb in zip(vec_id, emb, label):
        base = np.asarray(e, dtype=np.float32)
        rng = np.random.default_rng(v)
        for r in range(10):
            ids.append(v * 10 + r)
            if r == 0:
                vecs.append(base.tolist())
            else:
                vecs.append(
                    (base + rng.normal(0, 0.05, base.shape).astype(np.float32))
                    .astype(np.float32)
                    .tolist()
                )
            labels.append(lb)
    out = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "embeddings.parquet"))


def _build_events(out_dir: str) -> None:
    """10x events: each row replicated with event_id*10+r, ts shifted by
    r ms, same user/type/value — groups (event_type, day) stay constant
    while rows-per-group grow 10x, the realistic rollup scale-up."""
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = t.num_rows
    idx = np.repeat(np.arange(n), 10)
    r = np.tile(np.arange(10), n)
    ev = t.take(pa.array(idx))
    event_id = pa.array(
        np.asarray(ev.column("event_id")) * 10 + r, pa.int64()
    )
    ts = np.asarray(ev.column("ts").cast(pa.int64())) + r * 1000
    out = pa.table(
        {
            "event_id": event_id,
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": ev.column("user_id"),
            "event_type": ev.column("event_type"),
            "value": ev.column("value"),
            "props": ev.column("props"),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "events.parquet"))


def _build_orders(out_dir: str) -> None:
    """10x orders: o_orderkey*10+r keeps exact uniqueness (m05's
    uniqueness check must still pass at 10x); other columns repeat."""
    t = pq.read_table(os.path.join(SRC, "orders.parquet"))
    n = t.num_rows
    idx = np.repeat(np.arange(n), 10)
    r = np.tile(np.arange(10), n)
    od = t.take(pa.array(idx))
    out = pa.table(
        {
            "o_orderkey": pa.array(
                np.asarray(od.column("o_orderkey")) * 10 + r, pa.int64()
            ),
            "o_custkey": od.column("o_custkey"),
            "o_orderstatus": od.column("o_orderstatus"),
            "o_totalprice": od.column("o_totalprice"),
            "o_orderdate": od.column("o_orderdate"),
            "o_orderpriority": od.column("o_orderpriority"),
        }
    )
    _write_sharded(out, os.path.join(out_dir, "orders.parquet"))


def build_fixture(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".complete")
    if not os.path.exists(marker):
        _build_documents(out_dir)
        _build_embeddings(out_dir)
        for f in os.listdir(SRC):
            if f.endswith(".parquet") and f not in (
                "documents.parquet",
                "embeddings.parquet",
            ):
                shutil.copy(os.path.join(SRC, f), os.path.join(out_dir, f))
        with open(marker, "w") as fh:
            fh.write("ok\n")
    # round-5 additions (separate marker so pre-existing fixtures gain
    # the new tables without invalidating the doc/emb numbers)
    marker2 = os.path.join(out_dir, ".complete_r5")
    if not os.path.exists(marker2):
        for f in ("events.parquet", "orders.parquet"):
            p = os.path.join(out_dir, f)
            if os.path.isfile(p):
                os.remove(p)  # replace the verbatim 1x copy
            elif os.path.isdir(p):
                shutil.rmtree(p)
        _build_events(out_dir)
        _build_orders(out_dir)
        with open(marker2, "w") as fh:
            fh.write("ok\n")


def zorder_probe(spark, out_dir: str) -> dict:
    """Measure z-order file skipping on the 10x events table: write the
    same 1M rows (a) z-clustered on (user_id, value_cents) and (b)
    sorted on user_id only, then count the files whose parquet footer
    min/max box CONTAINS a 2-D point predicate — the files any
    stats-pruning scan must read. Z-order must prune on BOTH columns;
    single-column sort prunes only its own column."""
    import glob as _glob

    from pyspark.sql import functions as F

    from serverless_datalake_aws_spark.operators.layout import zorder_write

    ev = spark.read.parquet(os.path.join(out_dir, "events.parquet")).select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    zpath = os.path.join(out_dir, "_zorder_events")
    spath = os.path.join(out_dir, "_sorted_events")
    zorder_write(ev, zpath, ("user_id", "value_cents"), bits=10, num_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def file_boxes(path: str) -> list[dict]:
        boxes = []
        for f in sorted(_glob.glob(path + "/part-*.parquet")):
            md = pq.read_metadata(f)
            mins: dict[str, int] = {}
            maxs: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    nm = col.path_in_schema
                    if nm in ("user_id", "value_cents") and col.statistics:
                        s = col.statistics
                        mins[nm] = min(mins.get(nm, s.min), s.min)
                        maxs[nm] = max(maxs.get(nm, s.max), s.max)
            boxes.append({"mins": mins, "maxs": maxs})
        return boxes

    def hits(boxes: list[dict], preds: dict[str, int]) -> int:
        return sum(
            all(
                b["mins"][c] <= v <= b["maxs"][c]
                for c, v in preds.items()
            )
            for b in boxes
        )

    # mid-range point per dimension; probe each dimension alone and both
    mid = ev.agg(
        F.expr("percentile(user_id, 0.5)").cast("long"),
        F.expr("percentile(value_cents, 0.5)").cast("long"),
    ).collect()[0]
    u, v = mid[0], mid[1]
    zb, sb = file_boxes(zpath), file_boxes(spath)
    return {
        "probe": "zorder_file_skipping",
        "predicate": {"user_id": u, "value_cents": v},
        "files_total": len(zb),
        "files_read": {
            "zorder": {
                "user_only": hits(zb, {"user_id": u}),
                "value_only": hits(zb, {"value_cents": v}),
                "both": hits(zb, {"user_id": u, "value_cents": v}),
            },
            "sorted_by_user": {
                "user_only": hits(sb, {"user_id": u}),
                "value_only": hits(sb, {"value_cents": v}),
                "both": hits(sb, {"user_id": u, "value_cents": v}),
            },
        },
    }


def main() -> None:
    out_dir = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_10x")
    t0 = time.time()
    build_fixture(out_dir)
    build_sec = round(time.time() - t0, 1)

    from serverless_datalake_aws_spark.plans import all_queries  # noqa: E402
    from serverless_datalake_aws_spark.session import get_session  # noqa: E402

    prefixes = tuple(a for a in sys.argv[1:] if a != "zorder")
    run_zorder = "zorder" in sys.argv[1:]
    qmap = all_queries()
    names = [
        n
        for n in (sorted(qmap) if prefixes else DEFAULT_PROBE)
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    if run_zorder and not prefixes:
        names = []
    spark = get_session(app_name="scale_probe")
    if run_zorder:
        print(json.dumps(zorder_probe(spark, out_dir)))
    results: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        try:  # warmup at sf0.001 (codegen), then one timed 10x run
            qmap[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
            t1 = time.time()
            qmap[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            results[name] = round(time.time() - t1, 2)
            print(json.dumps({"query": name, "sec_10x": results[name]}))
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(json.dumps({"query": name, "error": failures[name]}))
    print(
        json.dumps(
            {
                "fixture": out_dir,
                "fixture_build_sec": build_sec,
                "n": len(results),
                "total_sec": round(sum(results.values()), 2),
                "slowest": sorted(
                    results.items(), key=lambda kv: -kv[1]
                )[:10],
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
