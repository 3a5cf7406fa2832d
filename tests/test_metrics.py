"""Operational metrics table (VERDICT r6 item 4: CloudWatch parity).

A QueryExecutionListener on the session must yield one metrics row per
executed action — engine.sql collections, process() writes, search()
fetches — with wall time, fingerprint, output rows, and shuffle bytes,
exported to the `_metrics` parquet table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_aws_spark.engine import DataLakeEngine


def _engine(spark, tmp_path):
    eng = DataLakeEngine(spark, tmp_path / "lake")
    eng.ingest_batch(
        [{"text": f"alpha doc {i}", "v": i} for i in range(8)], data_type="t1"
    )
    return eng


def test_metrics_rows_for_sql_process_search(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    rec = eng.enable_metrics()

    df = eng.sql("SELECT 1 AS one")
    rec.register_label(df, "probe_sql")
    df.collect()

    eng.process()  # promote + index: write-path executions
    eng.search(term="alpha").collect()

    assert rec.wait_for({"probe_sql"}, timeout_s=30.0)
    m = eng.metrics()
    assert set(m.columns) == {
        "ts",
        "func_name",
        "fingerprint",
        "label",
        "plan",
        "wall_ms",
        "out_rows",
        "shuffle_bytes",
    }
    rows = m.collect()
    assert len(rows) >= 3  # sql + process writes + search collect
    labeled = [r for r in rows if r["label"] == "probe_sql"]
    assert len(labeled) == 1
    assert labeled[0]["wall_ms"] > 0
    assert labeled[0]["out_rows"] == 1
    # every recorded action has a fingerprint and non-negative wall
    assert all(r["fingerprint"] is not None for r in rows)
    rec.uninstall()


def test_metrics_shuffle_bytes_and_cardinality(spark, tmp_path):
    """A shuffling aggregation must report shuffle_bytes > 0 and the
    result cardinality; re-running the same query accumulates runs
    under one fingerprint (the rollup dimension)."""
    eng = DataLakeEngine(spark, tmp_path / "lake")
    rec = eng.enable_metrics()
    spark.range(0, 20000, 1, 8).withColumn(
        "k", F.col("id") % 13
    ).createOrReplaceTempView("tm_probe")
    df = eng.sql("SELECT k, count(*) AS n FROM tm_probe GROUP BY k")
    rec.register_label(df, "grouped")
    df.collect()
    df.collect()
    assert rec.wait_for({"grouped"}, timeout_s=30.0, count=2)
    m = eng.metrics().filter("label = 'grouped'")
    rows = m.collect()
    assert len(rows) == 2  # one row per execution, same fingerprint
    assert len({r["fingerprint"] for r in rows}) == 1
    for r in rows:
        assert r["out_rows"] == 13
        assert r["shuffle_bytes"] > 0
        assert r["wall_ms"] > 0
    rec.uninstall()


def test_metrics_flush_batches_and_listener_survives_errors(spark, tmp_path):
    """flush() drains the buffer (second flush writes nothing new) and
    a failed query is recorded as :FAILED without breaking the
    listener."""
    eng = DataLakeEngine(spark, tmp_path / "lake")
    rec = eng.enable_metrics()
    eng.sql("SELECT 2 AS two").collect()
    import time

    deadline = time.time() + 20
    n = 0
    while time.time() < deadline and n == 0:
        n = rec.flush()
        time.sleep(0.05)
    assert n >= 1
    assert rec.flush() == 0  # drained
    try:
        eng.sql("SELECT assert_true(false)").collect()
    except Exception:
        pass
    df = eng.sql("SELECT 3 AS three")
    rec.register_label(df, "after_failure")
    df.collect()
    assert rec.wait_for({"after_failure"}, timeout_s=30.0)
    rec.uninstall()


def test_uninstall_stops_recording_and_reinstall_is_single(spark, tmp_path):
    """py4j cannot actually unregister a Python callback proxy (a
    fresh proxy is created per conversion, so unregister never
    matches) — the off-switch is the flag, and re-install must NOT
    stack a second proxy (which would double every row)."""
    import time

    from serverless_datalake_aws_spark.operators.metrics import MetricsRecorder

    rec = MetricsRecorder(spark, str(tmp_path / "m")).install()
    spark.range(3).collect()
    deadline = time.time() + 20
    while time.time() < deadline and not rec._buffer:
        time.sleep(0.05)
    n1 = len(rec._buffer)
    assert n1 >= 1

    rec.uninstall()
    spark.range(4).collect()
    time.sleep(2)
    assert len(rec._buffer) == n1  # detached: nothing recorded

    rec.install()  # re-enable
    df = spark.range(6).groupBy((F.col("id") % 2).alias("k")).count()
    rec.register_label(df, "reinstalled")
    df.collect()
    assert rec.wait_for({"reinstalled"}, timeout_s=20.0)
    time.sleep(2)  # allow any (wrong) duplicate delivery to land
    labeled = [r for r in rec._buffer if r["label"] == "reinstalled"]
    assert len(labeled) == 1  # exactly once — no stacked proxies
    rec.uninstall()
