"""Operational query metrics — CloudWatch parity (VERDICT r6 item 4).

The reference wires CloudWatch dashboards + alarms over its Lambda and
Athena surfaces (deploy-script.sh:133-180,
aws-data-lake-terraform-main.tf:391-448): every query execution emits
wall time / rows / bytes metrics that ops roll up. This module gives
the engine the same telemetry, Spark-first: a real
`QueryExecutionListener` registered on the session's listener manager
through the py4j callback server (the same mechanism PySpark's
streaming listeners use), so EVERY action on the session — engine.sql
results being collected, process() writes, search() fetches — yields
one metrics row with zero double-execution and no polling.

Per row: (ts, func_name, fingerprint, label, plan, wall_ms, out_rows,
shuffle_bytes).

- `fingerprint` is the ANALYZED plan's semanticHash — Catalyst's own
  canonical query identity (stable across runs of the same query text
  over the same schema; the Athena "query fingerprint" analogue).
- `label` joins fingerprints back to human names: callers tag a
  DataFrame via `register_label(df, "daily_rollup")` and every later
  execution of a semantically-equal plan carries the tag.
- `shuffle_bytes` sums the `shuffle bytes written` SQLMetric over the
  executed plan (AQE-aware: the walk takes `finalPhysicalPlan` and
  unwraps QueryStageExec nodes), `out_rows` is the root operator's
  `number of output rows`.

Listener callbacks run on Spark's async listener bus, so the callback
does NO Spark work (it appends to an in-memory buffer — a re-entrant
listener writing through Spark would recurse); `flush()` persists the
buffer to the `_metrics` parquet table via pyarrow directly. At scale
this is exactly the CloudWatch agent shape: cheap in-path capture,
asynchronous batched export, one small file per flush (compact with
sources/compact.py like any other small-file feed).
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from datetime import datetime, timezone

METRIC_COLUMNS = (
    "ts",
    "func_name",
    "fingerprint",
    "label",
    "plan",
    "wall_ms",
    "out_rows",
    "shuffle_bytes",
)


def flush_rows(path: str, rows: list[dict], schema) -> int:
    """Shared telemetry export: write `rows` as one uuid-named parquet
    part file under `path` via pyarrow directly (an exporter must not
    run Spark jobs — a batch listener would re-enter itself). Used by
    both the batch recorder here and the streaming recorder
    (streaming/observability.py).

    The write holds the feed's FileLock — the same lock
    engine.maintain() takes while compacting the feed (an unlocked
    flush landing between compaction's rmtree and rename would be
    silently deleted)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from serverless_datalake_aws_spark.sources.commitlog import FileLock

    if not rows:
        return 0
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(path, exist_ok=True)
    with FileLock(path.rstrip("/") + ".lock", ttl=30.0):
        pq.write_table(
            table, os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        )
    return len(rows)


def _walk_final_plan(executed):
    """Yield every physical node, entering AQE wrappers and query
    stages (their children() are Nil; the real subtree hangs off
    finalPhysicalPlan() / plan())."""
    try:
        if executed.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            executed = executed.finalPhysicalPlan()
    except Exception:
        pass
    stack = [executed]
    while stack:
        node = stack.pop()
        yield node
        cls = node.getClass().getSimpleName()
        if cls.endswith("QueryStageExec"):
            try:
                stack.append(node.plan())
            except Exception:
                pass
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        try:
            inner = node.innerChildren()
            for i in range(inner.size()):
                stack.append(inner.apply(i))
        except Exception:
            pass


def _metric_values(node):
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        yield str(kv._2().name()), kv._2().value()


class MetricsRecorder:
    """Session-wide query-execution telemetry with parquet export."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self._buffer: list[dict] = []
        self._labels: dict[int, str] = {}
        self._lock = threading.Lock()
        self._installed = False
        self._ever_registered = False  # JVM-side registration is one-way

    # -- labeling ----------------------------------------------------
    def register_label(self, df, label: str) -> None:
        """Tag a DataFrame's canonical plan identity; any execution of
        a semantically-equal plan is recorded under `label`."""
        fp = int(df._jdf.queryExecution().analyzed().semanticHash())
        with self._lock:
            self._labels[fp] = label

    # -- listener ----------------------------------------------------
    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    def onSuccess(self, funcName, qe, durationNs):  # noqa: N802 (Java iface)
        if not self._installed:
            return  # detached: py4j may still route a straggler here
        try:

            def _read_metrics():
                sh, rows = 0, -1
                for node in _walk_final_plan(qe.executedPlan()):
                    for name, value in _metric_values(node):
                        if "shuffle bytes written" in name:
                            sh += int(value)
                        elif rows < 0 and "number of output rows" in name:
                            # first node carrying the metric on the
                            # walk from the root = result cardinality
                            rows = int(value)
                return sh, rows

            shuffle, out_rows = _read_metrics()
            fp = int(qe.analyzed().semanticHash())

            def _record(sh, rows) -> None:
                with self._lock:
                    self._buffer.append(
                        {
                            "ts": datetime.now(timezone.utc),
                            "func_name": str(funcName),
                            "fingerprint": fp,
                            "label": self._labels.get(fp),
                            "plan": str(qe.analyzed().simpleString(25))[:200],
                            "wall_ms": float(durationNs) / 1e6,
                            "out_rows": rows,
                            "shuffle_bytes": sh,
                        }
                    )

            if out_rows == 0:
                # SQLMetric accumulator values can lag the listener
                # callback for a plan's FIRST execution (observed:
                # root agg reads 0 at callback time, correct value
                # ~100ms later). 0 is ambiguous (legit empty result
                # vs lag) — re-read after a short delay OFF the shared
                # listener-bus thread (a sleep here would serialize
                # every listener on the session behind each empty
                # result and back the bus up until events drop).
                def _deferred() -> None:
                    try:
                        _record(*_read_metrics())
                    except Exception:
                        pass

                threading.Timer(0.2, _deferred).start()
            else:
                _record(shuffle, out_rows)
        except Exception:
            pass  # telemetry must never fail a query

    def onFailure(self, funcName, qe, exception):  # noqa: N802
        if not self._installed:
            return
        try:
            with self._lock:
                self._buffer.append(
                    {
                        "ts": datetime.now(timezone.utc),
                        "func_name": f"{funcName}:FAILED",
                        "fingerprint": int(qe.analyzed().semanticHash()),
                        "label": None,
                        "plan": str(qe.analyzed().simpleString(25))[:200],
                        "wall_ms": -1.0,
                        "out_rows": -1,
                        "shuffle_bytes": -1,
                    }
                )
        except Exception:
            pass

    def install(self) -> "MetricsRecorder":
        if self._installed:
            return self
        # register the JVM proxy at most ONCE per recorder: unregister
        # cannot remove it (see uninstall), so a re-install that
        # registered again would stack proxies and double every row —
        # re-enabling just flips the flag back on
        if not self._ever_registered:
            from pyspark.java_gateway import ensure_callback_server_started

            ensure_callback_server_started(self.spark.sparkContext._gateway)
            self.spark._jsparkSession.listenerManager().register(self)
            self._ever_registered = True
        self._installed = True
        return self

    def uninstall(self) -> None:
        """Detach. py4j wraps a Python callback object in a FRESH Java
        proxy per conversion, so `unregister(self)` passes a proxy the
        listener bus never saw and removes nothing (verified live) —
        the flag is the real off-switch: callbacks still arrive but
        record nothing. The unregister attempt stays for the day py4j
        interns proxies; `clear()` is not used because it would strip
        listeners this module does not own."""
        if self._installed:
            self._installed = False  # off-switch FIRST (callbacks async)
            try:
                self.spark._jsparkSession.listenerManager().unregister(self)
            except Exception:
                pass

    # -- export ------------------------------------------------------
    def wait_for(
        self, labels: set[str], timeout_s: float = 20.0, count: int = 1
    ) -> bool:
        """Listener delivery is async (Spark's listener bus); block
        until every label has at least `count` buffered rows."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            with self._lock:
                per = {}
                for r in self._buffer:
                    if r["label"]:
                        per[r["label"]] = per.get(r["label"], 0) + 1
            if all(per.get(lb, 0) >= count for lb in labels):
                return True
            time.sleep(0.05)
        return False

    def flush(self) -> int:
        """Persist buffered rows to the parquet metrics table (via the
        shared `flush_rows` exporter). Returns rows written."""
        import pyarrow as pa

        with self._lock:
            rows, self._buffer = self._buffer, []
        return flush_rows(
            self.path,
            rows,
            pa.schema(
                [
                    ("ts", pa.timestamp("us", tz="UTC")),
                    ("func_name", pa.string()),
                    ("fingerprint", pa.int64()),
                    ("label", pa.string()),
                    ("plan", pa.string()),
                    ("wall_ms", pa.float64()),
                    ("out_rows", pa.int64()),
                    ("shuffle_bytes", pa.int64()),
                ]
            ),
        )
