"""Catalog helpers over the driver-materialized test tables.

Replaces the reference's Glue crawler (`terraform-…-main.tf:203-214`,
12-hour cron schema inference): Parquet is self-describing, so
registration is immediate and schema staleness is impossible. At lake
scale, `saveAsTable` + `ANALYZE TABLE` would persist these into a
metastore; temp views are enough for the test harness.
"""

from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Per-session scan cache: (sf_dir, name) -> (dir-mtime, DataFrame). The
# fixture dirs are immutable, so re-running spark.read.parquet per query
# call only repeats the file listing + footer schema read (~0.2 s of
# every bench number at sf0.1). A metastore-backed catalog amortizes
# exactly this via its shared file index; temp-view harnesses get it
# here. Keyed weakly on the session so a stopped/recreated session never
# serves stale plans; the stored mtime is compared on every hit so an
# in-session fixture regeneration (testdata rebuild) REPLACES the entry
# — the stale plan is evicted, not retained beside its successor
# (ADVICE r10 + r11 review). `clear_scan_cache()` is the explicit
# escape hatch for exotic rewrites that preserve mtime.
from weakref import WeakKeyDictionary

_SCAN_CACHE: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], tuple[int, DataFrame]]]" = (
    WeakKeyDictionary()
)


def clear_scan_cache(spark: SparkSession | None = None) -> None:
    """Drop cached table scans — for one session, or all of them."""
    if spark is None:
        _SCAN_CACHE.clear()
    else:
        _SCAN_CACHE.pop(spark, None)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table (reference S4 parquet scan, SURVEY §2.1).

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos and truncate to microsecond
    timestamps — the same truncation DuckDB applies (its TIMESTAMP is
    µs), so oracle comparisons line up.

    SIDE EFFECT (intentional, session-wide): pins
    spark.sql.session.timeZone=UTC and, for events,
    spark.sql.legacy.parquet.nanosAsLong=true on the *caller's*
    session and leaves them set. The driver's harness session doesn't
    come from our factory (session.py sets both up front), and the
    configs must still hold when the returned lazy DataFrame actually
    executes — restoring them eagerly would break that execution.
    Sessions from `session.get_session` already carry both, making
    this a no-op there.
    """
    # conf must be pinned even on a scan-cache hit: it is read at
    # execution time, and a later caller may execute the lazy plan
    pin_parquet_confs(spark, events=(name == "events"))
    cache = _SCAN_CACHE.setdefault(spark, {})
    # mtime compared on every hit: regeneration rewrites the dataset
    # path, so a stale entry is replaced in place (one stat per call —
    # noise next to the file listing the hit saves)
    try:
        mtime = os.stat(f"{sf_dir}/{name}.parquet").st_mtime_ns
    except OSError:
        mtime = -1
    key = (sf_dir, name)
    hit = cache.get(key)
    if hit is None or hit[0] != mtime:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_events_ts(df)
        cache[key] = (mtime, df)
        return df
    return hit[1]


def pin_parquet_confs(spark: SparkSession, events: bool = False) -> None:
    """The session confs every fixture read depends on, shared by the
    batch path (`table`) and the streaming path
    (`plans.streaming_queries._events_stream`) so the two can't drift:

    - session.timeZone=UTC — the driver runs a plain session, and
      window/session timestamps would otherwise image in the JVM zone
      while the DuckDB oracle collates naive-UTC.
    - inferTimestampNTZ=false — Spark ≥4.x infers tz-less parquet
      TIMESTAMP(MICROS) as TIMESTAMP_NTZ by default, which rejects
      unix_micros() and diverges from DuckDB.
    - nanosAsLong=true (events only) — TIMESTAMP(NANOS) is rejected by
      the vectorized reader outright.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if events:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (reads as
    int64 nanos under nanosAsLong) and TIMESTAMP(MICROS) (reads as
    TimestampType) across driver rounds — sniff the read schema instead
    of hardcoding either physical type, and truncate nanos to the
    microsecond timestamps DuckDB's TIMESTAMP carries. A hardcoded
    int64 branch would silently mis-scale µs data by 1000×."""
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every test table as a temp view for `spark.sql` queries
    (reference S9 Glue-cataloged table scan)."""
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def save_table(
    spark: SparkSession,
    df: "DataFrame",
    name: str,
    analyze: bool = True,
    bucket_by: tuple[int, str] | None = None,
) -> None:
    """Persist a DataFrame as a managed catalog table with statistics —
    the engine's replacement for the Glue crawler (schema registered at
    write time, zero staleness vs the reference's 12-hour cron,
    terraform main.tf:203-214). `analyze` computes table + column stats
    so Catalyst's CBO can order joins; `bucket_by=(n, col)` co-locates
    future equi-joins on `col` without a shuffle (SCALE.md fact-fact
    join note)."""
    writer = df.write.mode("overwrite").format("parquet")
    if bucket_by is not None:
        n, col = bucket_by
        writer = writer.bucketBy(n, col).sortBy(col)
    writer.saveAsTable(name)
    if analyze:
        cols = ", ".join(f"`{c}`" for c in df.columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")


@dataclass(frozen=True)
class CrawledDataset:
    """One dataset discovered by `crawl`."""

    name: str
    path: str
    fmt: str
    n_files: int
    size_bytes: int


def _data_files(p: Path) -> list[Path]:
    return [
        f
        for f in sorted(p.rglob("*"))
        if f.is_file() and not f.name.startswith(("_", "."))
    ]


def _safe_name(parts: tuple[str, ...]) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", "_".join(parts)).strip("_").lower()


def _dataset_dirs(root: Path, prefix: tuple[str, ...] = ()):
    """Yield (name_parts, path) for every leaf dataset under `root`.

    A directory is a DATASET when it directly contains data files or
    when its subdirectories are hive partition dirs (`key=value`) — the
    same leaf-table heuristic the Glue crawler applies. Any other
    directory is a NAMESPACE (zone / dataset grouping) and is recursed
    into, with its name joined into the registered table name. Loose
    files directly under a namespace each become a one-file dataset.
    """
    from .sources.readers import _FORMATS, _effective_suffix

    for child in sorted(root.iterdir()):
        if child.name.startswith(("_", ".")):
            continue
        if child.is_file():
            yield prefix + (child.stem,), child
            continue
        # a directory is a leaf DATASET only when it directly holds
        # SUPPORTED data files — counting any stray file (readme.md)
        # would collapse a whole namespace of nested datasets into one
        # merged union view
        direct_files = any(
            f.is_file()
            and not f.name.startswith(("_", "."))
            and _FORMATS.get(_effective_suffix(f)) is not None
            for f in child.iterdir()
        )
        subdirs = [
            d
            for d in child.iterdir()
            if d.is_dir() and not d.name.startswith(("_", "."))
        ]
        partitioned = bool(subdirs) and all("=" in d.name for d in subdirs)
        if direct_files or partitioned:
            yield prefix + (child.name,), child
        else:
            yield from _dataset_dirs(child, prefix + (child.name,))


def crawl(
    spark: SparkSession,
    lake_root: str | Path,
    register: bool = True,
    table_prefix: str = "",
) -> list[CrawledDataset]:
    """Discover and register datasets dropped into the lake by EXTERNAL
    writers — the repo's parity for the reference's Glue crawler
    (terraform-Infrastructure-provisioning/aws-data-lake-terraform-main.tf:203-214,
    a 12-hour cron doing S3 walk + schema inference; SURVEY S9).

    `save_table` covers the engine's own writes (registered at write
    time, zero staleness); `crawl` covers the foreign-writer gap: walk
    the zone tree, dispatch format per file extension
    (sources.readers.detect_format's table), infer schema, and register
    each leaf dataset as a queryable view named after its relative path
    (`raw/clicks` → `raw_clicks`). Hive `key=value` layouts register as
    one partitioned dataset; mixed-format dirs register one view per
    format (`<name>_<fmt>`); unknown extensions skip with a warning
    (reference lambda-function.py:100-101 semantics). Registration is a
    metadata operation — no data is copied or rewritten, and re-crawls
    are idempotent (`createOrReplaceTempView`).

    Scale notes: the directory walk is driver-side metadata only (at
    S3 scale, a LIST per prefix — the same cost Glue pays); schema
    inference reads file footers for parquet/orc and samples one pass
    for csv/json. The returned report carries file counts and bytes so
    a scheduler can prioritize ANALYZE/compaction on the big ones.
    """
    from .sources.readers import read_any

    root = Path(str(lake_root))
    if not root.is_dir():
        raise ValueError(f"lake root does not exist: {root}")
    out: list[CrawledDataset] = []
    from .sources.readers import _FORMATS, _effective_suffix

    used_names: set[str] = set()
    for parts, path in _dataset_dirs(root):
        files = [path] if path.is_file() else _data_files(path)
        by_fmt: dict[str, list[Path]] = {}
        for f in files:
            # compression-aware dispatch (events.ndjson.gz -> ndjson) —
            # the readers support these, so the crawler must see them
            kind = _FORMATS.get(_effective_suffix(f))
            if kind is not None:
                by_fmt.setdefault(kind, []).append(f)
        if not by_fmt:
            log.warning("crawl: no supported data files, skipping: %s", path)
            continue
        for fmt, fmt_files in sorted(by_fmt.items()):
            name = _safe_name(parts)
            if len(by_fmt) > 1:
                name = f"{name}_{fmt}"
                log.warning(
                    "crawl: mixed formats under %s — registering %s", path, name
                )
            if table_prefix:
                name = f"{table_prefix}{name}"
            if name in used_names:
                # two datasets normalizing to one view name (clicks.csv
                # vs clicks.json as loose files, or 'a-b' vs 'a_b'):
                # replacing silently would drop the first from the
                # catalog — disambiguate deterministically instead
                base, i = name, 2
                while name in used_names:
                    name = f"{base}_{i}"
                    i += 1
                log.warning(
                    "crawl: view-name collision — registering %s", name
                )
            used_names.add(name)
            ds = CrawledDataset(
                name=name,
                path=str(path),
                fmt=fmt,
                n_files=len(fmt_files),
                size_bytes=sum(f.stat().st_size for f in fmt_files),
            )
            out.append(ds)
            if register:
                # single-format dataset dir: read the dir (partition
                # discovery); mixed dir, loose file, or a dir with
                # non-partition subdirs (Spark won't recurse into those
                # by default): read the explicit file list
                plain_dir = len(by_fmt) == 1 and (
                    path.is_file()
                    or all(
                        "=" in d.name
                        for d in path.iterdir()
                        if d.is_dir() and not d.name.startswith(("_", "."))
                    )
                )
                src = str(path) if plain_dir else [str(f) for f in fmt_files]
                if isinstance(src, list) and fmt in ("parquet", "orc"):
                    # explicit leaf-file reads drop hive partition
                    # columns unless basePath anchors the layout —
                    # a mixed dir must not silently lose them
                    reader = spark.read.option("basePath", str(path)).option(
                        "mergeSchema", True
                    )
                    df = (
                        reader.parquet(*src)
                        if fmt == "parquet"
                        else reader.orc(*src)
                    )
                elif isinstance(src, list):
                    # merge_schema: foreign writers drift schemas;
                    # a one-footer read silently drops newer columns
                    dfs = [
                        read_any(spark, s, fmt=fmt, merge_schema=True)
                        for s in src
                    ]
                    df = dfs[0]
                    for other in dfs[1:]:
                        df = df.unionByName(other, allowMissingColumns=True)
                else:
                    df = read_any(spark, src, fmt=fmt, merge_schema=True)
                df.createOrReplaceTempView(ds.name)
    return out
