"""Pull-based API ingestion as a Spark Python DataSource (S12 upgraded).

The reference ingests by PUSH: API Gateway invokes a Lambda per request
and the handler writes one S3 object (ingest-data-lambda.py:30-62,
terraform-...-main.tf API resources). At 100 TB that inverts: the
engine PULLS a paginated endpoint with one `InputPartition` per page,
so a 1000-executor cluster drains 1000 pages concurrently, and the
same cursor becomes a Structured Streaming source whose offsets are
page ranges — replayable micro-batches, exactly-once through the
checkpointed offset log (Spark 4 Python DataSource API:
`pyspark.sql.datasource`).

The HTTP fetch itself is a pluggable seam: `fetch_page` is module-level
and a real deployment overrides it with an HTTP client. This container
has no network, so the default is a DETERMINISTIC SYNTHETIC ENDPOINT
(documented fake — integer-exact so a SQL oracle can reproduce it
bit-for-bit); everything Spark-side — partition planning, offset
management, Arrow batching, schema — is real and tested.

Page `p` with `rows_per_page` r yields rows rid = p*r .. p*r+r-1:
    id          rid
    name        'rec_' || rid
    event_type  ('view','click','purchase','refund')[rid % 4]
    value       ((rid * 2654435761) % 100000) / 100.0
    page        p
(2654435761 is Knuth's multiplicative-hash constant; all arithmetic is
BIGINT-exact in both Spark and DuckDB.)
"""

from __future__ import annotations

import sys
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

try:  # reader closures are pickled to workers whose cwd ≠ repo root
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

API_SCHEMA = "id bigint, name string, event_type string, value double, page int"

_EVENT_TYPES = ("view", "click", "purchase", "refund")


def fetch_page(page: int, rows_per_page: int) -> list[tuple]:
    """One page of the endpoint. Deterministic synthetic default —
    override this module attribute with a real HTTP client in
    production (runs ON THE EXECUTOR, one call per InputPartition)."""
    base = page * rows_per_page
    return [
        (
            rid,
            f"rec_{rid}",
            _EVENT_TYPES[rid % 4],
            ((rid * 2654435761) % 100000) / 100.0,
            page,
        )
        for rid in range(base, base + rows_per_page)
    ]


def _opts(options) -> tuple[int, int]:
    return (
        int(options.get("pages", 8)),
        int(options.get("rows_per_page", options.get("rowsperpage", 50))),
    )


class ApiBatchReader(DataSourceReader):
    """Batch scan: one partition per page — the fetch fan-out IS the
    Spark parallelism, no driver-side download loop."""

    def __init__(self, options):
        self.pages, self.rows_per_page = _opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from fetch_page(partition.value, self.rows_per_page)


class ApiStreamReader(DataSourceStreamReader):
    """Micro-batch source over the same cursor: offsets are page
    numbers, each trigger ingests up to `pages_per_batch` new pages
    (one InputPartition each), and a retried batch re-reads the SAME
    page range — deterministic replay, so the checkpointed offset log
    gives exactly-once ingestion into an idempotent sink."""

    def __init__(self, options):
        self.max_pages, self.rows_per_page = _opts(options)
        self.pages_per_batch = int(
            options.get("pages_per_batch", options.get("pagesperbatch", 2))
        )
        self._last = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        # availableNow planning calls this repeatedly; advance the
        # cursor by pages_per_batch per call up to the endpoint's end
        # (a live API would report its current last page here).
        self._last = min(self._last + self.pages_per_batch, self.max_pages)
        return {"page": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # RESTART SAFETY: `self._last` is driver-local and a restarted
        # query builds a FRESH reader (cursor 0) while Spark recovers
        # `start`/`end` from the checkpointed offset log. Fold the
        # recovered offsets back into the cursor so the next
        # latestOffset() can never regress behind what the log already
        # committed — a regressed end offset would re-plan (and
        # re-ingest) pages the sink already has.
        self._last = max(self._last, start["page"], end["page"])
        return [InputPartition(p) for p in range(start["page"], end["page"])]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from fetch_page(partition.value, self.rows_per_page)

    def commit(self, end: dict) -> None:
        # pages are immutable, nothing to ack — but keep the cursor
        # monotone vs committed progress (second restart-safety net;
        # see partitions()).
        self._last = max(self._last, end["page"])


class ApiDataSource(DataSource):
    """`spark.read.format("datalake_api")` / `spark.readStream.…` —
    register once per session via `register_api_source(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "datalake_api"

    def schema(self) -> str:
        return API_SCHEMA

    def reader(self, schema) -> ApiBatchReader:
        return ApiBatchReader(self.options)

    def streamReader(self, schema) -> ApiStreamReader:
        return ApiStreamReader(self.options)


def register_api_source(spark) -> None:
    """Idempotent per-session registration (re-registering the same
    name is an overwrite, which Spark allows)."""
    spark.dataSource.register(ApiDataSource)
