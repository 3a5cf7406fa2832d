"""Semi-structured decode (SURVEY.md §2.4 T14/T17).

T17 is the reference's DynamoDB-typed-JSON decoder
(`index-data-lambda.py:413-441`): recursive S/N/BOOL/NULL/L/M/SS/NS/BS
unwrapping. The type tags encode arbitrary nesting, so a static
`from_json` schema can't express it; this is a legitimate Pandas-UDF
case (Arrow-batched, off the relational hot path — decode once at
ingest, store plain).

DynamoDB sets (SS/NS/BS) become deduplicated arrays — Spark has no set
type (SURVEY §7.3); BS values are base64 strings in the typed JSON and
are decoded to their raw bytes' utf-8 form where valid.
"""

from __future__ import annotations

import base64
import json
import sys
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's Python workers don't share the driver's sys.path; without this,
# a pandas UDF defined here dies with ModuleNotFoundError whenever the
# session owner launched from a cwd outside the repo. Pickling this
# module by value makes the UDF closure self-contained.
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older cloudpickle
    pass


def decode_dynamodb_value(v: dict[str, Any]) -> Any:
    """Decode one DynamoDB-typed value {tag: payload} → plain Python.

    Mirrors the semantics of the reference's parse_dynamodb_value
    (index-data-lambda.py:420-441) from its public DynamoDB wire
    format: S→str, N→float, BOOL→bool, NULL→None, L→list, M→dict,
    SS/NS→sorted deduped list, BS→base64-decoded strings.
    """
    if not isinstance(v, dict) or len(v) != 1:
        return v
    tag, payload = next(iter(v.items()))
    if tag == "S":
        return payload
    if tag == "N":
        f = float(payload)
        return int(f) if f.is_integer() else f
    if tag == "BOOL":
        return bool(payload)
    if tag == "NULL":
        return None
    if tag == "L":
        return [decode_dynamodb_value(x) for x in payload]
    if tag == "M":
        return {k: decode_dynamodb_value(x) for k, x in payload.items()}
    if tag == "SS":
        return sorted(set(payload))
    if tag == "NS":
        return sorted({float(x) for x in payload})
    if tag == "B":
        # single binary — decoded like its set form (BS), not leaked
        # through as raw base64 text
        return base64.b64decode(payload).decode("utf-8", "replace")
    if tag == "BS":
        return sorted({base64.b64decode(x).decode("utf-8", "replace") for x in payload})
    return payload


def decode_dynamodb_item(item_json: str | None) -> str | None:
    """Typed-JSON item string → plain-JSON string (sorted keys for
    deterministic output)."""
    if item_json is None:
        return None
    item = json.loads(item_json)
    plain = {k: decode_dynamodb_value(v) for k, v in item.items()}
    return json.dumps(plain, sort_keys=True)


@F.pandas_udf(T.StringType())
def dynamodb_to_json(items: pd.Series) -> pd.Series:
    """Vectorized column decoder: DynamoDB-typed JSON → plain JSON.
    Downstream, `from_json` with the dataset's schema turns the plain
    JSON into typed columns."""
    return items.map(decode_dynamodb_item)


def from_dynamodb_json(col: Column | str, schema: T.StructType) -> Column:
    """Full T17 pipeline: typed JSON → plain JSON → struct column."""
    return F.from_json(dynamodb_to_json(F.col(col) if isinstance(col, str) else col), schema)
