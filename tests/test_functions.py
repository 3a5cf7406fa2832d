"""Unit tests for the non-SQL surface (SURVEY §5.2 #3): DynamoDB-typed
JSON decode (T17), multimodal plumbing, text/vector function edges."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_datalake_aws_spark.functions.semistructured import (
    decode_dynamodb_item,
    decode_dynamodb_value,
    from_dynamodb_json,
)
from serverless_datalake_aws_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    frame_sample,
)


class TestDynamoDBDecode:
    def test_scalars(self):
        assert decode_dynamodb_value({"S": "hi"}) == "hi"
        assert decode_dynamodb_value({"N": "42"}) == 42
        assert decode_dynamodb_value({"N": "4.5"}) == 4.5
        assert decode_dynamodb_value({"BOOL": True}) is True
        assert decode_dynamodb_value({"NULL": True}) is None

    def test_nested_list_map(self):
        v = {"L": [{"S": "a"}, {"N": "1"}, {"M": {"x": {"BOOL": False}}}]}
        assert decode_dynamodb_value(v) == ["a", 1, {"x": False}]

    def test_sets_dedup_sorted(self):
        assert decode_dynamodb_value({"SS": ["b", "a", "b"]}) == ["a", "b"]
        assert decode_dynamodb_value({"NS": ["2", "1", "2"]}) == [1.0, 2.0]
        # BS: base64 of b"hi" and b"yo"
        assert decode_dynamodb_value({"BS": ["aGk=", "eW8=", "aGk="]}) == ["hi", "yo"]

    def test_item_roundtrip(self):
        item = json.dumps(
            {
                "id": {"S": "r1"},
                "size": {"N": "128"},
                "tags": {"SS": ["b", "a"]},
                "nested": {"M": {"deep": {"L": [{"N": "1"}, {"NULL": True}]}}},
            }
        )
        plain = json.loads(decode_dynamodb_item(item))
        assert plain == {
            "id": "r1",
            "size": 128,
            "tags": ["a", "b"],
            "nested": {"deep": [1, None]},
        }

    def test_spark_column_pipeline(self, spark):
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("size", T.LongType()),
                T.StructField("tags", T.ArrayType(T.StringType())),
            ]
        )
        typed = json.dumps(
            {"id": {"S": "r1"}, "size": {"N": "7"}, "tags": {"SS": ["y", "x"]}}
        )
        df = spark.createDataFrame([(typed,)], "raw string").select(
            from_dynamodb_json("raw", schema).alias("rec")
        )
        row = df.select("rec.id", "rec.size", "rec.tags").first()
        assert (row["id"], row["size"], row["tags"]) == ("r1", 7, ["x", "y"])


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark):
        rows = [
            ("m1", "image", "image/png", b"\x89PNG....", (640, 480, None, None)),
            ("m2", "audio", "audio/wav", b"RIFF....", (None, None, 4000, 16000)),
            ("m3", "video", "video/mp4", b"\x00mp42", (1920, 1080, 3000, None)),
        ]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_extract_features_schema_and_determinism(self, media):
        out = extract_features(media)
        assert dict(out.dtypes)["feature"] == "array<float>"
        rows = {r["media_id"]: r for r in out.collect()}
        assert rows["m1"]["payload_bytes"] == len(b"\x89PNG....")
        assert len(rows["m1"]["feature"]) == 8
        # deterministic fake decode: same payload → same features
        again = {r["media_id"]: r for r in extract_features(media).collect()}
        assert rows["m2"]["feature"] == again["m2"]["feature"]
        assert rows["m1"]["content_hash"] != rows["m2"]["content_hash"]

    def test_unknown_modality_raises(self):
        with pytest.raises(NotImplementedError, match="no decoder"):
            decode_stub(b"x", "hologram")

    def test_frame_sample_explodes_video_only(self, media):
        frames = frame_sample(media, every_ms=1000)
        rows = frames.collect()
        assert {r["media_id"] for r in rows} == {"m3"}
        assert [r["frame_ts_ms"] for r in rows] == [0, 1000, 2000]
