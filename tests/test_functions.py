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


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs with fewer than n tokens have zero n-grams — not a
    negative-slice runtime error that aborts the job."""
    from serverless_datalake_aws_spark.functions.text import word_ngrams

    df = spark.createDataFrame(
        [("hello",), ("a b",), ("a b c d",)], "text string"
    )
    rows = df.select(word_ngrams("text", 3).alias("g")).collect()
    assert [len(r["g"]) for r in rows] == [0, 0, 2]


def test_jaccard_empty_sets_zero_not_error(spark):
    from pyspark.sql import functions as F

    from serverless_datalake_aws_spark.functions.text import jaccard

    df = spark.createDataFrame([(1,)], "i int").select(
        jaccard(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("j")
    )
    assert df.first()["j"] == 0.0


def test_lsh_band_keys_null_minima_join_nothing(spark):
    """A too-short doc's null minhash minima must yield NULL band keys
    (concat null-propagation), not keys collapsed to the band index
    that make every junk doc a candidate of every other."""
    from pyspark.sql import functions as F

    from serverless_datalake_aws_spark.functions.text import lsh_band_keys

    from serverless_datalake_aws_spark.functions.text import MINHASH_K

    nulls = [F.lit(None).cast("long") for _ in range(MINHASH_K)]
    df = spark.range(1).select(lsh_band_keys(nulls).alias("k"))
    got = df.select(F.size(F.filter("k", lambda x: x.isNotNull())).alias("n")).first()
    assert got["n"] == 0  # every band key NULL


def test_brute_scores_zero_vector_not_nan(spark):
    from serverless_datalake_aws_spark.functions import vector as VX

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r["neighbor_id"]: r["cos_sim"]
        for r in VX.brute_scores(df, [(9, [1.0, 0.0])]).collect()
    }
    assert got[0] == 0.0 and abs(got[1] - 1.0) < 1e-9


def test_dynamodb_single_binary_decoded(spark):
    from serverless_datalake_aws_spark.functions.semistructured import (
        decode_dynamodb_value,
    )

    assert decode_dynamodb_value({"B": "aGVsbG8="}) == "hello"
    assert decode_dynamodb_value({"BS": ["aGVsbG8="]}) == ["hello"]
