"""Binary-column queries (SURVEY §2.11 multimodal plumbing, §1.2
BinaryType row). The codec layer is stubbed (operators/multimodal.py);
the *relational* binary surface — byte lengths, content digests, binary
slicing/grouping — is exact and oracle-verified here, with payloads
synthesized from document text so the same bytes exist in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query


@query(
    "mm01_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS content_sha256,
           substr(md5(text), 1, 8) AS shard_key
    FROM documents
    WHERE octet_length(encode(text)) > 200
    """,
)
def mm01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata extraction: byte size, content digest,
    digest-prefix shard key (the multimodal partition-by-content-hash
    pattern from SCALE.md). Payload = utf-8 bytes of the text column so
    both engines hash identical bytes."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return (
        docs.select(
            "doc_id",
            F.octet_length(payload).cast("long").alias("payload_bytes"),
            F.sha2(payload, 256).alias("content_sha256"),
            F.substring(F.md5(payload), 1, 8).alias("shard_key"),
        )
        .filter(F.col("payload_bytes") > 200)
    )


@query(
    "mm02_shard_distribution",
    oracle="""
    SELECT substr(md5(text), 1, 1) AS shard,
           count(*) AS n_payloads,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS shard_bytes
    FROM documents
    GROUP BY 1
    """,
)
def mm02_shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash sharding profile: 16 hex shards, row + byte counts —
    the even-task-sizing check for binary corpora (payload skew shows up
    here before it shows up as a straggler task)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.substring(F.md5("text"), 1, 1).alias("shard"))
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum(F.octet_length(F.encode("text", "UTF-8"))).alias("shard_bytes"),
        )
    )


@query(
    "mm03_feature_extract",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS content_hash,
           array_to_string(list_transform(generate_series(1, 8),
             i -> CAST(CAST('0x' || substr(sha256(text), 2*i - 1, 2) AS INT)
                       AS VARCHAR)), ',') AS feature_bytes
    FROM documents
    """,
)
def mm03_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode path as a first-class query: documents
    bytes become opaque media payloads (modality round-robined by id),
    run through operators/multimodal.extract_features — the REAL
    mapInPandas Arrow-batch plumbing with the stubbed codec — and the
    8-dim stub feature (sha256-derived, so DuckDB reproduces it from
    hex) is re-quantized to bytes for exact cross-engine comparison.

    Scale: payloads stream through executors as Arrow record batches
    (no driver hop, no collect); swapping _fake_decode for PIL/ffmpeg
    changes zero plan shape. Feature arrays serialize as joined strings
    per the repo's array-hash convention."""
    from serverless_datalake_aws_spark.operators.multimodal import extract_features

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(media)
    byte_of = lambda x: F.round(x * 255).cast("int").cast("string")  # noqa: E731
    return feats.select(
        "media_id",
        "modality",
        "payload_bytes",
        "content_hash",
        F.concat_ws(",", F.transform("feature", byte_of)).alias("feature_bytes"),
    )


@query(
    "mm04_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, text,
             CAST(n_chars * 10 AS BIGINT) AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, i AS frame_idx,
           i * 1000 AS frame_ts_ms,
           -- ':' separator mirrors the operator's stub-hash convention
           sha256(text || ':' || CAST(i AS VARCHAR)) AS frame_stub_hash
    FROM (
      SELECT media_id, text,
             unnest(generate_series(0,
                 greatest(CAST(floor(duration_ms / 1000.0) AS INT) - 1, 0))) AS i
      FROM vids
      WHERE duration_ms > 0  -- zero/NULL duration samples no frame
    )
    """,
)
def mm04_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.frame_sample)
    as an oracle-verified query: one output row per sampled timestamp,
    duration synthesized from n_chars (10 ms/char) so both engines see
    identical inputs, frame hash = sha256(payload || frame index) so the
    stubbed decode is byte-reproducible in SQL. The explode shape, row
    multiplication factor, and schema are exactly what a real ffmpeg
    frame extractor drops into — decode swaps in at the hash site.

    Scale: sequence+explode multiplies rows executor-side (no driver
    involvement); output partitioning inherits the input, so a
    downstream per-frame featurizer (mm03's mapInPandas) chains without
    a shuffle."""
    from serverless_datalake_aws_spark.operators.multimodal import frame_sample

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return frame_sample(media, every_ms=1000).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        "frame_stub_hash",
    )


@query(
    "mm05_audio_chunk_windows",
    oracle="""
    WITH aud AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, text,
             CAST(n_chars * 10 AS BIGINT) AS duration_ms
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           i AS win_idx,
           i * 1000 AS start_ms,
           i * 1000 + 2000 AS end_ms,
           CAST(i * 1000 * 16 AS BIGINT) AS start_sample,
           sha256(text || ':' || CAST(i AS VARCHAR)) AS chunk_stub_hash
    FROM (
      SELECT media_id, text,
             unnest(generate_series(0,
                 CAST(floor((duration_ms - 2000) / 1000.0) AS BIGINT))) AS i
      FROM aud WHERE duration_ms >= 2000
    )
    """,
)
def mm05_audio_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio sliding-window chunking (operators/multimodal.audio_windows)
    as an oracle-verified query: 2 s windows every 1 s over durations
    synthesized from n_chars (10 ms/char), 16 kHz sample offsets, chunk
    hash = sha256(payload || ':' || idx) as the decode seam — the mm04
    pattern for the audio modality (full windows only; sub-window clips
    emit no rows).

    Scale: identical to mm04 — executor-side row multiplication, no
    shuffle, chains into mm03's mapInPandas featurizer partition-local."""
    from serverless_datalake_aws_spark.operators.multimodal import audio_windows

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )
    return audio_windows(media, window_ms=2000, hop_ms=1000).select(
        "media_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.col("start_ms").cast("long").alias("start_ms"),
        F.col("end_ms").cast("long").alias("end_ms"),
        "start_sample",
        "chunk_stub_hash",
    )
