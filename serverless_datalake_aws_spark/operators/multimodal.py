"""Multimodal binary-column plumbing (SURVEY.md §2.11).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, partitioning, Arrow
batch shape, mapInPandas signatures — is real and tested; the actual
codec step is stubbed behind DECODERS (the image/audio libraries are
not in this container) with a deterministic fake so pipelines are
testable end-to-end.

Scale: payloads ride in Arrow record batches; `mapInPandas` processes
per-partition batch iterators so a 100 TB corpus streams through
executors without driver involvement. Partition by modality then by
content-hash prefix for even task sizing.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Self-contained UDF closures: workers can't import this package unless
# the driver cwd happens to be the repo root (see functions/semistructured).
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, modality string, payload_bytes long, "
    "content_hash string, feature array<float>"
)


def _fake_decode(payload: bytes, modality: str) -> list[float]:
    """Deterministic stand-in for a real codec: 8 floats derived from
    the payload digest. Replace with PIL/torchaudio/ffmpeg decoders in
    an environment that ships them."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def decode_stub(payload: bytes, modality: str) -> list[float]:
    """The real-decoder seam. Raises for unknown modalities, mirroring
    where `NotImplementedError` lands when a codec is absent."""
    decoder = DECODERS.get(modality)
    if decoder is None:
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    return decoder(payload, modality)


def extract_features(media_df: DataFrame) -> DataFrame:
    """payload → (size, content-hash, feature vector) via mapInPandas.

    The Arrow batch iterator shape is the production contract: each
    pdf is a columnar batch, payloads stay as bytes end-to-end, output
    schema is declared up front.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "content_hash": pdf["payload"].map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [
                        decode_stub(bytes(p or b""), m)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )

    return media_df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    timestamp (decode stubbed; the explode shape and schema are real)."""
    n_frames = (
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms
    ).cast("int")
    return (
        media_df.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
            F.sha2(F.concat(F.col("payload"), F.col("frame_idx").cast("string").cast("binary")), 256).alias(
                "frame_stub_hash"
            ),
        )
    )


def audio_windows(
    media_df: DataFrame, window_ms: int = 2000, hop_ms: int = 1000
) -> DataFrame:
    """Sliding-window chunking for audio: one row per full window of
    `window_ms` every `hop_ms` (speech-pipeline frame/hop shape at
    pipeline granularity). Decode is stubbed — the window arithmetic,
    sample offsets, and row-multiplication shape are the production
    contract a torchaudio/ffmpeg chunker drops into.

    Rows with duration < window_ms emit nothing (full windows only).
    Shuffle-free: sequence+explode multiplies rows executor-side."""
    # explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark's
    # truncates — floor() first makes both engines agree on fractional
    # trailing windows
    n_win = (
        F.floor(
            (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - window_ms)
            / hop_ms
        ).cast("long")
        + 1
    )
    sr = F.coalesce(F.col("meta.sample_rate"), F.lit(0))
    return (
        media_df.filter(F.col("modality") == "audio")
        .filter(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) >= window_ms)
        .withColumn("win_idx", F.explode(F.sequence(F.lit(0), n_win - 1)))
        .select(
            "media_id",
            "win_idx",
            (F.col("win_idx") * hop_ms).alias("start_ms"),
            (F.col("win_idx") * hop_ms + window_ms).alias("end_ms"),
            (F.col("win_idx") * hop_ms * sr / 1000).cast("long").alias(
                "start_sample"
            ),
            F.sha2(
                F.concat(
                    F.col("payload"),
                    F.lit(":").cast("binary"),
                    F.col("win_idx").cast("string").cast("binary"),
                ),
                256,
            ).alias("chunk_stub_hash"),
        )
    )
