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


def _decode_wav(payload: bytes) -> list[float]:
    """Real audio decode for RIFF/WAVE payloads — pure header + PCM
    parse, no codec library. Returns the 8-float feature contract:
    [channels, sample_rate_khz, bit_depth, duration_s, rms, peak,
    zero_crossing_rate, dc_offset]. Supports PCM (fmt 1: 8/16/32-bit)
    and IEEE-float (fmt 3: 32/64-bit); anything else raises
    NotImplementedError — the declared absent-codec branch."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid, size = payload[off : off + 4], struct.unpack_from("<I", payload, off + 4)[0]
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated fmt: stay in the declared
                raise NotImplementedError("WAV fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    # a data chunk truncated mid-sample (header-declared size past EOF)
    # must not escape as a raw numpy ValueError from frombuffer — trim
    # to whole samples; the features summarize whatever PCM survives
    if bits in (16, 32, 64):
        itemsize = bits // 8
        data = data[: len(data) - len(data) % itemsize]
    if audio_fmt == 1 and bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif audio_fmt == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
    if n_ch > 1:  # interleaved → mono mix for the summary features
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    n = len(x)
    duration_s = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.max(np.abs(x))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    dc = float(np.mean(x)) if n else 0.0
    return [float(n_ch), rate / 1000.0, float(bits), duration_s, rms, peak, zcr, dc]


def _decode_audio(payload: bytes, modality: str) -> list[float]:
    """Audio seam: real WAV parse when the payload IS a WAV (magic
    sniff), deterministic fake otherwise (compressed codecs absent in
    this container). The dispatch is the production shape — a
    torchaudio/ffmpeg decoder registers more magics, same contract."""
    import struct

    # Mirror the image seam's hardening: verify the RIFF size field
    # (bytes 4-8 == len-8) before committing to the real decoder — a
    # text payload that merely BEGINS with 'RIFF...WAVE' (12-byte magic
    # false-positive) would otherwise turn the fake path into a raise.
    if (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    ):
        return _decode_wav(payload)
    return _fake_decode(payload, modality)


def _decode_bmp(payload: bytes) -> list[float]:
    """Real image decode for uncompressed BMP payloads — pure header +
    pixel-array parse, no imaging library (the WAV counterpart for the
    image seam). Returns the 8-float feature contract: [width, height,
    bit_depth, aspect_ratio, mean_r, mean_g, mean_b, mean_luma] with
    channel means in [0, 1]. Supports BI_RGB 24/32-bit with a
    BITMAPINFOHEADER (positive or top-down negative height); anything
    else raises NotImplementedError — the declared absent-codec
    branch."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    px_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bits not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={compression}/{bits}-bit unsupported"
        )
    rows = abs(height)
    bypp = bits // 8
    stride = (width * bypp + 3) & ~3  # rows pad to 4-byte boundaries
    # header geometry must FIT the payload: an inflated height/width (or
    # a negative width) on a file whose size field passed the sniff
    # would escape as a raw numpy buffer error and kill the Spark task
    # outside the declared contract
    if width <= 0 or rows == 0 or px_off + rows * stride > len(payload):
        raise NotImplementedError("BMP geometry exceeds payload")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=rows * stride, offset=px_off
    ).reshape(rows, stride)
    px = raw[:, : width * bypp].reshape(rows, width, bypp).astype(np.float64)
    if height > 0:  # bottom-up storage → flip to top-down
        px = px[::-1]
    b, g, r = px[..., 0] / 255.0, px[..., 1] / 255.0, px[..., 2] / 255.0
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    return [
        float(width),
        float(rows),
        float(bits),
        float(width) / rows if rows else 0.0,
        float(r.mean()),
        float(g.mean()),
        float(b.mean()),
        float(luma.mean()),
    ]


def _decode_image(payload: bytes, modality: str) -> list[float]:
    """Image seam: real BMP parse when the payload IS a BMP (magic
    sniff), deterministic fake otherwise (JPEG/PNG codecs absent in
    this container). Same dispatch shape as the audio seam — a
    PIL/libvips decoder registers more magics, same contract. The
    sniff checks the header's file-size field against the payload
    length (BMP's 2-byte magic alone false-positives on 1/65536 of
    arbitrary binaries, which would turn the fake path into a raise)."""
    import struct

    if (
        len(payload) >= 54
        and payload[:2] == b"BM"
        and struct.unpack_from("<I", payload, 2)[0] == len(payload)
    ):
        return _decode_bmp(payload)
    return _fake_decode(payload, modality)


DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _fake_decode}


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
    timestamp (decode stubbed; the explode shape and schema are real).

    Videos with NULL or zero duration emit NOTHING (there is no frame
    to sample — the old clamp emitted a phantom frame_idx=0 for them);
    a short positive duration still samples its t=0 frame. The stub
    hash separates payload and index with ':' (audio_windows'
    convention) so distinct (payload, idx) inputs cannot collide —
    mirrored byte-for-byte in the mm04 oracle."""
    n_frames = (
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms
    ).cast("int")
    return (
        media_df.filter(F.col("modality") == "video")
        .filter(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) > 0)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
            F.sha2(
                F.concat(
                    F.col("payload"),
                    F.lit(":").cast("binary"),
                    F.col("frame_idx").cast("string").cast("binary"),
                ),
                256,
            ).alias("frame_stub_hash"),
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
