"""The multimodal audio seam with a REAL codec: generated WAV fixtures
decoded through the same mapInPandas plumbing mm03 oracle-verifies with
the stub — proving the seam contract carries an actual decoder
(VERDICT r2 task 6)."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from serverless_datalake_aws_spark.operators.multimodal import (
    _decode_wav,
    decode_stub,
    extract_features,
)


def make_wav(
    freq_hz: float = 440.0,
    rate: int = 16000,
    seconds: float = 0.5,
    amp: float = 0.5,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = amp * math.sin(2 * math.pi * freq_hz * i / rate)
            for _ in range(channels):
                if bits == 16:
                    frames += struct.pack("<h", int(v * 32767))
                else:
                    frames += struct.pack("<B", int(v * 127) + 128)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_wav_header_and_signal_features():
    wav = make_wav(freq_hz=440.0, rate=16000, seconds=0.5, amp=0.5)
    ch, rate_khz, bits, dur, rms, peak, zcr, dc = _decode_wav(wav)
    assert (ch, rate_khz, bits) == (1.0, 16.0, 16.0)
    assert dur == pytest.approx(0.5, abs=1e-6)
    # sine RMS = amp/sqrt(2); peak = amp; zcr = 2*freq/rate; dc ~ 0
    assert rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert peak == pytest.approx(0.5, rel=1e-3)
    assert zcr == pytest.approx(2 * 440 / 16000, rel=0.02)
    assert abs(dc) < 1e-3


def test_wav_stereo_and_8bit():
    stereo = _decode_wav(make_wav(channels=2, bits=16))
    assert stereo[0] == 2.0
    eight = _decode_wav(make_wav(bits=8, amp=0.4))
    assert eight[2] == 8.0
    assert eight[4] == pytest.approx(0.4 / math.sqrt(2), rel=0.05)


def test_audio_seam_dispatches_wav_vs_fake():
    wav = make_wav()
    real = decode_stub(wav, "audio")
    assert real[0] == 1.0 and real[1] == 16.0  # header-derived, not hash noise
    fake = decode_stub(b"not-a-wav-payload", "audio")
    assert all(0.0 <= v <= 1.0 for v in fake) and len(fake) == 8
    assert real != fake


def test_non_pcm_wav_raises_not_implemented():
    wav = bytearray(make_wav())
    # fmt chunk starts at offset 12+8; patch audio format to 0x55 (MP3)
    assert wav[12:16] == b"fmt "
    struct.pack_into("<H", wav, 20, 0x55)
    with pytest.raises(NotImplementedError, match="unsupported"):
        _decode_wav(bytes(wav))


def test_wav_through_mapinpandas_plumbing(spark):
    """The end-to-end contract: WAV payloads ride Arrow batches through
    extract_features and come out with header-true features."""
    wav_a = make_wav(rate=16000, seconds=0.25)
    wav_b = make_wav(rate=8000, seconds=1.0, channels=2)
    df = spark.createDataFrame(
        [("a", "audio", wav_a), ("b", "audio", wav_b), ("c", "audio", b"opaque")],
        "media_id string, modality string, payload binary",
    )
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out["a"]["feature"][1] == pytest.approx(16.0)
    assert out["a"]["feature"][3] == pytest.approx(0.25, abs=1e-6)
    assert out["b"]["feature"][0] == 2.0
    assert out["b"]["feature"][1] == pytest.approx(8.0)
    assert out["b"]["feature"][3] == pytest.approx(1.0, abs=1e-6)
    assert out["c"]["payload_bytes"] == 6  # fake path still flows
    assert out["a"]["payload_bytes"] == len(wav_a)


def test_truncated_wav_stays_in_contract():
    """Corrupt inputs must fail as NotImplementedError or decode what
    survives — never escape as raw numpy/struct errors that kill the
    Spark stage outside the declared contract."""
    wav = make_wav(seconds=0.1)
    # truncate mid-sample: odd PCM byte count
    truncated = wav[: len(wav) - 1]
    feats = _decode_wav(truncated)  # trims to whole samples
    assert len(feats) == 8 and feats[2] == 16.0
    # fmt chunk shorter than 16 bytes
    import struct as _s

    bad = bytearray(b"RIFF" + _s.pack("<I", 24) + b"WAVEfmt " + _s.pack("<I", 4) + b"\x01\x00\x01\x00")
    with pytest.raises(NotImplementedError):
        _decode_wav(bytes(bad))


def test_audio_seam_riff_magic_false_positive_goes_fake():
    """A text payload that merely BEGINS with RIFF....WAVE (size field
    wrong) must take the fake path, not raise from the real decoder."""
    from serverless_datalake_aws_spark.operators.multimodal import (
        _decode_audio,
        _fake_decode,
    )

    text = b"RIFF\x00\x00\x00\x00WAVE is the container format used by..."
    assert _decode_audio(text, "audio") == _fake_decode(text, "audio")
    # and a REAL wav (correct size field) still dispatches to the parser
    wav = make_wav(seconds=0.05)
    assert _decode_audio(wav, "audio") == _decode_wav(wav)
