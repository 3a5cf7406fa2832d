"""The multimodal image seam with a REAL codec: generated BMP fixtures
decoded through the same mapInPandas plumbing mm03 oracle-verifies with
the stub — the image counterpart of the WAV seam proof."""

from __future__ import annotations

import struct

import pytest

from serverless_datalake_aws_spark.operators.multimodal import (
    _decode_bmp,
    _decode_image,
    decode_stub,
)


def make_bmp(
    width: int = 4,
    height: int = 3,
    rgb: tuple[int, int, int] = (255, 0, 0),
    bits: int = 24,
    top_down: bool = False,
) -> bytes:
    bypp = bits // 8
    stride = (width * bypp + 3) & ~3
    px = bytearray()
    b, g, r = rgb[2], rgb[1], rgb[0]
    for _ in range(height):
        row = bytearray()
        for _ in range(width):
            row += bytes([b, g, r] + ([255] if bits == 32 else []))
        row += b"\x00" * (stride - len(row))
        px += row
    file_size = 54 + len(px)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        bits,
        0,
        len(px),
        2835,
        2835,
        0,
        0,
    )
    return bytes(hdr + dib + px)


def test_bmp_header_and_channel_features():
    w, h, bits, aspect, r, g, b, luma = _decode_bmp(
        make_bmp(width=4, height=3, rgb=(255, 0, 0))
    )
    assert (w, h, bits) == (4.0, 3.0, 24.0)
    assert aspect == pytest.approx(4 / 3)
    assert (r, g, b) == (1.0, 0.0, 0.0)
    assert luma == pytest.approx(0.299)


def test_bmp_32bit_and_topdown_agree():
    base = _decode_bmp(make_bmp(rgb=(10, 200, 30)))
    assert _decode_bmp(make_bmp(rgb=(10, 200, 30), bits=32)) == base[:2] + [
        32.0
    ] + base[3:]
    assert _decode_bmp(make_bmp(rgb=(10, 200, 30), top_down=True)) == base


def test_image_seam_dispatches_bmp_and_falls_back():
    bmp = make_bmp(rgb=(0, 255, 0))
    assert _decode_image(bmp, "image")[5] == 1.0  # mean_g
    # non-BMP payload → deterministic fake (8 digest floats)
    fake = _decode_image(b"\x89PNG not a real png", "image")
    assert len(fake) == 8 and all(0 <= v <= 1 for v in fake)
    # 'BM' prefix with a WRONG size field is sniffed as non-BMP, not a crash
    forged = b"BM" + b"\x00" * 60
    assert len(_decode_image(forged, "image")) == 8


def test_unsupported_bmp_variant_raises():
    rle = bytearray(make_bmp())
    struct.pack_into("<I", rle, 30, 1)  # compression = BI_RLE8
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(rle))


def test_seam_contract_via_decode_stub():
    feats = decode_stub(make_bmp(width=8, height=2, rgb=(0, 0, 255)), "image")
    assert feats[0] == 8.0 and feats[1] == 2.0 and feats[6] == 1.0


def test_bmp_inflated_geometry_stays_in_contract():
    """A BMP whose size field passes the sniff but whose header claims
    more pixels than the payload carries must raise the declared
    NotImplementedError, not a raw numpy buffer error."""
    import struct as _s

    bmp = bytearray(make_bmp())
    _s.pack_into("<i", bmp, 22, 10**6)  # inflate height
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(bmp))
    _s.pack_into("<i", bmp, 22, 4)
    _s.pack_into("<i", bmp, 18, -3)  # negative width
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(bmp))
