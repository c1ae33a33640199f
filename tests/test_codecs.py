"""Unit tests for the real stdlib media codecs (multimodal.py): PNG
encode/decode across all five filter types, WAV/PCM round-trip, profile
rejection, and the aHash brightness-invariance contract."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark.operators.multimodal import (  # noqa: E501
    GRAY_MOD,
    _image_params,
    _render_rows,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    rows = _render_rows("media/DOC12/fig1.png")
    data = png_encode(rows, filter_type=filter_type)
    w, h, depth, color, back = png_decode(data)
    assert (w, h, depth, color) == (len(rows[0]), len(rows), 8, 0)
    assert back == rows


def test_png_is_a_real_png():
    data = png_encode([bytes([1, 2, 3]), bytes([4, 5, 6])])
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data
    import zlib
    # IDAT really is a zlib stream of filtered scanlines
    start = data.index(b"IDAT") + 4
    import struct
    (length,) = struct.unpack(">I", data[data.index(b"IDAT") - 4:
                                         data.index(b"IDAT")])
    raw = zlib.decompress(data[start:start + length])
    assert raw == b"\x00\x01\x02\x03\x00\x04\x05\x06"


def test_png_rejects_garbage_and_wrong_profile():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all----")
    import struct
    import zlib as z
    # RGB (color type 2) profile must be rejected loudly
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        png_decode(sig + chunk)


def test_wav_roundtrip_and_rejection():
    samples = [0, 100, -100, 32767, -32768] * 7
    rate, back = wav_decode(wav_encode(samples, rate=16000))
    assert rate == 16000 and back == samples
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"OggS....nonsense")


def test_brightness_twins_share_geometry_not_bytes():
    a, b = "media/DOC0/fig1.png", "media/DOC3/fig1.png"
    pa, pb = _image_params(a), _image_params(b)
    assert pa[:5] == pb[:5] and pa[5] != pb[5]
    ra, rb = _render_rows(a), _render_rows(b)
    d = pb[5] - pa[5]
    assert all(rb[y][x] - ra[y][x] == d
               for y in range(len(ra)) for x in range(len(ra[0])))
    assert max(v for r in rb for v in r) < 256  # no wrap: invariance exact
    assert max(v for r in ra for v in r) >= GRAY_MOD - 60  # texture spans
