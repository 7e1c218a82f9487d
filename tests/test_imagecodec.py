"""Vendored pure-Python image codec (spider_spark/imagecodec.py).

Decode correctness is pinned three non-circular ways:
1. PNGs hand-assembled in THIS file from the spec (chunk layout, chosen
   filter bytes, scalar reference filterer independent of the codec's
   vectorized unfilter);
2. a literal well-known public PNG byte string (1x1 image);
3. encoder→decoder round-trips on random pixels (catches asymmetric bugs
   only if both sides break identically — hence 1 and 2).
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from spider_spark import imagecodec as ic


# ------------------------------------------------------------ helpers

def _ref_filter_row(raw: np.ndarray, prev: np.ndarray, f: int, bpp: int) -> bytes:
    """FORWARD PNG filter, scalar, straight from the spec pseudocode —
    independent of the codec's unfilter implementation."""
    out = bytearray()
    for x in range(len(raw)):
        a = int(raw[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        v = int(raw[x])
        if f == 0:
            out.append(v)
        elif f == 1:
            out.append((v - a) % 256)
        elif f == 2:
            out.append((v - b) % 256)
        elif f == 3:
            out.append((v - (a + b) // 2) % 256)
        elif f == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((v - pred) % 256)
    return bytes(out)


def _assemble_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG with a chosen filter per scanline."""
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        lines.append(f)
        lines += _ref_filter_row(flat[y], prev, f, ch)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)
            + ic._chunk(b"IDAT", zlib.compress(bytes(lines)))
            + ic._chunk(b"IEND", b""))


def _rng(seed=7):
    return np.random.default_rng(seed)


# ------------------------------------------------------------ PNG decode

@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_decode_every_filter_against_spec_reference(filters, ch):
    img = _rng(ch * 10 + filters[0]).integers(0, 256, (13, 11, ch), dtype=np.uint8)
    payload = _assemble_png(img, filters)
    got = ic.png_decode(payload)
    assert got.shape == img.shape
    np.testing.assert_array_equal(got, img)


def test_png_known_literal():
    # Public 1x1 PNG (the canonical "smallest PNG" floating around the
    # web): only dims/format are asserted, pixel content varies by source.
    b64 = ("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
           "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    payload = base64.b64decode(b64)
    assert ic.sniff_dims(payload) == (1, 1, "png")
    px = ic.png_decode(payload)
    assert px.shape[:2] == (1, 1)


def test_png_palette_decode():
    # hand-build a color-type-3 PNG: 2x2 indices into a 3-color palette
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    lines = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    payload = (ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)
               + ic._chunk(b"PLTE", pal.tobytes())
               + ic._chunk(b"IDAT", zlib.compress(lines))
               + ic._chunk(b"IEND", b""))
    got = ic.png_decode(payload)
    np.testing.assert_array_equal(got, pal[idx])


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip(ch):
    img = _rng(ch).integers(0, 256, (21, 17, ch), dtype=np.uint8)
    out = ic.png_decode(ic.png_encode(img))
    np.testing.assert_array_equal(out, img)


def test_png_rejects_truncated_and_wrong_depth():
    img = _rng(1).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = bytearray(ic.png_encode(img))
    payload[24] = 16  # bit depth byte in IHDR
    with pytest.raises(ValueError):
        ic.png_decode(bytes(payload))
    with pytest.raises(ValueError):
        ic.png_decode(b"\x89PNG\r\n\x1a\nXXXXIHDR")


# ------------------------------------------------------------ GIF

def test_gif_roundtrip_plain_and_interlaced():
    pal = np.array([[9, 8, 7], [100, 110, 120], [200, 0, 50], [1, 2, 3]],
                   dtype=np.uint8)
    idx = _rng(3).integers(0, 4, (19, 23), dtype=np.uint8)
    for interlace in (False, True):
        payload = ic.gif_encode(idx, pal, interlace=interlace)
        assert ic.sniff_dims(payload) == (23, 19, "gif")
        got = ic.gif_decode(payload)
        np.testing.assert_array_equal(got, pal[idx])


def test_gif_large_palette_and_long_stream():
    # 256-color palette exercises 8-bit min code + sub-block splitting
    pal = np.arange(256 * 3, dtype=np.int64).reshape(256, 3) % 256
    pal = pal.astype(np.uint8)
    idx = _rng(5).integers(0, 256, (40, 40), dtype=np.uint8)
    got = ic.gif_decode(ic.gif_encode(idx, pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_87a_header_variant():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    payload = ic.gif_encode(idx, pal)
    assert payload[:6] == b"GIF87a"
    # flip to 89a — decoder must accept both
    as89 = b"GIF89a" + payload[6:]
    np.testing.assert_array_equal(ic.gif_decode(as89), pal[idx])


# ------------------------------------------------------------ JPEG dims

def _minimal_jpeg(w: int, h: int) -> bytes:
    """SOI + APP0 + DQT(dummy) + SOF0 carrying the dims + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def test_jpeg_dims_from_sof():
    assert ic.sniff_dims(_minimal_jpeg(640, 480)) == (640, 480, "jpeg")
    assert ic.sniff_dims(_minimal_jpeg(1, 65535)) == (1, 65535, "jpeg")


def test_jpeg_progressive_sof2():
    j = bytearray(_minimal_jpeg(33, 44))
    j[j.index(b"\xff\xc0") + 1] = 0xC2  # progressive SOF2
    assert ic.sniff_dims(bytes(j)) == (33, 44, "jpeg")


def test_sniff_rejects_non_images():
    for junk in (b"hello world", b"", b"\x00" * 40, b"<html><body>"):
        with pytest.raises(ValueError):
            ic.sniff_dims(junk)


# ------------------------------------------------------------ resize

def test_resize_nearest_identity_and_downscale():
    img = _rng(11).integers(0, 256, (10, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(ic.resize_nearest(img, 8, 10), img)
    half = ic.resize_nearest(img, 4, 5)
    assert half.shape == (5, 4, 3)
    # nearest-neighbor: every output pixel exists somewhere in the source
    src = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in src for p in half.reshape(-1, 3))


def test_real_resizer_png_roundtrip_solid():
    img = np.full((30, 20, 3), 77, dtype=np.uint8)
    out = ic.real_resizer(ic.png_encode(img), 5, 6)
    dec = ic.png_decode(out)
    assert dec.shape == (6, 5, 3)
    assert (dec == 77).all()


def test_real_resizer_gif_input_reencodes_png():
    pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    idx = np.tile(np.array([[0, 1]], dtype=np.uint8), (6, 3))
    out = ic.real_resizer(ic.gif_encode(idx, pal), 3, 3)
    dec = ic.png_decode(out)
    assert dec.shape == (3, 3, 3)
    assert {tuple(p) for p in dec.reshape(-1, 3)} <= {(10, 20, 30), (200, 100, 0)}


# ------------------------------------------------------------ Spark seam

def test_media_meta_real_decoder_on_planted_binaries(spark):
    """media.extract_media_meta default decoder on REAL planted binaries:
    PNG + GIF + JPEG dims come back; junk rows carry errors as data."""
    from pyspark.sql import functions as F  # noqa: F401

    from spider_spark import media

    png = ic.png_encode(np.full((12, 34, 3), 5, dtype=np.uint8))
    gif = ic.gif_encode(np.zeros((7, 9), dtype=np.uint8),
                        np.array([[1, 2, 3]], dtype=np.uint8))
    jpg = _minimal_jpeg(55, 66)
    rows = [(1, bytearray(png)), (2, bytearray(gif)),
            (3, bytearray(jpg)), (4, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in media.extract_media_meta(df).collect()}
    assert (got[1].width, got[1].height, got[1].format) == (34, 12, "png")
    assert (got[2].width, got[2].height, got[2].format) == (9, 7, "gif")
    assert (got[3].width, got[3].height, got[3].format) == (55, 66, "jpeg")
    assert got[4].error is not None and got[4].width is None


def test_resize_media_real_end_to_end(spark):
    """Full pixel path inside Spark: plant solid PNGs → resize_media with
    the real decoder+resizer → re-decode the advertised output size."""
    from spider_spark import media

    rows = [(i, bytearray(ic.png_encode(
        np.full((16 + i, 24 + i, 3), i * 11 % 256, dtype=np.uint8))))
        for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in media.resize_media(
        df, 12, 12, resizer=media.real_resizer).collect()}
    for i in range(6):
        r = out[i]
        assert r.error is None
        assert (r.src_width, r.src_height) == (24 + i, 16 + i)
        scale = min(12 / r.src_width, 12 / r.src_height, 1.0)
        assert r.out_width == max(1, int(r.src_width * scale))
        assert r.out_height == max(1, int(r.src_height * scale))
        assert r.n_out_bytes > 0  # real PNG bytes, not 3/px fake buffer
