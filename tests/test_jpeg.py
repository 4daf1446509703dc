"""Baseline JPEG codec (sources/jpeg.py): round-trip quality bounds,
spec-exactness cases, and a HAND-BUILT fixture assembled from ITU-T
T.81's own tables — the decoder is validated against the spec, not
just against our encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdatamlteamrepo_spark.sources.codecs import synth_image
from bigdatamlteamrepo_spark.sources.jpeg import (
    HT_AC_LUMA,
    HT_DC_LUMA,
    QT_LUMA,
    _ZZ_COLS,
    _ZZ_ROWS,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_flat_image_is_exact():
    """An all-128 image has zero coefficients after level shift — the
    spec makes this case exact at any quality."""
    flat = np.full((16, 24, 3), 128, dtype=np.uint8)
    for q in (10, 50, 95):
        assert (decode_jpeg(encode_jpeg(flat, q)) == flat).all()


def test_quality_ladder_psnr():
    img = synth_image(3, 40, 32)
    prev = 0.0
    for q, floor in ((50, 24), (75, 27), (90, 33), (100, 50)):
        got = decode_jpeg(encode_jpeg(img, q))
        assert got.shape == img.shape
        p = _psnr(img, got)
        assert p >= floor, (q, p)
        assert p >= prev  # monotone in quality
        prev = p


def test_odd_sizes_and_padding():
    for hw in ((1, 1), (7, 9), (8, 8), (17, 23), (64, 3)):
        img = synth_image(5, hw[1], hw[0])
        got = decode_jpeg(encode_jpeg(img, 95))
        assert got.shape == img.shape
        assert _psnr(img, got) >= 30


def test_high_entropy_content():
    noisy = (synth_image(7, 33, 25).astype(np.uint32) * 181 % 256).astype(
        np.uint8
    )
    got = decode_jpeg(encode_jpeg(noisy, 90))
    assert _psnr(noisy, got) >= 25


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, 2 + len(payload)) + payload


def test_hand_built_spec_fixture_decodes_exactly():
    """A grayscale 8x8 solid-160 JPEG assembled BY HAND from T.81's
    Annex-K tables.  Solid 160: level shift 32, orthonormal DC = 256,
    quantized by K.1's DC step 16 -> 16, no remainder — so the decoded
    block is exactly 160 everywhere.  Entropy stream derived from the
    canonical code assignment: DC size-5 symbol = code 110 (3 bits),
    amplitude 10000, AC EOB = 1010 (4 bits), 1-padded to two bytes =
    0xD0 0xAF.  Exercises marker parse, canonical Huffman build,
    EXTEND, dequant, IDCT — with no bytes from our encoder."""
    dqt = _seg(
        0xFFDB,
        bytes([0]) + QT_LUMA[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes(),
    )
    sof = _seg(
        0xFFC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    dht_dc = _seg(
        0xFFC4, bytes([0x00]) + bytes(HT_DC_LUMA[0]) + bytes(HT_DC_LUMA[1])
    )
    dht_ac = _seg(
        0xFFC4, bytes([0x10]) + bytes(HT_AC_LUMA[0]) + bytes(HT_AC_LUMA[1])
    )
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bytes([0xD0, 0xAF]) + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8, 3)
    assert (out == 160).all()


def test_rejects_non_baseline_and_garbage():
    img = synth_image(1, 16, 16)
    good = bytearray(encode_jpeg(img, 90))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    idx = bytes(good).find(b"\xff\xc0")
    bad = bytearray(good)
    bad[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), quality=0)


def test_jpeg_media_fixture_is_spec_exact(spark):
    """generate_jpeg_media's solid-gray payloads must decode EXACTLY
    (the property the registered oracle relies on), through the same
    decode_image dispatch the Spark stages use."""
    from bigdatamlteamrepo_spark.sources.codecs import decode_image
    from bigdatamlteamrepo_spark.sources.multimodal import generate_jpeg_media

    rows = generate_jpeg_media(spark, n_rows=24, seed=42).collect()
    assert len(rows) == 24
    for r in rows:
        v = 68 + 2 * ((r.media_id * 23 + 42) % 60)
        arr = decode_image(bytes(r.payload))
        assert arr.shape == (r.height, r.width, 3)
        assert (arr == v).all(), (r.media_id, v)


def test_restart_interval_roundtrip():
    """DRI/RSTn: the encoder emits restart markers every N MCUs (DC
    predictors reset, stream byte-aligned); the decoder honors the DRI
    segment — outputs identical to the restart-free stream."""
    img = synth_image(9, 40, 24)  # 5x3 = 15 MCUs
    plain = decode_jpeg(encode_jpeg(img, 90))
    for interval in (1, 2, 7):
        with_rst = encode_jpeg(img, 90, restart_interval=interval)
        assert with_rst != encode_jpeg(img, 90)
        assert b"\xff\xdd" in with_rst  # DRI present
        assert (decode_jpeg(with_rst) == plain).all()


def test_fill_bytes_and_stray_markers_tolerated():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes, and
    TEM (0x01) has no length field — spec-legal streams from foreign
    encoders must decode identically."""
    img = synth_image(4, 24, 16)
    good = encode_jpeg(img, 90)
    want = decode_jpeg(good)
    # inject a fill byte before the SOF0 marker and a TEM marker
    # between segments
    idx = good.find(b"\xff\xc0")
    padded = good[:idx] + b"\xff\x01" + b"\xff" + good[idx:]
    assert (decode_jpeg(padded) == want).all()
