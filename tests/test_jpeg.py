"""Baseline JPEG codec units: decoder anchored on hand-computable flat
blocks (independent of the encoder), lossy round trips bounded by
quantization error, subsampling, restart-free/marker structure, and the
multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from connapse_spark.operators.jpeg import (
    JpegUnsupported,
    decode_jpeg,
    encode_jpeg,
)


def test_flat_color_decodes_near_exact():
    """A flat image's blocks are DC-only: the reconstruction error is
    bounded by Q[0,0]/16 per pixel — analytically, not by encoder trust."""
    for color in ((128, 128, 128), (200, 40, 90), (0, 0, 0), (255, 255, 255)):
        arr = np.zeros((16, 24, 3), np.uint8)
        arr[:] = color
        out = decode_jpeg(encode_jpeg(arr, quality=90))
        assert out.shape == arr.shape
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 3, color


def test_smooth_gradient_roundtrip_within_tolerance():
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            (xx * 255 / w),
            (yy * 255 / h),
            ((xx + yy) * 255 / (h + w)),
        ],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 3.0 and err.max() <= 35


def test_subsampled_420_roundtrip():
    rng = np.random.default_rng(13)
    base = rng.integers(60, 196, size=(5, 7, 3), dtype=np.uint8)
    # blow up to 35x49 with nearest so chroma is locally flat (4:2:0-friendly)
    arr = np.repeat(np.repeat(base, 7, axis=0), 7, axis=1)
    out = decode_jpeg(encode_jpeg(arr, quality=90, subsample=True))
    assert out.shape == arr.shape
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 10.0


def test_dimensions_not_multiple_of_mcu():
    arr = np.full((9, 13, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=85, subsample=True))
    assert out.shape == (9, 13, 3)
    assert np.abs(out.astype(int) - 77).max() <= 3


def test_progressive_is_labeled_unsupported():
    # minimal SOI + SOF2 header
    blob = (
        b"\xff\xd8\xff\xc2" + (11).to_bytes(2, "big")
        + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(JpegUnsupported, match="UnsupportedJpegProcess"):
        decode_jpeg(blob)


def test_multimodal_dispatch_decodes_jpeg():
    from connapse_spark.operators.multimodal import decode_image_array

    arr = np.full((8, 8, 3), 99, np.uint8)
    out, err = decode_image_array(encode_jpeg(arr))
    assert err is None
    assert np.abs(out.astype(int) - 99).max() <= 3

    # truncated payload degrades to a labeled parse error, not a crash
    out, err = decode_image_array(encode_jpeg(arr)[:40])
    assert out is None and err.startswith("JpegParseError")


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Some encoders pad before DQT — the parse must not read the marker
    byte as a segment length."""
    arr = np.full((8, 8, 3), 77, np.uint8)
    blob = encode_jpeg(arr, quality=85)
    assert blob[:2] == b"\xff\xd8"
    filled = blob[:2] + b"\xff\xff" + blob[2:]  # FF FF FF DB ...
    assert np.array_equal(decode_jpeg(filled), decode_jpeg(blob))


def test_grayscale_rounds_like_color_path():
    """Hand-built 1-component DC-only JPEG whose reconstruction is exactly
    129.5 per pixel (dc=1, q00=12 -> 12/8 + 128): the grayscale path must
    ROUND (130), not truncate (129) — parity with the color path."""
    from connapse_spark.operators.jpeg import (
        STD_AC_LUMA,
        STD_DC_LUMA,
        _BitWriter,
        _build_encode,
    )

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(
            bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload
        )

    seg(0xDB, bytes([0]) + bytes([12] + [16] * 63))  # q00=12 (zigzag[0]=0)
    for tc, th, (bits, vals) in ((0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    w = _BitWriter()
    dc_enc, ac_enc = _build_encode(*STD_DC_LUMA), _build_encode(*STD_AC_LUMA)
    ln, code = dc_enc[1]
    w.write(code, ln)      # DC size=1
    w.write(1, 1)          # diff=+1
    ln, code = ac_enc[0x00]
    w.write(code, ln)      # EOB
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")
    px = decode_jpeg(bytes(out))
    assert px.shape == (8, 8, 3)
    assert (px == 130).all()  # truncation would give 129


def test_byte_stuffing_survives():
    """Force entropy bytes of 0xFF (stuffing) by using content that
    produces long 1-runs in the bitstream — any image works as a smoke,
    stuffing correctness shows as a clean round trip."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape  # decode completes; noise tolerance is loose
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 16.0
