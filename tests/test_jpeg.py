"""Pure-numpy baseline JPEG codec (operators/jpeg.py): spec-structural
checks, analytic DC-only exactness, lossy round-trip tolerance across
quality / subsampling / restart-marker configurations, corrupt-payload
degradation. No SparkSession needed."""

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.operators import codecs, jpeg


def _smooth(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (128 + 100 * np.sin(xx / 9)).astype(np.uint8),
        (128 + 100 * np.cos(yy / 7)).astype(np.uint8),
        (128 + 80 * np.sin((xx + yy) / 11)).astype(np.uint8),
    ], axis=-1)


def _markers(payload: bytes) -> list[int]:
    """Walk the marker stream (header segments only, stops at SOS)."""
    out, pos = [payload[1]], 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        m = payload[pos + 1]
        out.append(m)
        if m == 0xDA:
            break
        pos += 2 + struct.unpack_from(">H", payload, pos + 2)[0]
    return out


def test_marker_stream_is_spec_shaped():
    enc = jpeg.encode_jpeg(_smooth(16, 16), quality=85)
    ms = _markers(enc)
    assert ms[0] == 0xD8  # SOI
    assert ms[1] == 0xE0  # JFIF APP0
    assert ms.count(0xDB) == 2 and ms.count(0xC4) == 4
    assert 0xC0 in ms and ms[-1] == 0xDA
    assert enc.endswith(b"\xff\xd9")


def test_flat_gray_roundtrips_exactly():
    """A flat gray image is DC-only with zero chroma: at quality 95 the
    luma DC quantizer is 2 and 8*(v-128) is always even, so the decode
    must reproduce the input EXACTLY — an analytic pin that catches
    off-by-one level shifts and scaling errors that a tolerance check
    would absorb (encoder and decoder share the DCT matrix, so only an
    analytic pin is independent of both)."""
    for v in (0, 7, 128, 200, 255):
        img = np.full((24, 24, 3), v, dtype=np.uint8)
        for sub in (False, True):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95, subsample=sub))
            np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("quality,sub,tol", [
    (95, False, 2.0), (85, False, 3.5), (95, True, 5.0), (85, True, 6.5),
])
def test_roundtrip_tolerance(quality, sub, tol):
    img = _smooth()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality, subsample=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < tol, f"mean abs err {err} at q={quality} sub={sub}"


def test_odd_dimensions_and_single_pixel():
    for h, w in ((37, 51), (8, 8), (1, 1), (9, 3)):
        img = _smooth(max(h, 2), max(w, 2))[:h, :w]
        for sub in (False, True):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, subsample=sub))
            assert out.shape == (h, w, 3)


def test_restart_markers_roundtrip_and_are_emitted():
    img = _smooth()
    enc = jpeg.encode_jpeg(img, 85, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    out = jpeg.decode_jpeg(enc)
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 3.5
    # identical pixels to the no-restart encoding: DRI changes only the
    # entropy segmentation, never the coefficients
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85))
    np.testing.assert_array_equal(out, base)


def test_determinism():
    img = _smooth(16, 24)
    assert jpeg.encode_jpeg(img, 85) == jpeg.encode_jpeg(img, 85)
    enc = jpeg.encode_jpeg(img, 85)
    np.testing.assert_array_equal(jpeg.decode_jpeg(enc), jpeg.decode_jpeg(enc))


def test_sniff_and_image_router():
    enc = jpeg.encode_jpeg(_smooth(16, 16), 90)
    assert codecs.sniff(enc) == "jpeg"
    assert codecs.decode_image(enc).shape == (16, 16, 3)
    f = codecs.feature_vector(enc, dim=8)
    assert f[:2] == [16.0, 16.0]
    small = codecs.resize_image(enc, 4, 4)
    assert codecs.sniff(small) == "jpeg"
    assert codecs.decode_image(small).shape == (4, 4, 3)


def test_corrupt_jpeg_degrades_to_hash_fallback():
    for bad in (b"\xff\xd8\xff\xe0 jpeg-ish",
                jpeg.encode_jpeg(_smooth(16, 16), 90)[:40]):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)
        out = codecs.feature_vector(bad, dim=8)
        assert len(out) == 8 and out == codecs.feature_vector(bad, dim=8)


def test_progressive_rejected():
    enc = bytearray(jpeg.encode_jpeg(_smooth(16, 16), 90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode_jpeg(bytes(enc))


def test_multi_scan_baseline_decodes_identically():
    """T.81 baseline allows one non-interleaved SOS per component; the
    decoder must accumulate all scans and reconstruct color — not
    return grayscale from the first scan (review finding)."""
    img = _smooth(24, 32)
    inter = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90))
    multi_enc = jpeg.encode_jpeg(img, 90, separate_scans=True)
    assert multi_enc.count(b"\xff\xda") == 3
    np.testing.assert_array_equal(jpeg.decode_jpeg(multi_enc), inter)
    # restart markers count per scan
    with_rst = jpeg.encode_jpeg(img, 90, separate_scans=True,
                                restart_interval=5)
    np.testing.assert_array_equal(jpeg.decode_jpeg(with_rst), inter)


def test_fill_bytes_before_markers_accepted():
    """Any number of 0xFF fill bytes may pad a marker (T.81 B.1.1.2)."""
    img = _smooth(16, 16)
    enc = jpeg.encode_jpeg(img, 90)
    base = jpeg.decode_jpeg(enc)
    i = enc.find(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    np.testing.assert_array_equal(jpeg.decode_jpeg(padded), base)


def test_dqt_is_zigzag_ordered_annex_k():
    """DQT bytes are zigzag-ordered per B.2.4.1: at quality 50 the luma
    table must be exactly Annex K in zigzag order (raster-order DQT
    would permute quantization steps across frequencies)."""
    enc = jpeg.encode_jpeg(_smooth(16, 16), 50)
    j = enc.find(b"\xff\xdb")
    body = enc[j + 5 : j + 5 + 64]
    assert body == bytes(jpeg.QUANT_LUMA[jpeg.ZIGZAG].astype(np.uint8))


def test_truncation_always_raises_valueerror():
    enc = jpeg.encode_jpeg(_smooth(16, 16), 90)
    for cut in (5, 25, 60, 200, len(enc) - 3):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(enc[:cut])


def test_incomplete_multi_scan_raises():
    """A multi-scan stream missing a component's scan must raise, not
    silently reconstruct from zero coefficients."""
    enc = jpeg.encode_jpeg(_smooth(16, 16), 90, separate_scans=True)
    last_sos = enc.rfind(b"\xff\xda")
    truncated = enc[:last_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="never scanned"):
        jpeg.decode_jpeg(truncated)
