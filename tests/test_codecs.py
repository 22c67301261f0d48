"""Pure-stdlib media codecs (operators/codecs.py): WAV/BMP/PPM
round-trips, nearest-neighbor resize, deterministic feature routing.
No SparkSession needed — these run before the cluster-side tests."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.operators import codecs


def _gradient(h=16, w=16):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 7 % 256, yy * 11 % 256, (xx + yy) * 13 % 256],
                    axis=-1).astype(np.uint8)


def test_bmp_roundtrip_exact():
    rgb = _gradient()
    payload = codecs.encode_bmp(rgb)
    assert codecs.sniff(payload) == "bmp"
    back = codecs.decode_bmp(payload)
    np.testing.assert_array_equal(back, rgb)


def test_bmp_odd_width_stride_padding():
    rgb = _gradient(5, 7)  # 7*3=21 bytes/row -> stride 24, padding real
    back = codecs.decode_bmp(codecs.encode_bmp(rgb))
    np.testing.assert_array_equal(back, rgb)


def test_ppm_roundtrip_exact():
    rgb = _gradient(9, 13)
    payload = codecs.encode_ppm(rgb)
    assert codecs.sniff(payload) == "ppm"
    np.testing.assert_array_equal(codecs.decode_ppm(payload), rgb)


def test_ppm_comment_header():
    rgb = _gradient(2, 2)
    raw = codecs.encode_ppm(rgb)
    commented = b"P6\n# a comment\n2 2\n255\n" + raw.split(b"255\n", 1)[1]
    np.testing.assert_array_equal(codecs.decode_ppm(commented), rgb)


def test_wav_roundtrip_close():
    t = np.arange(1600) / 8000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    payload = codecs.encode_wav(x, 8000)
    assert codecs.sniff(payload) == "wav"
    back, rate = codecs.decode_wav(payload)
    assert rate == 8000 and back.shape == (1600, 1)
    assert np.max(np.abs(back[:, 0] - x)) < 1e-3  # 16-bit quantization


def test_wav_features_shape_and_determinism():
    payload = codecs.encode_wav(np.sin(np.arange(800) / 10.0), 8000)
    f1, f2 = codecs.wav_features(payload), codecs.wav_features(payload)
    assert f1 == f2 and len(f1) == 8
    assert f1[0] == pytest.approx(0.1)  # 800 samples @ 8 kHz
    assert 0 < f1[1] < 1  # rms of a sine


def test_resize_nearest_and_reencode():
    rgb = _gradient(16, 16)
    small = codecs.resize_image(codecs.encode_bmp(rgb), 4, 4)
    out = codecs.decode_bmp(small)
    assert out.shape == (4, 4, 3)
    # corner pixel maps exactly (nearest-neighbor determinism)
    np.testing.assert_array_equal(out[0, 0], rgb[0, 0])
    pp = codecs.resize_image(codecs.encode_ppm(rgb), 8, 2)
    assert codecs.sniff(pp) == "ppm" and codecs.decode_ppm(pp).shape == (2, 8, 3)


def test_feature_vector_routes_by_magic():
    img = codecs.feature_vector(codecs.encode_bmp(_gradient()), dim=8)
    wavf = codecs.feature_vector(codecs.encode_wav(np.zeros(80), 8000), dim=8)
    unknown = codecs.feature_vector(b"\x89PNG-not-really", dim=8)
    assert img[:2] == [16.0, 16.0]  # w, h lead the image features
    assert wavf[0] == pytest.approx(0.01)  # duration leads audio features
    assert len(unknown) == 8 and unknown == codecs.feature_vector(
        b"\x89PNG-not-really", dim=8
    )


def test_unsupported_resize_raises():
    mp4ish = b"\x00\x00\x00\x18ftypmp42 not-a-real-box"
    with pytest.raises(ValueError):
        codecs.resize_image(mp4ish, 4, 4)


def test_corrupt_payload_degrades_to_hash_fallback():
    """A payload whose magic sniffs as decodable but whose body is
    corrupt must take the hash fallback, never raise — one bad row must
    not abort a whole Spark job (review finding, round 4)."""
    truncated_wav = b"RIFF\x24\x00\x00\x00WAVEfmt "  # header only
    bad_bmp = b"BM" + b"\x00" * 20  # too short for a real header
    for payload in (truncated_wav, bad_bmp):
        out = codecs.feature_vector(payload, dim=8)
        assert len(out) == 8
        assert out == codecs.feature_vector(payload, dim=8)  # deterministic

# ------------------------------------------------------------------ PNG

def _png_with_filters(im, filters, color=2, palette=None):
    """Reference PNG writer for fixtures: applies the REQUESTED filter
    per scanline (forward direction, per the spec's filter definitions),
    independent of the production encoder (which always emits filter 0)
    — so decode is tested against spec math, not its own inverse."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    h, w = im.shape[:2]
    ch = im.shape[2] if im.ndim == 3 else 1
    flat = im.reshape(h, w * ch).astype(np.int32)
    lines, prev = [], np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row, f = flat[y], filters[y % len(filters)]
        enc = bytearray()
        for x in range(w * ch):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[f]
            enc.append((int(row[x]) - pred) & 0xFF)
        lines.append(bytes([f]) + bytes(enc))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = codecs._PNG_MAGIC + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.tobytes())
    return out + chunk(b"IDAT", zlib.compress(b"".join(lines))) + chunk(b"IEND", b"")


def test_png_roundtrip_exact():
    rgb = _gradient(13, 9)
    payload = codecs.encode_png(rgb)
    assert codecs.sniff(payload) == "png"
    np.testing.assert_array_equal(codecs.decode_png(payload), rgb)
    np.testing.assert_array_equal(codecs.decode_image(payload), rgb)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_scanline_filters(filters):
    rgb = _gradient(11, 7)
    payload = _png_with_filters(rgb, filters)
    np.testing.assert_array_equal(codecs.decode_png(payload), rgb)


def test_png_color_types():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (7, 5, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_png(_png_with_filters(gray, [0, 1, 2, 3, 4], color=0)),
        np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(  # alpha dropped, like BMP 32-bpp
        codecs.decode_png(_png_with_filters(rgba, [4, 3, 2, 1], color=6)),
        rgba[:, :, :3])
    ga = rng.integers(0, 256, (6, 4, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_png(_png_with_filters(ga, [1, 4], color=4)),
        np.repeat(ga[:, :, :1], 3, axis=2))
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 6, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_png(_png_with_filters(idx, [0], color=3, palette=pal)),
        pal[idx[:, :, 0]])


def test_png_resize_and_features():
    rgb = _gradient(16, 16)
    payload = codecs.encode_png(rgb)
    small = codecs.resize_image(payload, 4, 4)
    assert codecs.sniff(small) == "png"
    out = codecs.decode_png(small)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[0, 0], rgb[0, 0])
    f = codecs.feature_vector(payload, dim=8)
    assert f[:2] == [16.0, 16.0]
    assert f[2] == pytest.approx(rgb[:, :, 0].mean() / 255.0)


def test_png_crc_corruption_degrades_per_row():
    """A bit flip anywhere in a chunk fails its CRC -> ValueError ->
    the multimodal feature router takes the hash fallback (per-row
    degradation contract)."""
    payload = bytearray(codecs.encode_png(_gradient(8, 8)))
    payload[40] ^= 0xFF
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(payload))
    out = codecs.feature_vector(bytes(payload), dim=8)
    assert len(out) == 8 and out == codecs.feature_vector(bytes(payload), dim=8)


def test_png_interlaced_and_16bit_rejected():
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    for depth, interlace in ((8, 1), (16, 0)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, interlace)
        p = (codecs._PNG_MAGIC + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 64)) + chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            codecs.decode_png(p)


def test_png_truncation_always_raises_valueerror():
    payload = codecs.encode_png(_gradient(8, 8))
    for cut in (10, 20, 40, len(payload) - 3):
        with pytest.raises(ValueError):
            codecs.decode_png(payload[:cut])


# ------------------------------------------------------------- AIFF / AU

def test_aiff_roundtrip_and_extended_float_rate():
    t = np.arange(1600) / 8000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    for rate in (8000, 44100, 48000):  # 80-bit extended-float encode/parse
        payload = codecs.encode_aiff(x, rate)
        assert codecs.sniff(payload) == "aiff"
        y, r = codecs.decode_aiff(payload)
        assert r == rate and y.shape == (1600, 1)
        assert np.max(np.abs(y[:, 0] - x)) < 1e-3


def test_au_linear_and_mulaw():
    t = np.arange(1600) / 8000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    lin = codecs.encode_au(x, 8000)
    assert codecs.sniff(lin) == "au"
    y, r = codecs.decode_au(lin)
    assert r == 8000 and np.max(np.abs(y[:, 0] - x)) < 1e-3
    # G.711 mu-law: ~14-bit companded dynamic range
    mu = codecs.encode_au(x, 8000, mulaw=True)
    y2, _ = codecs.decode_au(mu)
    assert np.max(np.abs(y2[:, 0] - x)) < 0.02


def test_audio_router_and_features():
    x = np.sin(np.arange(800) / 10.0)
    for payload in (codecs.encode_wav(x, 8000), codecs.encode_aiff(x, 8000),
                    codecs.encode_au(x, 8000, mulaw=True)):
        samples, rate = codecs.decode_audio(payload)
        assert rate == 8000 and samples.shape[0] == 800
        f = codecs.feature_vector(payload, dim=8)
        assert f[0] == pytest.approx(0.1)  # duration leads audio features


def test_aiff_au_stereo_and_corrupt():
    x = np.sin(np.arange(400) / 7.0)
    st = np.stack([x, -x], axis=1)
    for enc_fn, dec_fn in ((codecs.encode_aiff, codecs.decode_aiff),
                           (codecs.encode_au, codecs.decode_au)):
        y, r = dec_fn(enc_fn(st, 16000))
        assert y.shape == (400, 2) and r == 16000
    with pytest.raises(ValueError):
        codecs.decode_aiff(codecs.encode_aiff(x)[:20])
    with pytest.raises(ValueError):
        codecs.decode_au(b".snd" + b"\x00" * 10)
