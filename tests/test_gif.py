"""Pure-python GIF codec (operators/gif.py): LZW round-trips across
code-width boundaries and the 4096 dictionary clear, interlace
reordering, transparency, animation first-frame, corrupt degradation.
No SparkSession needed."""

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.operators import codecs, gif


def _smooth(h=20, w=30):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 8) % 256, (yy * 11) % 256,
                     ((xx + yy) * 5) % 256], -1).astype(np.uint8)


def test_palette_image_roundtrips_exactly():
    """An image whose colors already sit on the encoder's 6x7x6 cube
    round-trips EXACTLY (the only loss in encode is quantization)."""
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    on_palette = gif.decode_gif(gif.encode_gif(noisy))
    out = gif.decode_gif(gif.encode_gif(on_palette))
    np.testing.assert_array_equal(out, on_palette)


def test_quantization_error_bounded():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = gif.decode_gif(gif.encode_gif(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 23  # cell radius


def test_lzw_crosses_width_boundaries_and_clear():
    """16384 random pixels push the LZW dictionary through the
    9->10->11->12-bit width steps and past 4096 (clear-code reset);
    any encoder/decoder width desync corrupts pixels or raises."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    first = gif.decode_gif(gif.encode_gif(img))
    np.testing.assert_array_equal(
        gif.decode_gif(gif.encode_gif(first)), first)


def test_interlaced_decode():
    """Hand-build an interlaced variant by reordering the plain frame's
    rows into the four-pass transmission order and setting the
    interlace flag — the decoder must undo it exactly."""
    img = gif.decode_gif(gif.encode_gif(_smooth(16, 12)))  # palette-exact
    plain = bytearray(gif.encode_gif(img))
    h, w = img.shape[:2]
    # decode the index stream from the plain encoding
    # (re-derive indices via the encoder's own quantizer)
    r = np.minimum(img[:, :, 0].astype(np.int64) * 6 // 256, 5)
    g = np.minimum(img[:, :, 1].astype(np.int64) * 7 // 256, 6)
    b = np.minimum(img[:, :, 2].astype(np.int64) * 6 // 256, 5)
    idx = (r * 42 + g * 6 + b).astype(np.uint8)
    order = np.concatenate([np.arange(s, h, st)
                            for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    lzw = gif._lzw_encode(idx[order].tobytes(), 8)
    out = bytearray(plain[: 13 + 256 * 3])  # header + GCT
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlace flag
    out.append(8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    np.testing.assert_array_equal(gif.decode_gif(bytes(out)), img)


def test_transparency_takes_backdrop():
    img = gif.decode_gif(gif.encode_gif(_smooth(8, 8)))
    enc = bytearray(gif.encode_gif(img))
    # splice a graphic-control extension marking palette index of the
    # top-left pixel transparent, before the image descriptor (0x2C)
    r = np.minimum(int(img[0, 0, 0]) * 6 // 256, 5)
    g = np.minimum(int(img[0, 0, 1]) * 7 // 256, 6)
    b = np.minimum(int(img[0, 0, 2]) * 6 // 256, 5)
    t_idx = r * 42 + g * 6 + b
    desc = 13 + 256 * 3
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, t_idx, 0])
    patched = bytes(enc[:desc]) + gce + bytes(enc[desc:])
    out = gif.decode_gif(patched)
    # backdrop index 0 = cube cell (0,0,0) -> palette color ~ (21,18,21)
    np.testing.assert_array_equal(out[0, 0], [128 // 6, 128 // 7, 128 // 6])
    # untouched pixels (different palette cell) keep their color
    mask = ~np.all(img == img[0, 0], axis=-1)
    np.testing.assert_array_equal(out[mask], img[mask])


def test_animation_decodes_first_frame():
    img = gif.decode_gif(gif.encode_gif(_smooth(8, 8)))
    enc = bytearray(gif.encode_gif(img))
    # duplicate the image block (descriptor..terminator) before trailer
    desc = 13 + 256 * 3
    block = bytes(enc[desc:-1])
    doubled = bytes(enc[:-1]) + block + b"\x3b"
    np.testing.assert_array_equal(gif.decode_gif(doubled), img)


def test_sniff_and_router():
    enc = gif.encode_gif(_smooth(16, 16))
    assert codecs.sniff(enc) == "gif"
    assert codecs.decode_image(enc).shape == (16, 16, 3)
    f = codecs.feature_vector(enc, dim=8)
    assert f[:2] == [16.0, 16.0]
    small = codecs.resize_image(enc, 4, 4)
    assert codecs.sniff(small) == "gif"
    assert codecs.decode_image(small).shape == (4, 4, 3)


def test_corrupt_gif_degrades():
    enc = gif.encode_gif(_smooth(16, 16))
    for bad in (b"GIF89a only-a-header", enc[:60]):
        with pytest.raises(ValueError):
            gif.decode_gif(bad)
        out = codecs.feature_vector(bad, dim=8)
        assert len(out) == 8 and out == codecs.feature_vector(bad, dim=8)


def test_local_table_transparency_uses_global_backdrop():
    """Transparent pixels take the GLOBAL table's background color even
    when the frame has a small LOCAL color table — indexing the local
    table with the global bg index mis-colors or IndexErrors (review
    finding)."""
    pal16 = np.arange(48, dtype=np.uint8).reshape(16, 3)
    gct = np.zeros((256, 3), np.uint8)
    gct[200] = [10, 20, 30]
    idx = np.tile(np.arange(4, dtype=np.uint8), (4, 1))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 7, 200, 0)
    out += gct.tobytes()
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 2, 0])  # transparent idx 2
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x80 | 3)  # local 16
    out += pal16.tobytes()
    out.append(4)  # LZW min code size
    lzw = gif._lzw_encode(idx.tobytes(), 4)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dec = gif.decode_gif(bytes(out))
    np.testing.assert_array_equal(dec[0, 2], [10, 20, 30])  # gct[bg]
    np.testing.assert_array_equal(dec[0, 1], pal16[1])      # local table


def test_truncation_always_raises_valueerror():
    enc = gif.encode_gif(_smooth(8, 8))
    for cut in (8, 12, 100, 700, len(enc) - 2):
        try:
            gif.decode_gif(enc[:cut])
        except ValueError:
            continue  # the contract
        except Exception as e:
            pytest.fail(f"cut={cut}: raised {type(e).__name__}, not ValueError")
