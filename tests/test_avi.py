"""MJPEG-AVI container codec (operators/avi.py): parse, per-frame
decode, sampling arithmetic, features, corrupt degradation. No
SparkSession needed."""

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from polardbx_tools_spark.operators import avi, codecs


def _clip(n=10, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.stack([(xx * 3 + i * 10) % 256, (yy * 5 + i * 7) % 256,
                      ((xx + yy) * 2) % 256], -1).astype(np.uint8)
            for i in range(n)]


def test_parse_and_frame_decode():
    frames = _clip()
    payload = avi.encode_avi(frames, fps=10, quality=90)
    assert codecs.sniff(payload) == "avi"
    meta = avi.parse_avi(payload)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 10)
    assert len(meta["frames"]) == 10
    for i in (0, 5, -1):
        out = avi.decode_frame(payload, i)
        assert out.shape == (24, 32, 3)
        err = np.abs(out.astype(int) - frames[i].astype(int)).mean()
        assert err < 6.0, f"frame {i} err {err}"


def test_sampling_decodes_only_requested_frames():
    payload = avi.encode_avi(_clip(10), fps=10)  # 100 ms/frame
    stamps = [ms for ms, _ in avi.sample_frames(payload, every_ms=300)]
    assert stamps == [0, 300, 600, 900]
    # dense sampling gets every frame
    assert len(list(avi.sample_frames(payload, every_ms=100))) == 10


def test_video_features_shape():
    payload = avi.encode_avi(_clip(10), fps=10)
    f = avi.video_features(payload)
    assert f[0] == 10.0 and f[1] == pytest.approx(1.0)
    assert (f[2], f[3]) == (32.0, 24.0)
    assert all(0.0 <= v <= 1.0 for v in f[4:])
    # the multimodal router picks these up
    fv = codecs.feature_vector(payload, dim=8)
    assert fv[:4] == f[:4]


def test_determinism():
    frames = _clip(3)
    assert avi.encode_avi(frames, 5) == avi.encode_avi(frames, 5)


def test_non_mjpeg_stream_raises():
    payload = bytearray(avi.encode_avi(_clip(2), fps=5))
    i = payload.find(b"vidsMJPG")
    payload[i + 4 : i + 8] = b"H264"
    with pytest.raises(ValueError, match="not MJPG"):
        avi.parse_avi(bytes(payload))


def test_corrupt_degrades_to_valueerror_and_hash_fallback():
    payload = avi.encode_avi(_clip(2), fps=5)
    for bad in (payload[:30], payload[:200],
                b"RIFF\x10\x00\x00\x00AVI havoc"):
        with pytest.raises(ValueError):
            avi.parse_avi(bad)
        out = codecs.feature_vector(bad, dim=8)
        assert len(out) == 8 and out == codecs.feature_vector(bad, dim=8)


def test_frame_index_out_of_range():
    payload = avi.encode_avi(_clip(3), fps=5)
    with pytest.raises(ValueError, match="out of range"):
        avi.decode_frame(payload, 3)
