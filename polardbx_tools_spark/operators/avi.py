"""Pure-python AVI container + Motion-JPEG video codec.

With :mod:`.jpeg` in place, video stops being a hash-fallback stub:
an MJPEG AVI is a RIFF container whose ``00dc`` chunks are baseline
JPEG frames, so the existing decoder handles the per-frame work and
this module only parses the container.

Decoder: RIFF walk (``hdrl``/``avih`` for dims, fps, frame count;
``movi`` for the frame chunks), frame iteration without materializing
all frames (frame *sampling* decodes only the requested indices —
the shape a 100-TB video pipeline needs: seek + decode k frames per
clip, never the whole clip). Non-MJPEG streams (``strh`` handler
other than MJPG/mjpg) raise ``ValueError`` and the multimodal layer
degrades that row per-row; real MP4/H.264 remains ``decode_fn``
deployment territory.

Encoder: single-video-stream MJPEG AVI from a list of RGB frames
(deterministic, Annex-K JPEG at the given quality) — fixtures and the
honest on-disk analog of a clip column.
"""

from __future__ import annotations

import struct

from polardbx_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _chunks(buf: bytes, start: int, end: int):
    """Iterate (fourcc, body_start, body_len) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        ln = struct.unpack_from("<I", buf, pos + 4)[0]
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def parse_avi(payload: bytes) -> dict:
    """Container metadata + frame index (no frame decode):
    ``{width, height, us_per_frame, n_frames, frames: [(off, len)]}``.

    Malformed containers raise ``ValueError`` (struct/index errors
    normalized, same contract as the image codecs)."""
    try:
        return _parse_avi(payload)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed AVI: {e}") from e


def _parse_avi(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    total = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    meta = {"width": 0, "height": 0, "us_per_frame": 0, "n_frames": 0}
    frames: list[tuple[int, int]] = []
    handler_ok = False

    def walk(start: int, end: int, in_movi: bool):
        nonlocal handler_ok
        for cid, off, ln in _chunks(payload, start, end):
            if cid == b"LIST":
                kind = payload[off : off + 4]
                walk(off + 4, off + ln, in_movi or kind == b"movi")
            elif cid == b"avih":
                (meta["us_per_frame"],) = struct.unpack_from("<I", payload, off)
                (meta["n_frames"],) = struct.unpack_from("<I", payload, off + 16)
                meta["width"], meta["height"] = struct.unpack_from(
                    "<II", payload, off + 32
                )
            elif cid == b"strh":
                if payload[off : off + 4] == b"vids":
                    handler = payload[off + 4 : off + 8]
                    if handler not in (b"MJPG", b"mjpg"):
                        raise ValueError(
                            f"AVI video stream is {handler!r}, not MJPG — "
                            "pass a deployment decode_fn"
                        )
                    handler_ok = True
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append((off, ln))

    walk(12, total, False)
    if not handler_ok:
        raise ValueError("AVI has no MJPG video stream header")
    if not frames:
        raise ValueError("AVI has no frame chunks")
    meta["frames"] = frames
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta


def decode_frame(payload: bytes, index: int):
    """Decode ONE frame by index -> uint8 RGB [h, w, 3]. Only the
    requested chunk's bytes go through the JPEG decoder."""
    meta = parse_avi(payload)
    frames = meta["frames"]
    if not -len(frames) <= index < len(frames):
        raise ValueError(f"frame {index} out of range ({len(frames)} frames)")
    off, ln = frames[index]
    return decode_jpeg(payload[off : off + ln])


def sample_frames(payload: bytes, every_ms: int = 1000):
    """Yield (frame_ms, rgb) at ~every_ms spacing: decodes only the
    sampled frames, never the whole clip."""
    meta = parse_avi(payload)
    us = meta["us_per_frame"] or 40_000  # default 25 fps
    n = len(meta["frames"])
    step = max(1, int(round(every_ms * 1000.0 / us)))
    for i in range(0, n, step):
        yield int(i * us / 1000.0), decode_frame(payload, i)


def video_features(payload: bytes, n_bins: int = 3) -> list[float]:
    """Deterministic clip features: [n_frames, duration_s, w, h,
    first-frame mean luminance, then ``n_bins`` mean-luminance samples
    across the clip] — decodes at most 1 + n_bins frames."""
    import numpy as np

    meta = parse_avi(payload)
    n = len(meta["frames"])
    us = meta["us_per_frame"] or 40_000
    lum = np.array([0.299, 0.587, 0.114])

    def mean_lum(i):
        return float(
            (decode_frame(payload, i).reshape(-1, 3) @ lum).mean() / 255.0
        )

    out = [
        float(n),
        n * us / 1e6,
        float(meta["width"]),
        float(meta["height"]),
        mean_lum(0),
    ]
    for b in range(n_bins):
        out.append(mean_lum(min(n - 1, b * n // max(1, n_bins))))
    return out


def encode_avi(frames, fps: int = 25, quality: int = 85) -> bytes:
    """List of uint8 RGB [h, w, 3] arrays -> single-stream MJPEG AVI."""
    import numpy as np

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    encoded = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = int(round(1_000_000 / fps))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      0, -1, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", e) for e in encoded))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
