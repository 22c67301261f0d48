"""Pure-stdlib media codecs for the multimodal operators.

This container ships no PIL/libsndfile/ffmpeg, so the multimodal layer
originally stubbed ALL decoding. These codecs remove the stub for the
formats that need nothing beyond the standard library + numpy:

* WAV (RIFF PCM, 8/16/32-bit integer; stdlib ``wave`` rejects
  IEEE-float WAVs) — ``wave`` + numpy frombuffer;
* BMP (uncompressed 24/32-bit BITMAPINFOHEADER) — manual header parse;
* PPM (binary ``P6``) — manual header parse.

JPEG/PNG/MP4 remain deployment-codec territory (``decode_fn`` /
``resize_fn`` hooks); :func:`sniff` routes by magic bytes so mixed
corpora degrade per-row, not per-job.

Everything here is deterministic (no RNG, no wall clock): the same
payload always yields the same features, which is what lets the Spark
tests pin exact values.
"""

from __future__ import annotations

import io
import struct
import wave


def sniff(payload: bytes | None) -> str | None:
    """Container type from magic bytes: 'wav' | 'bmp' | 'ppm' | None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    return None


# ------------------------------------------------------------------ audio

def decode_wav(payload: bytes):
    """PCM samples as float64 in [-1, 1]: (samples[n, channels], rate).
    Integer PCM only (8/16/32-bit) — the stdlib ``wave`` reader raises
    on non-PCM (e.g. IEEE-float) WAVE files."""
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, nch), rate


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Float samples in [-1, 1] (1-D or [n, ch]) -> 16-bit PCM WAV."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_features(payload: bytes, n_bins: int = 4) -> list[float]:
    """Deterministic audio features: [duration_s, rms, zero-cross rate,
    peak, then ``n_bins`` coarse energy bins over time]."""
    import numpy as np

    x, rate = decode_wav(payload)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0] * (4 + n_bins)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    peak = float(np.max(np.abs(mono)))
    bins = []
    for b in range(n_bins):
        seg = mono[b * n // n_bins:(b + 1) * n // n_bins]
        bins.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
    return [n / rate, rms, zc, peak] + bins


# ------------------------------------------------------------------ image

def decode_bmp(payload: bytes):
    """Uncompressed 24/32-bit bottom-up BMP -> uint8 RGB array [h, w, 3]."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={comp}, bpp={bpp})")
    flip = h > 0
    h = abs(h)
    step = bpp // 8
    stride = (w * step + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=stride * h, offset=data_off)
    px = px.reshape(h, stride)[:, : w * step].reshape(h, w, step)
    rgb = px[:, :, [2, 1, 0]]  # stored BGR(A)
    if flip:
        rgb = rgb[::-1]
    return rgb.copy()


def encode_bmp(rgb) -> bytes:
    """uint8 RGB array [h, w, 3] -> 24-bit bottom-up BMP."""
    import numpy as np

    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = a[::-1][:, :, [2, 1, 0]].reshape(h, w * 3)
    pixel_bytes = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + pixel_bytes


def decode_ppm(payload: bytes):
    """Binary PPM (P6, maxval<=255) -> uint8 RGB array [h, w, 3]."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-separated
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def encode_ppm(rgb) -> bytes:
    import numpy as np

    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_image(payload: bytes):
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    raise ValueError(f"no stdlib codec for payload (sniffed {kind!r})")


def resize_nearest(rgb, target_w: int, target_h: int):
    """Deterministic nearest-neighbor resize (the resize every real
    pipeline starts from; bilinear is a deployment decode_fn upgrade)."""
    import numpy as np

    a = np.asarray(rgb)
    h, w = a.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return a[ys][:, xs]


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode (same container)."""
    kind = sniff(payload)
    rgb = decode_image(payload)
    out = resize_nearest(rgb, target_w, target_h)
    return encode_bmp(out) if kind == "bmp" else encode_ppm(out)


def image_features(payload: bytes, n_bins: int = 5) -> list[float]:
    """Deterministic image features: [w, h, mean R, mean G, mean B] +
    ``n_bins`` luminance-histogram fractions."""
    import numpy as np

    rgb = decode_image(payload).astype(np.float64)
    h, w = rgb.shape[:2]
    means = rgb.reshape(-1, 3).mean(axis=0) / 255.0
    lum = rgb.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=n_bins, range=(0.0, 255.0))
    frac = hist / max(1, lum.size)
    return [float(w), float(h)] + [float(v) for v in means] + [
        float(v) for v in frac
    ]


def feature_vector(payload: bytes | None, dim: int = 8) -> list[float]:
    """Router used as the multimodal layer's default ``decode_fn``:
    REAL features for wav/bmp/ppm payloads, deterministic hash features
    for formats without a stdlib codec (honest fallback — the plumbing
    stays exercised, and a deployment decode_fn replaces it wholesale).
    A payload whose magic bytes sniff as a decodable format but whose
    body is corrupt ALSO takes the hash fallback — one bad row must
    degrade per-row, never abort the whole Spark job (the docstring
    contract at the top of this module). Output is padded/truncated to
    ``dim``."""
    kind = sniff(payload)
    out = None
    try:
        if kind == "wav":
            out = wav_features(payload)
        elif kind in ("bmp", "ppm"):
            out = image_features(payload)
    except Exception:
        out = None  # corrupt body behind a valid magic -> fallback
    if out is None:
        import hashlib

        h = hashlib.sha1(payload or b"").digest()
        out = [b / 255.0 for b in h[:dim]]
    out = [float(v) for v in out[:dim]]
    return out + [0.0] * (dim - len(out))
