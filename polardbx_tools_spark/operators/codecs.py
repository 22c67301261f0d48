"""Pure-stdlib media codecs for the multimodal operators.

This container ships no PIL/libsndfile/ffmpeg, so the multimodal layer
originally stubbed ALL decoding. These codecs remove the stub for the
formats that need nothing beyond the standard library + numpy:

* WAV (RIFF PCM, 8/16/32-bit integer; stdlib ``wave`` rejects
  IEEE-float WAVs) — ``wave`` + numpy frombuffer;
* AIFF (big-endian integer PCM; manual FORM/COMM/SSND parse incl. the
  80-bit extended-float rate) and Sun/NeXT AU (G.711 mu-law + linear
  8/16/32) — see the audio section;
* BMP (uncompressed 24/32-bit BITMAPINFOHEADER) — manual header parse;
* PPM (binary ``P6``) — manual header parse;
* PNG (non-interlaced 8-bit gray/RGB/palette/gray-alpha/RGBA) —
  stdlib ``zlib`` inflate + numpy scanline unfiltering, chunk CRCs
  verified;
* JPEG (baseline sequential DCT, Huffman, 4:4:4/4:2:2/4:2:0, restart
  markers) — pure numpy, see :mod:`.jpeg`;
* GIF (87a/89a LZW, interlace, transparency; first frame of
  animations) — pure python/numpy, see :mod:`.gif`;
* AVI/Motion-JPEG video (frame index + per-frame JPEG decode, frame
  sampling without materializing the clip) — see :mod:`.avi`.

MP4/H.264 (and progressive JPEG, interlaced/16-bit PNG) remains
deployment-codec territory (``decode_fn`` / ``resize_fn`` hooks);
:func:`sniff` routes by magic bytes so mixed corpora degrade per-row,
not per-job.

Everything here is deterministic (no RNG, no wall clock): the same
payload always yields the same features, which is what lets the Spark
tests pin exact values.
"""

from __future__ import annotations

import io
import struct
import wave


def sniff(payload: bytes | None) -> str | None:
    """Container type from magic bytes: 'wav'|'bmp'|'ppm'|'png'|None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        return "aiff"
    if payload[:4] == b".snd":
        return "au"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
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


def decode_aiff(payload: bytes):
    """AIFF (FORM/AIFF, big-endian integer PCM 8/16/32-bit) -> float64
    samples in [-1, 1]: (samples[n, channels], rate). Parsed manually —
    the stdlib ``aifc`` module is deprecated-for-removal. AIFF-C
    (compressed) raises."""
    import numpy as np

    try:
        if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
            raise ValueError("not an AIFF payload")
        pos, comm, ssnd = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            ln = struct.unpack_from(">I", payload, pos + 4)[0]
            body = payload[pos + 8 : pos + 8 + ln]
            if cid == b"COMM":
                nch, nframes, bits = struct.unpack_from(">hIh", body, 0)
                # sample rate is an 80-bit IEEE 754 extended float
                exp = struct.unpack_from(">H", body, 8)[0]
                mant = struct.unpack_from(">Q", body, 10)[0]
                if exp == 0 and mant == 0:
                    rate = 0.0
                else:
                    rate = mant * 2.0 ** ((exp & 0x7FFF) - 16383 - 63)
                    if exp & 0x8000:
                        rate = -rate
                comm = (nch, nframes, bits, int(round(rate)))
            elif cid == b"SSND":
                off = struct.unpack_from(">I", body, 0)[0]
                ssnd = body[8 + off :]
            pos += 8 + ln + (ln & 1)  # chunks are even-padded
        if comm is None or ssnd is None:
            raise ValueError("AIFF missing COMM/SSND")
        nch, nframes, bits, rate = comm
        if nch <= 0 or rate <= 0:
            raise ValueError("AIFF invalid channel count / rate")
        if bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
            x = np.frombuffer(ssnd, np.int8, nframes * nch).astype(np.float64) / 128.0
        elif bits == 16:
            x = np.frombuffer(ssnd, ">i2", nframes * nch).astype(np.float64) / 32768.0
        elif bits == 32:
            x = (np.frombuffer(ssnd, ">i4", nframes * nch).astype(np.float64)
                 / 2147483648.0)
        else:
            raise ValueError(f"unsupported AIFF bit depth {bits}")
        return x.reshape(-1, nch), rate
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed AIFF: {e}") from e


def encode_aiff(samples, rate: int = 8000) -> bytes:
    """Float samples in [-1, 1] (1-D or [n, ch]) -> 16-bit BE PCM AIFF."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(">i2")
    nframes, nch = x.shape
    # 80-bit extended float for the rate
    r = float(rate)
    exp = 16383 + 63
    mant = int(r)
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    comm = struct.pack(">hIh", nch, nframes, 16) + struct.pack(">HQ", exp, mant)
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


_ULAW_BIAS = 0x84


def decode_au(payload: bytes):
    """Sun/NeXT .au -> float64 samples in [-1, 1]: (samples[n, ch],
    rate). Encodings: 1 = 8-bit G.711 mu-law, 2 = 8-bit linear, 3 =
    16-bit linear BE, 5 = 32-bit linear BE."""
    import numpy as np

    try:
        if payload[:4] != b".snd":
            raise ValueError("not an AU payload")
        off, size, enc, rate, nch = struct.unpack_from(">IIIII", payload, 4)
        if nch <= 0 or rate <= 0:
            raise ValueError("AU invalid channel count / rate")
        data = payload[off : off + size] if size != 0xFFFFFFFF else payload[off:]
        if enc == 1:  # G.711 mu-law expansion
            u = ~np.frombuffer(data, np.uint8).astype(np.int64) & 0xFF
            sign = u & 0x80
            exp = (u >> 4) & 7
            mant = u & 0x0F
            mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
            x = np.where(sign, -mag, mag).astype(np.float64) / 32124.0
        elif enc == 2:
            x = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
        elif enc == 3:
            x = np.frombuffer(data, ">i2").astype(np.float64) / 32768.0
        elif enc == 5:
            x = np.frombuffer(data, ">i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported AU encoding {enc}")
        n = (len(x) // nch) * nch
        return x[:n].reshape(-1, nch), rate
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed AU: {e}") from e


def encode_au(samples, rate: int = 8000, mulaw: bool = False) -> bytes:
    """Float samples in [-1, 1] -> .au (16-bit BE, or 8-bit G.711
    mu-law with ``mulaw=True``)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if mulaw:
        pcm = np.clip(np.round(x * 32767.0), -32635, 32635).astype(np.int64)
        sign = np.where(pcm < 0, 0x80, 0)
        mag = np.abs(pcm) + _ULAW_BIAS
        exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int64)
        mant = (mag >> (exp + 3)) & 0x0F
        data = (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8).tobytes()
        enc = 1
    else:
        data = np.clip(np.round(x * 32767.0), -32768, 32767).astype(">i2").tobytes()
        enc = 3
    return struct.pack(">4sIIIII", b".snd", 24, len(data), enc, rate, nch) + data


def decode_audio(payload: bytes):
    """Route by magic: WAV / AIFF / AU -> (samples[n, ch], rate)."""
    kind = sniff(payload)
    if kind == "wav":
        return decode_wav(payload)
    if kind == "aiff":
        return decode_aiff(payload)
    if kind == "au":
        return decode_au(payload)
    raise ValueError(f"no stdlib audio codec for payload (sniffed {kind!r})")


def wav_features(payload: bytes, n_bins: int = 4) -> list[float]:
    """Deterministic audio features: [duration_s, rms, zero-cross rate,
    peak, then ``n_bins`` coarse energy bins over time]. Despite the
    historical name this routes WAV/AIFF/AU."""
    import numpy as np

    x, rate = decode_audio(payload)
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes):
    """PNG -> uint8 RGB array [h, w, 3], pure stdlib ``zlib`` + numpy.

    Supports the non-interlaced 8-bit-depth color types (gray, RGB,
    palette, gray+alpha, RGBA — the output drops alpha, matching the
    BMP 32-bpp path). Chunk CRCs are verified so a truncated/corrupt
    body raises (and the multimodal layer degrades that row to the hash
    fallback instead of aborting the job). Interlaced (Adam7) and
    16-bit images raise — they remain ``decode_fn`` deployment
    territory, as JPEG/MP4 do.

    Unfiltering is row-sequential by spec (each scanline's filter reads
    the reconstructed row above); within a row, filters 0/2 are pure
    numpy, filter 1 (Sub) is a per-channel cumulative sum mod 256, and
    filters 3/4 (Average/Paeth) fall back to a per-byte loop only on
    the rows that actually use them. Malformed streams always raise
    ``ValueError`` (struct/zlib/index errors normalized).
    """
    import zlib

    try:
        return _decode_png(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, zlib.error) as e:
        raise ValueError(f"malformed PNG: {e}") from e


def _decode_png(payload: bytes):
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, hdr, palette = 8, [], None, None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} unsupported (8 only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")

    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1))
    rows = rows.reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f, line = int(filters[y]), data[y]
        above = recon[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            recon[y] = line
        elif f == 2:  # Up
            recon[y] = line + above  # uint8 wraps, per spec
        elif f == 1:  # Sub: prefix sum mod 256 per channel lane
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            recon[y] = (lanes.cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 3:  # Average
            out = recon[y]
            for x in range(stride):
                left = int(out[x - bpp]) if x >= bpp else 0
                out[x] = (int(line[x]) + ((left + int(above[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            out = recon[y]
            for x in range(stride):
                a = int(out[x - bpp]) if x >= bpp else 0
                b = int(above[x])
                c = int(above[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on row {y}")
    px = recon.reshape(h, w, channels)
    if color == 3:
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx].copy()
    if channels == 1:
        return np.repeat(px, 3, axis=2).copy()
    if channels == 2:  # gray+alpha: replicate gray, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # RGB / RGBA (alpha dropped)


def encode_png(rgb) -> bytes:
    """uint8 RGB array [h, w, 3] -> non-interlaced 8-bit RGB PNG
    (filter 0 on every scanline — deterministic, no heuristics)."""
    import zlib

    import numpy as np

    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    scan = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * 3)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes):
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from polardbx_tools_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if kind == "gif":
        from polardbx_tools_spark.operators.gif import decode_gif

        return decode_gif(payload)
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
    if kind == "bmp":
        return encode_bmp(out)
    if kind == "png":
        return encode_png(out)
    if kind == "jpeg":
        from polardbx_tools_spark.operators.jpeg import encode_jpeg

        return encode_jpeg(out)
    if kind == "gif":
        from polardbx_tools_spark.operators.gif import encode_gif

        return encode_gif(out)
    return encode_ppm(out)


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
        if kind in ("wav", "aiff", "au"):
            out = wav_features(payload)
        elif kind in ("bmp", "ppm", "png", "jpeg", "gif"):
            out = image_features(payload)
        elif kind == "avi":
            from polardbx_tools_spark.operators.avi import video_features

            out = video_features(payload)
    except Exception:
        out = None  # corrupt body behind a valid magic -> fallback
    if out is None:
        import hashlib

        h = hashlib.sha1(payload or b"").digest()
        out = [b / 255.0 for b in h[:dim]]
    out = [float(v) for v in out[:dim]]
    return out + [0.0] * (dim - len(out))
