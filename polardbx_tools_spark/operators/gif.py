"""Pure-python GIF codec (GIF87a/GIF89a, CompuServe spec).

Decoder: logical screen descriptor, global/local color tables,
variable-width LZW decompression, the four-pass interlace reordering,
graphic-control transparency (transparent pixels take the backdrop
color — the output is RGB, no alpha channel). For ANIMATED GIFs the
FIRST frame is decoded and the rest are ignored (frame sampling is
``multimodal.sample_frames`` territory; a deployment ``decode_fn``
owns full animation). Malformed streams raise ``ValueError`` so the
multimodal layer degrades that row to the hash fallback.

Encoder: single-frame GIF89a with a 256-entry global color table and
real LZW compression (dictionary growth + clear-code reset at 4096),
used for fixtures and the resize re-encode path. True-color inputs are
quantized to a uniform 6x7x6 RGB cube (252 colors) — deterministic,
no dithering.

LZW is inherently serial per image, so the inner loop is Python — the
same correctness-grade/deployment-hook posture as :mod:`.jpeg`.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytearray:
    """Variable-width LZW per GIF spec appendix; returns index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW data truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise ValueError("GIF pixel data short")
    return out[:expect]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """GIF -> uint8 RGB array [h, w, 3] (first frame of animations).

    Malformed streams always raise ``ValueError`` (truncations that
    would surface as struct/index errors are normalized — the
    documented degrade-per-row contract)."""
    try:
        return _decode_gif(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


def _decode_gif(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    n_pay = len(payload)
    while pos < n_pay:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gflags = payload[pos + 1]
                if gflags & 1:
                    transparent = payload[pos + 4]
            while payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block {b:#x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < n_pay and payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            bytes(_lzw_decode(b"".join(chunks), min_code, iw * ih)), np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, ih, step) for start, step in _INTERLACE_PASSES]
            )
            un = np.empty_like(idx)
            un[order] = idx
            idx = un
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF index out of color-table range")
        rgb = ct[idx]
        if transparent is not None and transparent < len(ct):
            # backdrop comes from the GLOBAL table (the logical screen's
            # background), never the frame's local table — a local table
            # smaller than bg would otherwise mis-color or IndexError
            backdrop = (
                gct[bg] if gct is not None and bg < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            rgb = np.where((idx == transparent)[:, :, None], backdrop, rgb)
        # compose onto the logical screen if the frame is a sub-rect
        if (ix, iy, iw, ih) != (0, 0, sw, sh) and sw and sh:
            screen = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and bg < len(gct):
                screen[:] = gct[bg]
            screen[iy : iy + ih, ix : ix + iw] = rgb[: sh - iy, : sw - ix]
            return screen
        return rgb.astype(np.uint8).copy()
    raise ValueError("GIF missing image data")


# ---------------------------------------------------------------- encode


def encode_gif(rgb) -> bytes:
    """uint8 RGB [h, w, 3] -> single-frame GIF89a. Colors quantized to
    a deterministic uniform 6x7x6 cube (252 entries), real LZW."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w = a.shape[:2]
    r = np.minimum(a[:, :, 0].astype(np.int64) * 6 // 256, 5)
    g = np.minimum(a[:, :, 1].astype(np.int64) * 7 // 256, 6)
    b = np.minimum(a[:, :, 2].astype(np.int64) * 6 // 256, 5)
    idx = (r * 42 + g * 6 + b).astype(np.uint8)  # 6*7*6 = 252 entries
    # palette: cube cell centers
    pal = np.zeros((256, 3), dtype=np.uint8)
    ri, gi, bi = np.meshgrid(np.arange(6), np.arange(7), np.arange(6),
                             indexing="ij")
    pal[: 252, 0] = (ri.reshape(-1) * 256 + 128) // 6
    pal[: 252, 1] = (gi.reshape(-1) * 256 + 128) // 7
    pal[: 252, 2] = (bi.reshape(-1) * 256 + 128) // 6
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # 256-entry GCT
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code = 8
    out.append(min_code)
    lzw = _lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
