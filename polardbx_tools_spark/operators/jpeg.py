"""Pure numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Decoder: baseline sequential DCT (SOF0), Huffman entropy coding (DHT),
1- or 3-component scans, chroma subsampling factors up to 2x2 (4:4:4,
4:2:2, 4:2:0), restart markers (DRI/RSTn). Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``ValueError`` — the
multimodal layer degrades such rows to the hash fallback per-row.

Encoder: baseline 4:4:4 or 4:2:0, Annex-K quantization tables scaled by
libjpeg's quality curve, Annex-K Huffman tables, optional restart
interval — enough to produce spec-conformant fixtures and round-trip
the resize path.

Performance: the entropy-coded segment is decoded symbol-by-symbol in
Python (Huffman is inherently serial within a restart interval); the
block transform (dequantize + IDCT + level shift) and color conversion
are vectorized numpy over all blocks at once. This is a
correctness-grade codec — at 100-TB media scale a deployment
``decode_fn`` (libjpeg-turbo via PIL) remains the throughput path, and
because decoding runs inside Arrow-batched ``mapInPandas`` the swap is
one constructor argument (``multimodal.extract_features(decode_fn=...)``),
not a pipeline change.

Everything is deterministic: same payload -> same pixels, same array ->
same bytes, which is what lets the Spark tests pin exact values.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order: index i of the zigzag sequence -> raster position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables (luminance / chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: X = C @ x (1-D); 2-D block DCT is
# C @ block @ C.T, inverse is C.T @ coeff @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= np.sqrt(0.5)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 -> Annex K as-is, 100 -> all ones."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255)


def _build_huffman(bits, vals):
    """Spec C.2 code assignment -> {(length, code): symbol} for decode
    and {symbol: (code, length)} for encode."""
    decode, encode = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits per spec


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 un-stuffing; a bare
    marker (0xFF xx, xx != 0) ends the segment — RST markers are
    consumed by the caller via ``sync_restart``."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("JPEG entropy data truncated")
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: spec says coded data
                # never straddles one — treat as corrupt stream
                raise ValueError("JPEG entropy data hit RST mid-symbol")
            else:
                raise ValueError("JPEG entropy data hit marker mid-symbol")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self, n: int):
        """Discard pad bits, consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        if self.pos + 1 >= len(b) or b[self.pos] != 0xFF:
            raise ValueError("expected JPEG restart marker")
        m = b[self.pos + 1]
        if m != 0xD0 + (n & 7):
            raise ValueError(f"JPEG restart marker out of sequence ({m:#x})")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """Spec F.12 EXTEND: map t-bit magnitude to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category t, t-bit code) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


# ---------------------------------------------------------------- decode


def decode_jpeg(payload: bytes):
    """Baseline JPEG -> uint8 RGB array [h, w, 3] (gray replicated).

    Handles multi-scan baseline streams (T.81 allows each component in
    its own non-interleaved SOS): every scan accumulates into
    frame-level coefficient stores and the image reconstructs once all
    frame components have data. Malformed streams always raise
    ``ValueError`` (truncations that would surface as struct/index
    errors are normalized — the documented degrade-per-row contract)."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg(payload: bytes):
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    stores: dict[int, np.ndarray] = {}  # component id -> [by, bx, 64]
    scanned: set[int] = set()
    restart = 0
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # optional fill bytes: any number of 0xFF may pad before a
        # marker (T.81 B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment header")
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                hufs[(tc, th)], _ = _build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"] = -(-w // (8 * hmax))
            frame["mcuy"] = -(-h // (8 * vmax))
            for c in comps:
                stores[c["id"]] = np.zeros(
                    (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                    dtype=np.int64,
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF {marker:#x}) unsupported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                matches = [x for x in frame["comps"] if x["id"] == cs]
                if not matches:
                    raise ValueError(f"JPEG scan names unknown component {cs}")
                scan.append((matches[0], tables >> 4, tables & 15))
                scanned.add(cs)
            data_pos = pos + 2 + seg_len
            pos = _decode_scan(
                payload, data_pos, frame, scan, hufs, restart, stores
            )
            continue  # marker walk resumes after the entropy segment
        pos += 2 + seg_len
    if frame is None or not scanned:
        raise ValueError("JPEG missing SOS")
    missing = {c["id"] for c in frame["comps"]} - scanned
    if missing:
        raise ValueError(f"JPEG components never scanned: {sorted(missing)}")
    return _reconstruct(frame, stores, qt)


def _decode_scan(buf, pos, frame, scan, hufs, restart, stores):
    """Entropy-decode ONE scan into the frame coefficient stores;
    returns the stream position after the scan's entropy segment.

    Interleaved scans (ns > 1) walk the frame MCU grid with h x v data
    units per component per MCU; a single-component scan walks that
    component's own block raster one data unit per MCU (T.81 A.2.2) —
    its MCU grid is the component's non-padded block grid."""
    h, w = frame["h"], frame["w"]
    interleaved = len(scan) > 1
    if interleaved:
        mcux, mcuy = frame["mcux"], frame["mcuy"]
    else:
        comp = scan[0][0]
        # ceil(comp_size / 8) over the component's downsampled raster
        cw = -(-w * comp["h"] // frame["hmax"])
        ch = -(-h * comp["v"] // frame["vmax"])
        mcux, mcuy = -(-cw // 8), -(-ch // 8)
    n_mcu = mcux * mcuy
    tabs = []
    for comp, td, ta in scan:
        dc_tab = hufs.get((0, td))
        ac_tab = hufs.get((1, ta))
        if dc_tab is None or ac_tab is None:
            raise ValueError("JPEG scan references missing DHT")
        tabs.append((comp, dc_tab, ac_tab))
    rdr = _BitReader(buf, pos)
    preds = [0] * len(scan)
    rst_i = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            rdr.sync_restart(rst_i)
            rst_i = (rst_i + 1) & 7
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, (comp, dc_tab, ac_tab) in enumerate(tabs):
            reps = (comp["v"], comp["h"]) if interleaved else (1, 1)
            for v in range(reps[0]):
                for hh in range(reps[1]):
                    blk = np.zeros(64, dtype=np.int64)
                    t = rdr.huff(dc_tab)
                    diff = _extend(rdr.bits(t), t)
                    preds[ci] += diff
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = rdr.huff(ac_tab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        blk[k] = _extend(rdr.bits(s), s)
                        k += 1
                    if interleaved:
                        stores[comp["id"]][
                            my * comp["v"] + v, mx * comp["h"] + hh
                        ] = blk
                    else:
                        stores[comp["id"]][my, mx] = blk
    # align to the byte after the last entropy byte (drop partial bits)
    return rdr.pos


def _reconstruct(frame, stores, qt):
    """Dequantize + unzigzag + IDCT every frame component (one einsum
    per plane over all its blocks), upsample, convert to RGB."""
    h, w = frame["h"], frame["w"]
    planes = []
    for comp in frame["comps"]:
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG frame references missing DQT")
        st = stores[comp["id"]]
        by, bx, _ = st.shape
        coeff = (st * q)[:, :, UNZIGZAG].reshape(by, bx, 8, 8).astype(np.float64)
        px = np.einsum("ij,yxjk,kl->yxil", _C.T, coeff, _C)
        px = np.clip(np.round(px) + 128.0, 0, 255).astype(np.uint8)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution (pixel replication)
        ry = frame["vmax"] // comp["v"]
        rx = frame["hmax"] // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = planes[0]
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    y, cb, cr = (p.astype(np.float64) for p in planes[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------- encode


def encode_jpeg(rgb, quality: int = 85, subsample: bool = False,
                restart_interval: int = 0,
                separate_scans: bool = False) -> bytes:
    """uint8 RGB [h, w, 3] -> baseline JFIF JPEG (4:4:4, or 4:2:0 with
    ``subsample=True``), Annex-K Huffman tables, optional DRI.
    ``separate_scans`` emits one non-interleaved SOS per component
    (legal baseline T.81; 4:4:4 only) — the decoder's multi-scan
    fixture."""
    if separate_scans and subsample:
        raise ValueError("separate_scans supports 4:4:4 only")
    a = np.asarray(rgb, dtype=np.uint8)
    h, w = a.shape[:2]
    f = a.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]

    # scale the (raster-order) Annex-K tables, then reorder to zigzag:
    # DQT bytes are zigzag-ordered per B.2.4.1, and the division below
    # runs over zigzag-ordered coefficients — without the reorder the
    # effective quantizer is a permutation of Annex K (low frequencies
    # get high-frequency step sizes)
    ql = _quality_scale(QUANT_LUMA, quality)[ZIGZAG]
    qc = _quality_scale(QUANT_CHROMA, quality)[ZIGZAG]
    dc_l_dec, dc_l = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l_dec, ac_l = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c_dec, dc_c = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c_dec, ac_c = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
        # average 2x2 chroma (pad to even first)
        def down(p):
            ph = (p.shape[0] + 1) & ~1
            pw = (p.shape[1] + 1) & ~1
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                        mode="edge")
            return pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [y, down(cb), down(cr)]
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    quants = [ql, qc, qc]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # forward DCT + quantize + zigzag every block of every plane upfront
    blocks = []
    for pi, (plane, (sh, sv), q) in enumerate(zip(planes, sampling, quants)):
        by, bx = mcuy * sv, mcux * sh
        padded = np.empty((by * 8, bx * 8))
        padded[: plane.shape[0], : plane.shape[1]] = plane
        padded[plane.shape[0]:, : plane.shape[1]] = plane[-1:]
        padded[:, plane.shape[1]:] = padded[:, plane.shape[1] - 1 : plane.shape[1]]
        blk = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ij,ybjk,kl->ybil", _C, blk, _C.T)
        zz = np.round(coeff.reshape(by, bx, 64)[:, :, ZIGZAG]
                      / q[None, None, :]).astype(np.int64)
        blocks.append(zz)

    def emit_block(wtr, blk, pred, dct, act) -> int:
        diff = int(blk[0]) - pred
        t, code = _magnitude(diff)
        c, ln = dct[t]
        wtr.write(c, ln)
        if t:
            wtr.write(code, t)
        run = 0
        last = 63
        while last > 0 and blk[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            if blk[k] == 0:
                run += 1
                continue
            while run > 15:
                c, ln = act[0xF0]
                wtr.write(c, ln)
                run -= 16
            t, code = _magnitude(int(blk[k]))
            c, ln = act[(run << 4) | t]
            wtr.write(c, ln)
            wtr.write(code, t)
            run = 0
        if last < 63:
            c, ln = act[0x00]  # EOB
            wtr.write(c, ln)
        return int(blk[0])

    def emit_rst(wtr, rst_i) -> int:
        wtr.pad_to_byte()
        wtr.out.append(0xFF)
        wtr.out.append(0xD0 + rst_i)
        return (rst_i + 1) & 7

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    n_mcu = mcux * mcuy
    if separate_scans:
        # one non-interleaved SOS per component (T.81 A.2.2: each data
        # unit is its own MCU, walked over the component's block grid)
        entropy = []
        for ci, zz in enumerate(blocks):
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            wtr = _BitWriter()
            pred = 0
            rst_i = 0
            by, bx = zz.shape[:2]
            for m in range(by * bx):
                if restart_interval and m and m % restart_interval == 0:
                    rst_i = emit_rst(wtr, rst_i)
                    pred = 0
                my, mx = divmod(m, bx)
                pred = emit_block(wtr, zz[my, mx], pred, dct, act)
            wtr.pad_to_byte()
            entropy.append(bytes(wtr.out))
    else:
        wtr = _BitWriter()
        preds = [0, 0, 0]
        rst_i = 0
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                rst_i = emit_rst(wtr, rst_i)
                preds = [0, 0, 0]
            my, mx = divmod(m, mcux)
            for ci, ((sh, sv), zz) in enumerate(zip(sampling, blocks)):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for v in range(sv):
                    for hh in range(sh):
                        preds[ci] = emit_block(
                            wtr, zz[my * sv + v, mx * sh + hh],
                            preds[ci], dct, act,
                        )
        wtr.pad_to_byte()
        entropy = [bytes(wtr.out)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, ((sh, sv), tq) in enumerate(zip(sampling, [0, 1, 1]), start=1):
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += seg(0xC0, sof)
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if separate_scans:
        for cid, tabs, data in zip((1, 2, 3), (0x00, 0x11, 0x11), entropy):
            out += seg(0xDA, bytes([1, cid, tabs, 0, 63, 0]))
            out += data
    else:
        sos = bytes([3])
        for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
            sos += bytes([cid, tabs])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += entropy[0]
    out += b"\xff\xd9"  # EOI
    return bytes(out)
