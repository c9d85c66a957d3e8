"""Pure-stdlib image codecs: BMP, PPM/PGM, and (zlib) PNG decode + encode.

No image library ships in this container, but these three formats need
nothing beyond ``struct``/``zlib``/numpy, so the multimodal decode stage
can be REAL for them: actual pixels from actual bytes (reference role:
``SolrContentHandler``'s media-to-fields extraction). The encoders exist
so tests and the deterministic image corpus can synthesize payloads whose
ground truth is known exactly.

Formats:
- BMP: BITMAPINFOHEADER, uncompressed 24/32-bit, bottom-up or top-down,
  4-byte row padding.
- PPM/PGM: binary P6/P5 and ASCII P3/P2, maxval <= 255.
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced; all five scanline filters (None/Sub/Up/
  Average/Paeth) — IDAT via stdlib zlib.

Every decode returns a ``(H, W, C) uint8`` numpy array (C in {1,2,3,4}).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class ImageDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# sniff + dispatch
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the container by magic and decode to (H, W, C) uint8."""
    if not payload:
        raise ImageDecodeError("empty payload")
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5", b"P3", b"P2"):
        return decode_pnm(payload)
    raise ImageDecodeError(f"unknown image magic {payload[:8]!r}")


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    if len(b) < 54 or b[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ImageDecodeError("BITMAPCOREHEADER unsupported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ImageDecodeError(f"unsupported BMP (compression={comp}, bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = data_off + stride * h
    if len(b) < need:
        raise ImageDecodeError("truncated BMP")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    if nch == 3:
        rows = rows[:, :, ::-1]
    else:
        rows = rows[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(rows)


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit bottom-up BMP from (H, W, 3) uint8."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ImageDecodeError("encode_bmp expects (H, W, 3)")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + data


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------


def _pnm_header(b: bytes):
    """Parse magic, dims, maxval; returns (magic, w, h, maxval, offset)."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    return b[:2], fields[0], fields[1], fields[2], pos


def decode_pnm(b: bytes) -> np.ndarray:
    magic, w, h, maxval, off = _pnm_header(b)
    if maxval > 255:
        raise ImageDecodeError("16-bit PNM unsupported")
    nch = 3 if magic in (b"P6", b"P3") else 1
    n = w * h * nch
    if magic in (b"P6", b"P5"):
        arr = np.frombuffer(b, dtype=np.uint8, count=n, offset=off)
    else:
        arr = np.array(b[off:].split()[:n], dtype=np.uint8)
    return arr.reshape(h, w, nch)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ImageDecodeError("encode_ppm expects (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CH = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    if b[:8] != PNG_SIG:
        raise ImageDecodeError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        pos += 8
        chunk = b[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, compm, filtm, inter = struct.unpack(">IIBBBBB", chunk)
            if depth != 8 or ctype not in _PNG_CH or compm or filtm or inter:
                raise ImageDecodeError(
                    f"unsupported PNG (depth={depth}, color={ctype}, interlace={inter})"
                )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ImageDecodeError("missing IHDR/IDAT")
    nch = _PNG_CH[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ImageDecodeError("bad PNG payload length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), lines[y]
        if f == 0:
            cur = row.copy()
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub: cumulative per bpp lane
            cur = row.reshape(-1, nch).cumsum(axis=0).astype(np.int64) % 256
            cur = cur.reshape(stride).astype(np.int32)
        else:  # Average / Paeth: left-sequential
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                bb = prev[x]
                if f == 3:
                    cur[x] = (row[x] + (a + bb) // 2) & 0xFF
                elif f == 4:
                    c = prev[x - nch] if x >= nch else 0
                    p = a + bb - c
                    pa, pb, pcv = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pcv) else (bb if pb <= pcv else c)
                    cur[x] = (row[x] + pred) & 0xFF
                else:
                    raise ImageDecodeError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, nch)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """PNG from (H, W, C) uint8 with one filter type for every scanline
    (0/1/2 supported here — enough to exercise the decoder's fast paths;
    the golden tests build Average/Paeth rows by hand)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    flat = img.reshape(h, w * nch).astype(np.int32)
    lines = []
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 2:
            enc = (row - prev) % 256
        elif filter_type == 1:
            left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
            enc = (row - left) % 256
        else:
            raise ImageDecodeError("encode_png supports filters 0/1/2")
        lines.append(bytes([filter_type]) + bytes(enc.astype(np.uint8)))
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
