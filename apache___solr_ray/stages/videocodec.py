"""Pure-stdlib video codec: uncompressed AVI (RIFF) decode + encode.

Companion to ``imagecodec.py`` / ``audiocodec.py`` (reference role:
``SolrContentHandler``'s media-to-fields extraction,
solr/core/src/java/org/apache/solr/handler/extraction/SolrContentHandler.java):
the classic AVI container with raw device-independent-bitmap frames
(``00db`` chunks, 24-bit BGR, bottom-up, 4-byte row padding — the 'DIB '
fourcc) needs nothing beyond ``struct``/numpy, so the multimodal VIDEO
path can be REAL: actual frame pixels from actual container bytes.
Compressed codecs (H.264/VP9/...) still need libraries this container
doesn't ship and raise ``VideoDecodeError``.

The encoder exists so tests and the deterministic video corpus can
synthesize payloads whose per-frame ground truth is known exactly; the
encode is lossless, so a decoder that recovers anything but the exact
pre-encode pixels fails the oracle.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoDecodeError(ValueError):
    pass


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """(n_frames, H, W, 3) uint8 RGB -> uncompressed AVI bytes.

    Frames are stored as raw 24-bit BGR bottom-up DIBs in ``00db`` chunks
    with the standard 4-byte row padding; ``rate/scale`` in the stream
    header and ``dwMicroSecPerFrame`` in the main header both carry fps.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    row_bytes = _pad4(w * 3)
    frame_bytes = row_bytes * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        data = struct.pack("<4sI", fourcc, len(payload)) + payload
        if len(payload) & 1:
            data += b"\x00"  # RIFF chunks are word-aligned
        return data

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    # avih: MainAVIHeader (56 bytes)
    us_per_frame = 1_000_000 // int(fps)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame,
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    # strh: AVIStreamHeader (56 bytes)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"DIB ",
        0,  # flags
        0,  # priority
        0,  # language
        0,  # initial frames
        1,  # scale
        int(fps),  # rate (rate/scale = fps)
        0,  # start
        n,  # length (frames)
        frame_bytes,
        10000,  # quality
        0,  # sample size (varies)
        0, 0, int(w), int(h),  # rcFrame
    )
    # strf: BITMAPINFOHEADER (40 bytes), biHeight>0 => bottom-up
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_payload = b""
    idx = b""
    offset = 4  # idx1 offsets are relative to the start of 'movi' fourcc
    for i in range(n):
        bgr = frames[i, ::-1, :, ::-1]  # bottom-up, RGB->BGR
        if row_bytes != w * 3:
            padded = np.zeros((h, row_bytes), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            raw = padded.tobytes()
        else:
            raw = bgr.tobytes()
        movi_payload += chunk(b"00db", raw)
        idx += struct.pack("<4sIII", b"00db", 0x10, offset, len(raw))
        offset += 8 + len(raw) + (len(raw) & 1)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(riff_payload)) + riff_payload


def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) walking RIFF chunks."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", buf, pos)
        if pos + 8 + size > end:
            raise VideoDecodeError(f"chunk {fourcc!r} overruns container")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI bytes -> ((n, H, W, 3) uint8 RGB frames, fps).

    Parses the RIFF container directly: ``avih`` for geometry and frame
    timing, ``strf`` (BITMAPINFOHEADER) for bit depth / row orientation,
    ``00db``/``00dc`` chunks inside LIST('movi') for the frames.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise VideoDecodeError("not a RIFF/AVI payload")
    width = height = None
    us_per_frame = None
    bitcount = 24
    bottom_up = True
    frames_raw: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, us_per_frame, bitcount, bottom_up
        for fourcc, ps, ln in _iter_chunks(payload, start, end):
            if fourcc == b"LIST":
                kind = payload[ps : ps + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(ps + 4, ps + ln)
            elif fourcc == b"avih":
                us_per_frame, = struct.unpack_from("<I", payload, ps)
                width, height = struct.unpack_from("<II", payload, ps + 32)
            elif fourcc == b"strf":
                _, bw, bh, _, bc = struct.unpack_from("<IiiHH", payload, ps)
                bitcount = bc
                bottom_up = bh > 0
                width, height = bw, abs(bh)
            elif fourcc in (b"00db", b"00dc"):
                frames_raw.append((ps, ln))

    try:
        walk(12, len(payload))
    except struct.error as e:  # truncated header fields
        raise VideoDecodeError(str(e)) from None
    if width is None or height is None or not frames_raw:
        raise VideoDecodeError("missing AVI headers or frames")
    if bitcount != 24:
        raise VideoDecodeError(f"unsupported bit depth {bitcount} (24-bit DIB only)")
    w, h = int(width), int(height)
    row_bytes = _pad4(w * 3)
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, (ps, ln) in enumerate(frames_raw):
        if ln < row_bytes * h:
            raise VideoDecodeError(f"frame {i} truncated: {ln} < {row_bytes * h}")
        rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=ps)
        bgr = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        out[i] = rgb[::-1] if bottom_up else rgb
    fps = int(round(1_000_000 / us_per_frame)) if us_per_frame else 25
    return out, fps


def avi_frame_stats(payload: bytes, stride: int = 1) -> dict:
    """Decode + sample every ``stride``-th frame; per-frame mean pixel
    values with the repo's floor(x*1e4+0.5)/1e4 rounding convention plus
    container metadata — the (payload)->(frames...) contract the
    multimodal frame-sample stage ships."""
    frames, fps = decode_avi(payload)
    n, h, w, _ = frames.shape
    idxs = np.arange(0, n, stride, dtype=np.int64)
    means = frames[idxs].astype(np.float64).mean(axis=(1, 2, 3))
    means = np.floor(means * 10000 + 0.5) / 10000
    return {
        "n_frames": int(n),
        "fps": int(fps),
        "width": int(w),
        "height": int(h),
        "frame_idx": idxs,
        "ts_ms": idxs * (1000 // int(fps)),
        "mean_px": means,
    }
